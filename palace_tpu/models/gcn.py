"""GCN phage-contig scorer, TPU-native.

Re-implementation of the reference model (share/palace/scripts/
phage_scoring.py:57-120 ``GNN_Model``) as pure-JAX dense compute.

Key observation driving the redesign: the bipartite graph is *fixed*
(edges ``[i//64, i]`` and ``[i%64, i]``, phage_scoring.py:130-134), so
PyG's sparse SAGEConv message passing collapses into dense reshapes:

* f→p aggregation: every p-node ``i`` has exactly one forward-edge
  neighbour ``f[i//64]`` → a 64× row repeat;
* p→f aggregation: f-node ``j`` receives the mean of the 64 p-nodes
  ``{i : i%64 == j}`` → ``x_p.reshape(64, 64, d).mean(axis=0)``.

SAGEConv (PyG defaults: mean aggregation, root weight, bias on the
neighbour branch only) is then ``agg @ W_l + b_l + x_dst @ W_r``.
Everything — including the 12288×12288 ``pnode_d`` lift and the
260800×100 FC — becomes batched dense matmuls on the MXU, with no
scatter/gather at all.

The final channel reshape scrambles (position, channel) exactly like
``torch.reshape(x_p, (-1, gcn_dim, PNODE_NUM))`` on a row-major
(B·4096, 128) tensor (phage_scoring.py:112) — intentional, to stay
bit-compatible with reference checkpoints.
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]


@dataclass(frozen=True)
class GCNConfig:
    """Architecture constants (phage_scoring.py:47-55)."""

    hidden_dim: int = 3          # HIDDEN_DIM / PNODE_DIM
    fnode_num: int = 64          # FNODE_NUM
    gcn_dim: int = 128           # GCN_HIDDEN_DIM
    cnn_dim: int = 64            # CNN_HIDDEN_DIM
    fc_dim: int = 100            # FC_HIDDEN_DIM
    num_layers: int = 2          # GCN_LAYER_NUM
    drop_rate: float = 0.2       # DROP_RATE
    conv_kernel: int = 8

    @property
    def pnode_num(self) -> int:
        return self.fnode_num * self.fnode_num  # 4096

    @property
    def conv_out_len(self) -> int:
        # three valid convs of width ``conv_kernel``: L - 3*(k-1) = 4075
        return self.pnode_num - 3 * (self.conv_kernel - 1)

    @property
    def flat_dim(self) -> int:
        return self.conv_out_len * self.cnn_dim  # 4075*64 = 260800


DEFAULT_CONFIG = GCNConfig()


# ---------------------------------------------------------------------------
# parameter initialisation / conversion
# ---------------------------------------------------------------------------

def init_params(key: jax.Array, cfg: GCNConfig = DEFAULT_CONFIG,
                dtype=jnp.float32) -> Params:
    """Random params with torch-Linear-style fan-in uniform init."""
    keys = iter(jax.random.split(key, 64))

    def linear(n_in: int, n_out: int, bias: bool = True):
        bound = 1.0 / np.sqrt(n_in)
        w = jax.random.uniform(next(keys), (n_in, n_out), dtype, -bound, bound)
        b = jax.random.uniform(next(keys), (n_out,), dtype, -bound, bound) if bias else None
        return w, b

    p: Params = {}
    d3, gd, f, pn = cfg.hidden_dim, cfg.gcn_dim, cfg.fnode_num, cfg.pnode_num
    p["pnode_d.w"], p["pnode_d.b"] = linear(pn * d3, pn * d3)
    p["fnode_d.w"], p["fnode_d.b"] = linear(f, f * d3)
    dims_1 = [(d3, d3), (gd, gd)]       # convs_1: (in_src, in_dst)
    dims_2 = [(gd, d3), (gd, gd)]       # convs_2
    for i in range(cfg.num_layers):
        for tag, (in_src, in_dst) in (("convs_1", dims_1[i]), ("convs_2", dims_2[i])):
            w, b = linear(in_src, gd)
            p[f"{tag}.{i}.lin_l.w"], p[f"{tag}.{i}.lin_l.b"] = w, b
            p[f"{tag}.{i}.lin_r.w"], _ = linear(in_dst, gd, bias=False)
    p["ln.scale"] = jnp.ones((gd,), dtype)
    p["ln.bias"] = jnp.zeros((gd,), dtype)
    conv_dims = [(gd, cfg.cnn_dim), (cfg.cnn_dim, cfg.cnn_dim), (cfg.cnn_dim, cfg.cnn_dim)]
    for i, (cin, cout) in enumerate(conv_dims, 1):
        bound = 1.0 / np.sqrt(cin * cfg.conv_kernel)
        p[f"conv{i}.w"] = jax.random.uniform(
            next(keys), (cout, cin, cfg.conv_kernel), dtype, -bound, bound
        )
        p[f"conv{i}.b"] = jax.random.uniform(next(keys), (cout,), dtype, -bound, bound)
    p["d1.w"], p["d1.b"] = linear(cfg.flat_dim, cfg.fc_dim)
    p["d2.w"], p["d2.b"] = linear(cfg.fc_dim, 2)
    return p


_TORCH_LINEAR_KEYS = {
    "pnode_d": "pnode_d", "fnode_d": "fnode_d", "d1": "d1", "d2": "d2",
}


def params_from_numpy_state(state: Dict[str, np.ndarray], cfg: GCNConfig = DEFAULT_CONFIG,
                            dtype=jnp.float32) -> Params:
    """Map a torch ``state_dict`` (as numpy arrays) onto our layout.

    torch Linear stores ``weight`` as (out, in) → transposed here; PyG
    SAGEConv parameters are ``lin_l.{weight,bias}`` / ``lin_r.weight``
    (phage_scoring.py:69-76 layer names ``convs_1``/``convs_2``,
    ``lns.0``, ``conv1..3``, ``d1``, ``d2``).
    """
    p: Params = {}

    def _get(name: str) -> np.ndarray:
        return np.asarray(state[name])

    for ours, theirs in _TORCH_LINEAR_KEYS.items():
        p[f"{ours}.w"] = jnp.asarray(_get(f"{theirs}.weight").T, dtype)
        p[f"{ours}.b"] = jnp.asarray(_get(f"{theirs}.bias"), dtype)
    for i in range(cfg.num_layers):
        for tag in ("convs_1", "convs_2"):
            p[f"{tag}.{i}.lin_l.w"] = jnp.asarray(_get(f"{tag}.{i}.lin_l.weight").T, dtype)
            p[f"{tag}.{i}.lin_l.b"] = jnp.asarray(_get(f"{tag}.{i}.lin_l.bias"), dtype)
            p[f"{tag}.{i}.lin_r.w"] = jnp.asarray(_get(f"{tag}.{i}.lin_r.weight").T, dtype)
    p["ln.scale"] = jnp.asarray(_get("lns.0.weight"), dtype)
    p["ln.bias"] = jnp.asarray(_get("lns.0.bias"), dtype)
    for i in (1, 2, 3):
        p[f"conv{i}.w"] = jnp.asarray(_get(f"conv{i}.weight"), dtype)  # (O, I, K)
        p[f"conv{i}.b"] = jnp.asarray(_get(f"conv{i}.bias"), dtype)
    return p


def load_torch_state_dict(path: str, cfg: GCNConfig = DEFAULT_CONFIG,
                          dtype=jnp.float32) -> Params:
    """Load a reference ``GCN_model_retrained.pt`` checkpoint.

    Accepts either a bare state_dict or a pickled module with
    ``state_dict()`` (phage_scoring.py:172-179)."""
    import torch  # local import: torch only needed for conversion

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(checkpoint, "state_dict"):
        checkpoint = checkpoint.state_dict()
    state = {k: v.detach().cpu().numpy() for k, v in checkpoint.items()}
    return params_from_numpy_state(state, cfg, dtype)


# ---------------------------------------------------------------------------
# forward pass
# ---------------------------------------------------------------------------

def model_inputs_from_features(features: jnp.ndarray,
                               cfg: GCNConfig = DEFAULT_CONFIG
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, 3·4096) encoder features → (x_p (B,4096,3), x_f (B,64,1)).

    Mirrors phage_scoring.py:191-194: pnode = moveaxis of the
    (B,3,4096) reshape; fnode = row-sums of the gap-0 64×64 matrix.
    """
    B = features.shape[0]
    f, pn, d3 = cfg.fnode_num, cfg.pnode_num, cfg.hidden_dim
    x_p = jnp.moveaxis(features.reshape(B, d3, pn), 1, 2)
    zero_layer = features.reshape(B, d3, f, f)[:, 0, :, :]
    x_f = jnp.sum(zero_layer, axis=2).reshape(B, f, 1)
    return x_p, x_f


def _sage(agg: jnp.ndarray, x_dst: jnp.ndarray, p: Params, name: str) -> jnp.ndarray:
    """SAGEConv: lin_l(mean-aggregated src) + lin_r(x_dst)."""
    return (
        agg @ p[f"{name}.lin_l.w"] + p[f"{name}.lin_l.b"] + x_dst @ p[f"{name}.lin_r.w"]
    )


def _layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                eps: float = 1e-5) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _dropout(x: jnp.ndarray, rate: float, key: Optional[jax.Array]) -> jnp.ndarray:
    if key is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def forward(params: Params, x_p: jnp.ndarray, x_f: jnp.ndarray,
            cfg: GCNConfig = DEFAULT_CONFIG,
            dropout_key: Optional[jax.Array] = None,
            return_logits: bool = False) -> jnp.ndarray:
    """Batched forward: (B,4096,3), (B,64,1) → (B,2) softmax probs
    (or logits for a numerically-stable training loss).

    ``dropout_key=None`` ⇒ eval mode (reference inference path,
    phage_scoring.py:209 ``no_grad`` + ``model.eval()``)."""
    B = x_p.shape[0]
    f, pn, d3, gd = cfg.fnode_num, cfg.pnode_num, cfg.hidden_dim, cfg.gcn_dim
    keys: List[Optional[jax.Array]] = [None] * 6
    if dropout_key is not None:
        keys = list(jax.random.split(dropout_key, 6))

    # dense node lifts (phage_scoring.py:93-99)
    x_p = (x_p.reshape(B, pn * d3) @ params["pnode_d.w"] + params["pnode_d.b"]).reshape(B, pn, d3)
    x_f = (x_f.reshape(B, f) @ params["fnode_d.w"] + params["fnode_d.b"]).reshape(B, f, d3)

    # alternating bipartite SAGE rounds (phage_scoring.py:101-110).
    # The fused per-batch-row VMEM kernel (gcn_sage_pallas: both rounds
    # + the inter-round LayerNorm, one HBM read + one write) is the
    # DEFAULT on the eval path since r5: the SAGE block is HBM-bound
    # (~3 GB of (B,4096,128) traffic at B=512 — scoring_parts_b512),
    # and the same-window chained A/B measured the full scorer 25.2 →
    # 20.4 ms/512 (20.3k → 25.1k contigs/s) with the kernel on.  The
    # r4 "no change at B=256" conclusion came from dispatch-RTT-polluted
    # timing (benchmarks/conv_dot_probe.py docstring).  Opt out with
    # PALACE_GCN_SAGE=xla.
    from palace_tpu.ops.pallas_kernels import gcn_sage_pallas, use_pallas as _up

    if (dropout_key is None and cfg.num_layers == 2 and _up()
            and os.environ.get("PALACE_GCN_SAGE", "pallas") == "pallas"):
        x_p = gcn_sage_pallas(params, x_p, x_f, cfg)
        return _head(params, x_p, cfg, keys, return_logits,
                     dropout_key=None)

    for i in range(cfg.num_layers):
        # f[i//64] → p[i] aggregation: the lin_l matmul commutes with
        # the 64-way repeat (repeat(x_f) @ W == repeat(x_f @ W), same
        # per-element float ops ⇒ bit-identical), so run it on the
        # 64-node side and broadcast the result — 1/64 the FLOPs and
        # the (B,4096,·) agg_p tensor is never materialised
        # (benchmarks/ab_gcn_variants.json: 8.9 → 8.1 ms/batch)
        lifted = (x_f @ params[f"convs_1.{i}.lin_l.w"]
                  + params[f"convs_1.{i}.lin_l.b"])
        x_p = jax.nn.relu(jnp.repeat(lifted, f, axis=1)
                          + x_p @ params[f"convs_1.{i}.lin_r.w"])
        x_p = _dropout(x_p, cfg.drop_rate, keys[2 * i])
        agg_f = x_p.reshape(B, f, f, -1).mean(axis=1)           # mean over {i : i%64==j}
        x_f = jax.nn.relu(_sage(agg_f, x_f, params, f"convs_2.{i}"))
        x_f = _dropout(x_f, cfg.drop_rate, keys[2 * i + 1])
        if i < cfg.num_layers - 1:
            x_p = _layer_norm(x_p, params["ln.scale"], params["ln.bias"])
            x_f = _layer_norm(x_f, params["ln.scale"], params["ln.bias"])

    return _head(params, x_p, cfg, keys, return_logits,
                 dropout_key=dropout_key)


def _head(params: Params, x_p: jnp.ndarray, cfg: GCNConfig,
          keys: List[Optional[jax.Array]], return_logits: bool,
          dropout_key: Optional[jax.Array]) -> jnp.ndarray:
    """Post-SAGE head: channel-scramble reshape → Conv1d×3 → FC →
    softmax (phage_scoring.py:112-120)."""
    B = x_p.shape[0]
    gd, pn = cfg.gcn_dim, cfg.pnode_num
    # channel scramble reshape — matches torch.reshape semantics exactly
    # (phage_scoring.py:112): (B·4096, 128) row-major → (B, 128, 4096)
    x = x_p.reshape(B, gd, pn)

    # Conv1d stack (phage_scoring.py:113-117).  PALACE_GCN_CONV=pallas
    # opts the eval path into the fused VMEM-resident kernel
    # (conv_head_pallas); default stays XLA — the two measured EQUAL on
    # v5e (~5.4–7 ms/batch interleaved, benchmarks/ANALYSIS.md): the
    # stack is bound by the MXU's behaviour at M=64/N=64 dot shapes
    # (~40 TF/s vs the 110 TF/s measured on square matmuls), which the
    # kernel's layout variants (channel-major taps, spatial-major taps,
    # K-stacking) could not lift, so fusing the HBM round-trips does
    # not move the total.
    from palace_tpu.ops.pallas_kernels import conv_head_pallas, use_pallas

    if (dropout_key is None and use_pallas()
            and os.environ.get("PALACE_GCN_CONV") == "pallas"):
        x = conv_head_pallas(
            x, [params[f"conv{i}.w"] for i in (1, 2, 3)],
            [params[f"conv{i}.b"] for i in (1, 2, 3)])
    else:
        dn = ("NCH", "OIH", "NCH")
        for i, drop_key_idx in ((1, None), (2, 4), (3, 5)):
            x = jax.lax.conv_general_dilated(
                x, params[f"conv{i}.w"], window_strides=(1,), padding="VALID",
                dimension_numbers=dn,
            ) + params[f"conv{i}.b"][None, :, None]
            x = jax.nn.relu(x)
            if drop_key_idx is not None:
                x = _dropout(x, cfg.drop_rate, keys[drop_key_idx])

    x = x.reshape(B, cfg.flat_dim)
    x = jax.nn.relu(x @ params["d1.w"] + params["d1.b"])
    logits = x @ params["d2.w"] + params["d2.b"]
    if return_logits:
        return logits
    return jax.nn.softmax(logits, axis=1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _forward_eval(params: Params, x_p: jnp.ndarray, x_f: jnp.ndarray,
                  cfg: GCNConfig) -> jnp.ndarray:
    return forward(params, x_p, x_f, cfg)


def phage_probabilities(params: Params, features: jnp.ndarray,
                        cfg: GCNConfig = DEFAULT_CONFIG) -> jnp.ndarray:
    """Encoder features → P(phage) per contig (column 1 of the softmax,
    phage_scoring.py:212)."""
    x_p, x_f = model_inputs_from_features(features, cfg)
    return _forward_eval(params, x_p, x_f, cfg)[:, 1]
