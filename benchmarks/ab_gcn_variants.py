"""A/B candidate optimisations for the GCN forward's two hot blocks
(benchmarks/scoring_parts.json: SAGE rounds 8.9 ms, conv head 7.1 ms of
the 13.8 ms full scorer at B=256 bf16).

Variants (each parity-checked against the baseline block first):

  sage_base / sage_opt
      opt hoists the lin_l matmul through the repeat:
      ``repeat(x_f, 64) @ W == repeat(x_f @ W, 64)`` — the (B,64,gd)
      matmul runs at 1/64 the FLOPs and the (B,4096,gd_in) agg_p
      tensor is never materialised; same algebra for the mean side
      (matmul after the 64-way mean, not before).

  conv_nch / conv_nhc
      nhc transposes once to channels-minor (the TPU's lane dim),
      runs the three convs in NHC, and transposes back before the
      flatten so downstream semantics are unchanged.

Relay-proof timing: scalar outputs, ITERS salted dispatches per fetch,
params as jit ARGUMENTS (closure-captured weights overflow the relay's
remote_compile body limit).  Writes benchmarks/ab_gcn_variants.json.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPS = int(os.environ.get("AB_REPS", "3"))
ITERS = int(os.environ.get("AB_ITERS", "16"))
BATCH = 256


def note(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from palace_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from palace_tpu.models.gcn import DEFAULT_CONFIG, _layer_norm, _sage, init_params

    cfg = DEFAULT_CONFIG
    dtype = jnp.bfloat16
    B = BATCH
    f, pn, d3, gd = cfg.fnode_num, cfg.pnode_num, cfg.hidden_dim, cfg.gcn_dim

    params = init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    rng = np.random.default_rng(0)
    xp0 = jnp.asarray(rng.normal(0, 1, (B, pn, d3)), dtype)
    xf0 = jnp.asarray(rng.normal(0, 1, (B, f, d3)), dtype)
    xbig0 = jnp.asarray(rng.normal(0, 1, (B, pn, gd)), dtype)

    out = {"batch": B, "reps": REPS, "iters": ITERS}
    path = Path(__file__).parent / "ab_gcn_variants.json"

    def save():
        path.write_text(json.dumps(out, indent=1) + "\n")

    # ---- SAGE rounds -----------------------------------------------------
    def sage_body_base(params, x_p, x_f):
        for i in range(cfg.num_layers):
            agg_p = jnp.repeat(x_f, f, axis=1)
            x_p = jax.nn.relu(_sage(agg_p, x_p, params, f"convs_1.{i}"))
            agg_f = x_p.reshape(B, f, f, -1).mean(axis=1)
            x_f = jax.nn.relu(_sage(agg_f, x_f, params, f"convs_2.{i}"))
            if i < cfg.num_layers - 1:
                x_p = _layer_norm(x_p, params["ln.scale"], params["ln.bias"])
                x_f = _layer_norm(x_f, params["ln.scale"], params["ln.bias"])
        return x_p, x_f

    def sage_body_opt(params, x_p, x_f):
        for i in range(cfg.num_layers):
            # repeat(x_f, 64) @ W_l == repeat(x_f @ W_l, 64): run the
            # lin_l matmul on the 64-node side, broadcast after
            lifted = (x_f @ params[f"convs_1.{i}.lin_l.w"]
                      + params[f"convs_1.{i}.lin_l.b"])
            x_p = jax.nn.relu(
                jnp.repeat(lifted, f, axis=1)
                + x_p @ params[f"convs_1.{i}.lin_r.w"])
            agg_f = x_p.reshape(B, f, f, -1).mean(axis=1)
            x_f = jax.nn.relu(_sage(agg_f, x_f, params, f"convs_2.{i}"))
            if i < cfg.num_layers - 1:
                x_p = _layer_norm(x_p, params["ln.scale"], params["ln.bias"])
                x_f = _layer_norm(x_f, params["ln.scale"], params["ln.bias"])
        return x_p, x_f

    note("sage parity")
    pb = jax.jit(lambda p, a, b: sage_body_base(p, a, b))(params, xp0, xf0)
    po = jax.jit(lambda p, a, b: sage_body_opt(p, a, b))(params, xp0, xf0)
    for got, want in zip(po, pb):
        diff = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                     - want.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(want.astype(jnp.float32)))) or 1.0
        out.setdefault("sage_parity_reldiff", []).append(diff / scale)
    save()

    @jax.jit
    def sage_a(params, xp, xf, salt):
        x_p, x_f = sage_body_base(params, xp + salt.astype(dtype) * 0.001, xf)
        return x_p.sum() + x_f.sum()

    @jax.jit
    def sage_b(params, xp, xf, salt):
        x_p, x_f = sage_body_opt(params, xp + salt.astype(dtype) * 0.001, xf)
        return x_p.sum() + x_f.sum()

    note("sage timing (interleaved)")
    np.asarray(sage_a(params, xp0, xf0, jnp.int32(0)))
    np.asarray(sage_b(params, xp0, xf0, jnp.int32(0)))
    a_ts, b_ts = [], []
    for r in range(REPS):
        for fn, ts in ((sage_a, a_ts), (sage_b, b_ts)):
            t0 = time.perf_counter()
            last = None
            for i in range(ITERS):
                last = fn(params, xp0, xf0, jnp.int32(r * ITERS + i + 1))
            np.asarray(last)
            ts.append(time.perf_counter() - t0)
    out["sage_base_ms"] = statistics.median(a_ts) / ITERS * 1e3
    out["sage_opt_ms"] = statistics.median(b_ts) / ITERS * 1e3
    save()

    # ---- conv head -------------------------------------------------------
    def conv_nch(params, x):
        x = x.reshape(B, gd, pn)
        dn = ("NCH", "OIH", "NCH")
        for i in (1, 2, 3):
            x = jax.lax.conv_general_dilated(
                x, params[f"conv{i}.w"], window_strides=(1,), padding="VALID",
                dimension_numbers=dn,
            ) + params[f"conv{i}.b"][None, :, None]
            x = jax.nn.relu(x)
        return x.reshape(B, cfg.flat_dim)

    def conv_nhc(params, x):
        x = x.reshape(B, gd, pn).transpose(0, 2, 1)  # (B, pn, gd) channels-minor
        dn = ("NHC", "HIO", "NHC")
        for i in (1, 2, 3):
            w = params[f"conv{i}.w"].transpose(2, 1, 0)  # OIH → HIO
            x = jax.lax.conv_general_dilated(
                x, w, window_strides=(1,), padding="VALID",
                dimension_numbers=dn,
            ) + params[f"conv{i}.b"][None, None, :]
            x = jax.nn.relu(x)
        return x.transpose(0, 2, 1).reshape(B, cfg.flat_dim)

    def conv_tap(params, x):
        """Channels-last; each conv as K accumulated (B·L', C)@(C, O)
        MXU matmuls over shifted input views — no conv lowering at
        all, and XLA can fuse the adds into the matmul epilogues."""
        x = x.reshape(B, gd, pn).transpose(0, 2, 1)  # (B, L, C)
        for i in (1, 2, 3):
            w = params[f"conv{i}.w"]  # (O, C, K)
            K = w.shape[2]
            L_out = x.shape[1] - K + 1
            acc = None
            for k in range(K):
                part = x[:, k:k + L_out, :] @ w[:, :, k].T
                acc = part if acc is None else acc + part
            x = jax.nn.relu(acc + params[f"conv{i}.b"][None, None, :])
        return x.transpose(0, 2, 1).reshape(B, cfg.flat_dim)

    def conv_im2col(params, x):
        """Channels-last; materialise the K shifted views once and run
        ONE (B·L', K·C)@(K·C, O) matmul per conv."""
        x = x.reshape(B, gd, pn).transpose(0, 2, 1)  # (B, L, C)
        for i in (1, 2, 3):
            w = params[f"conv{i}.w"]  # (O, C, K)
            O, C, K = w.shape
            L_out = x.shape[1] - K + 1
            cols = jnp.concatenate(
                [x[:, k:k + L_out, :] for k in range(K)], axis=2)  # (B,L',K·C)
            wm = w.transpose(2, 1, 0).reshape(K * C, O)            # (K·C, O)
            x = jax.nn.relu(cols @ wm + params[f"conv{i}.b"][None, None, :])
        return x.transpose(0, 2, 1).reshape(B, cfg.flat_dim)

    note("conv parity")
    variants = [("nch", conv_nch), ("nhc", conv_nhc), ("tap", conv_tap),
                ("im2col", conv_im2col)]
    ca = jax.jit(conv_nch)(params, xbig0)
    for name, fn in variants[1:]:
        cb = jax.jit(fn)(params, xbig0)
        diff = float(jnp.max(jnp.abs(ca.astype(jnp.float32)
                                     - cb.astype(jnp.float32))))
        out[f"conv_parity_maxdiff_{name}"] = diff
    save()

    timed = {}
    for name, fn in variants:
        @jax.jit
        def conv_t(params, x, salt, _fn=fn):
            return _fn(params, x + salt.astype(dtype) * 0.001).sum()
        np.asarray(conv_t(params, xbig0, jnp.int32(0)))
        timed[name] = conv_t

    note("conv timing (interleaved)")
    ts_by = {name: [] for name, _ in variants}
    for r in range(REPS):
        for name, _ in variants:
            fn = timed[name]
            t0 = time.perf_counter()
            last = None
            for i in range(ITERS):
                last = fn(params, xbig0, jnp.int32(r * ITERS + i + 1))
            np.asarray(last)
            ts_by[name].append(time.perf_counter() - t0)
    for name, _ in variants:
        out[f"conv_{name}_ms"] = statistics.median(ts_by[name]) / ITERS * 1e3
    save()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
