"""Split the fused scorer's device time into the packed->features
encoder and the GCN forward, plus the heavy forward sub-blocks
(pnode/fnode lift, SAGE rounds, conv/FC head).

Relay-proof methodology (v2): every timed stage

* returns a SCALAR (a 6 MB feature fetch costs ~150 ms on the ~40 MB/s
  tunnel and swamps the kernel being measured),
* is dispatched ITERS times with a distinct int32 salt folded into the
  input (identical re-executions appear memoized by the relay), with
  ONE host fetch of the last result — amortizing the ~29 ms RTT to
  <1 ms per iteration.

Writes benchmarks/scoring_parts.json.
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

REPS = int(os.environ.get("PROF_REPS", "3"))
ITERS = int(os.environ.get("PROF_ITERS", "32"))
BATCH = int(os.environ.get("PROF_BATCH", "256"))
CONTIG_LEN = 10_000


def note(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> None:
    import functools

    import jax
    import jax.numpy as jnp

    from palace_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from palace_tpu.models.gcn import (
        DEFAULT_CONFIG,
        _layer_norm,
        _sage,
        forward,
        init_params,
        model_inputs_from_features,
    )
    from palace_tpu.models.scoring import _score_codes, pack_batch
    from palace_tpu.ops.encoder import features_from_packed

    cfg = DEFAULT_CONFIG
    dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = rng.integers(0, 4, size=(BATCH, CONTIG_LEN), dtype=np.int8)
    seqs = [bytes(lut[row]).decode() for row in base]
    packed, n_codes, lens = pack_batch(seqs)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)

    pk = jax.device_put(jnp.asarray(packed))
    nc = jax.device_put(jnp.asarray(n_codes))
    ln = jax.device_put(jnp.asarray(lens))

    def bench(fn):
        """fn(salt: int32 array) -> scalar device value."""
        np.asarray(fn(jnp.int32(0)))  # compile + warm
        ts = []
        for r in range(REPS):
            t0 = time.perf_counter()
            last = None
            for i in range(ITERS):
                last = fn(jnp.int32(r * ITERS + i + 1))
            np.asarray(last)
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts) / ITERS * 1e3  # ms per iteration

    out = {"batch": BATCH, "contig_len": CONTIG_LEN, "reps": REPS,
           # suffix the artifact per batch so runs do not clobber

           "iters": ITERS,
           "pallas": not os.environ.get("PALACE_NO_PALLAS")}
    path = Path(__file__).parent / (
        "scoring_parts.json" if BATCH == 256
        else f"scoring_parts_b{BATCH}.json")

    def save():
        path.write_text(json.dumps(out, indent=1) + "\n")

    B = BATCH
    f, pn, d3, gd = cfg.fnode_num, cfg.pnode_num, cfg.hidden_dim, cfg.gcn_dim

    # Every jitted stage takes params/inputs as ARGUMENTS: closure
    # captures become HLO constants, and 302 MB of bf16 weights inside
    # the compile payload trips the relay's remote_compile body limit
    # (HTTP 413 — same trap as _score_codes_k, see scoring.py).

    note("full fused scorer")

    @jax.jit
    def full(params, pk, nc, ln, salt):
        # salt the packed codes (XOR) so every dispatch is distinct
        return _score_codes.__wrapped__(
            params, pk ^ salt.astype(jnp.uint8), nc, ln, cfg, dtype).sum()

    out["full_ms"] = bench(lambda salt: full(params, pk, nc, ln, salt))
    save()

    note("encoder half")

    @jax.jit
    def enc(pk, nc, ln, salt):
        feats = features_from_packed(pk ^ salt.astype(jnp.uint8), nc, ln)
        return feats.astype(dtype).sum()

    out["encoder_ms"] = bench(lambda salt: enc(pk, nc, ln, salt))
    save()

    note("forward half")
    feats = jax.jit(
        lambda pk, nc, ln: features_from_packed(pk, nc, ln).astype(dtype)
    )(pk, nc, ln)

    @jax.jit
    def fwd(params, feats, salt):
        # tiny distinct perturbation per dispatch (relay memoizes
        # identical re-executions); 1e-3 on count features is harmless
        x_p, x_f = model_inputs_from_features(
            feats + salt.astype(dtype) * jnp.asarray(1e-3, dtype), cfg)
        return forward(params, x_p, x_f, cfg)[:, 1].sum()

    out["forward_ms"] = bench(lambda salt: fwd(params, feats, salt))
    save()

    note("forward sub-blocks")
    x_p0 = jax.device_put(jnp.zeros((B, pn, d3), dtype))
    x_f0 = jax.device_put(jnp.zeros((B, f, 1), dtype))

    @jax.jit
    def lift(params, x_p0, x_f0, salt):
        xp = x_p0 + salt.astype(dtype)
        xf = x_f0 + salt.astype(dtype)
        a = (xp.reshape(B, pn * d3) @ params["pnode_d.w"] + params["pnode_d.b"])
        b = (xf.reshape(B, f) @ params["fnode_d.w"] + params["fnode_d.b"])
        return a.sum() + b.sum()

    out["lift_ms"] = bench(lambda salt: lift(params, x_p0, x_f0, salt))
    save()

    # SAGE rounds exactly as in forward (gcn.py:221-230)
    xp_l = jax.device_put(jnp.zeros((B, pn, d3), dtype))
    xf_l = jax.device_put(jnp.zeros((B, f, d3), dtype))

    @jax.jit
    def sage_rounds(params, xp_l, xf_l, salt):
        x_p = xp_l + salt.astype(dtype)
        x_f = xf_l + salt.astype(dtype)
        for i in range(cfg.num_layers):
            agg_p = jnp.repeat(x_f, f, axis=1)
            x_p = jax.nn.relu(_sage(agg_p, x_p, params, f"convs_1.{i}"))
            agg_f = x_p.reshape(B, f, f, -1).mean(axis=1)
            x_f = jax.nn.relu(_sage(agg_f, x_f, params, f"convs_2.{i}"))
            if i < cfg.num_layers - 1:
                x_p = _layer_norm(x_p, params["ln.scale"], params["ln.bias"])
                x_f = _layer_norm(x_f, params["ln.scale"], params["ln.bias"])
        return x_p.sum() + x_f.sum()

    out["sage_ms"] = bench(lambda salt: sage_rounds(params, xp_l, xf_l, salt))
    save()

    xp_big = jax.device_put(jnp.zeros((B, pn, gd), dtype))

    @jax.jit
    def convhead(params, xp_big, salt):
        x = (xp_big + salt.astype(dtype)).reshape(B, gd, pn)
        dn = ("NCH", "OIH", "NCH")
        for i in (1, 2, 3):
            x = jax.lax.conv_general_dilated(
                x, params[f"conv{i}.w"], window_strides=(1,), padding="VALID",
                dimension_numbers=dn,
            ) + params[f"conv{i}.b"][None, :, None]
            x = jax.nn.relu(x)
        x = x.reshape(B, cfg.flat_dim)
        x = jax.nn.relu(x @ params["d1.w"] + params["d1.b"])
        return (x @ params["d2.w"] + params["d2.b"]).sum()

    out["convhead_ms"] = bench(lambda salt: convhead(params, xp_big, salt))
    save()

    # negative = the isolated blocks OVER-ADD relative to the fused
    # whole (XLA fuses across block boundaries); positive = time the
    # block split does not attribute
    out["full_minus_blocks_ms"] = (out["full_ms"] - out["encoder_ms"]
                                   - out["lift_ms"] - out["sage_ms"]
                                   - out["convhead_ms"])
    save()
    for k, v in out.items():
        print(f"{k:18s} {v}")


if __name__ == "__main__":
    main()
