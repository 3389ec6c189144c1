"""Split the fused scorer's device time into its two halves — the
packed->features encoder and the GCN forward — plus the three heavy
sub-blocks of the forward (pnode lift, SAGE rounds, conv/FC head).

All inputs are pre-staged on device; every timing fetches a fresh
scalar (relay rule: only fetch-inclusive times are real).  Writes
benchmarks/scoring_parts.json.
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

REPS = int(os.environ.get("PROF_REPS", "5"))
BATCH = 256
CONTIG_LEN = 10_000


def note(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def bench(fn, *args, reps=REPS):
    np.asarray(fn(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3  # ms


def main() -> None:
    import functools

    import jax
    import jax.numpy as jnp

    from palace_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from palace_tpu.models.gcn import DEFAULT_CONFIG, forward, init_params
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

    out = {"batch": BATCH, "contig_len": CONTIG_LEN, "reps": REPS,
           "pallas": bool(int(os.environ.get("PALACE_DISABLE_PALLAS", "0")) == 0)}

    note("full fused scorer")
    out["full_ms"] = bench(lambda: _score_codes(params, pk, nc, ln, cfg, dtype))

    note("encoder half")
    enc = jax.jit(lambda p, n, l: features_from_packed(p, n, l).astype(dtype))
    out["encoder_ms"] = bench(lambda: enc(pk, nc, ln))
    feats = jax.device_put(enc(pk, nc, ln))

    note("forward half")
    from palace_tpu.models.gcn import model_inputs_from_features

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def fwd(params, feats, cfg):
        x_p, x_f = model_inputs_from_features(feats, cfg)
        return forward(params, x_p, x_f, cfg)[:, 1]

    out["forward_ms"] = bench(lambda: fwd(params, feats, cfg))

    note("forward sub-blocks")
    B = BATCH
    f, pn, d3, gd = cfg.fnode_num, cfg.pnode_num, cfg.hidden_dim, cfg.gcn_dim
    x_p0 = jax.device_put(jnp.zeros((B, pn, d3), dtype))
    x_f0 = jax.device_put(jnp.zeros((B, f, 1), dtype))

    @jax.jit
    def lift(params, x_p, x_f):
        a = (x_p.reshape(B, pn * d3) @ params["pnode_d.w"] + params["pnode_d.b"])
        b = (x_f.reshape(B, f) @ params["fnode_d.w"] + params["fnode_d.b"])
        return a.sum() + b.sum()

    out["lift_ms"] = bench(lambda: lift(params, x_p0, x_f0))

    xp_big = jax.device_put(jnp.zeros((B, pn, gd), dtype))

    @jax.jit
    def convhead(params, x_p):
        x = x_p.reshape(B, gd, pn)
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

    out["convhead_ms"] = bench(lambda: convhead(params, xp_big))

    out["sage_ms_est"] = out["forward_ms"] - out["lift_ms"] - out["convhead_ms"]

    (Path(__file__).parent / "scoring_parts.json").write_text(
        json.dumps(out, indent=1) + "\n")
    for k, v in out.items():
        print(f"{k:16s} {v}")


if __name__ == "__main__":
    main()
