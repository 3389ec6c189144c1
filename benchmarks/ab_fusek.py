"""Within-process interleaved A/B of per-batch vs K-fused dispatch.

The relay's run-to-run variance (7.8k–13k contigs/s for identical code
across a morning) swamps cross-process comparisons; this interleaves
the arms rep-by-rep in one process so they share the same relay
weather.  Also measures device_put MB/s vs transfer size to expose any
superlinear put cost for the K-stacked payload.

Writes benchmarks/ab_fusek.json.
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

REPS = int(os.environ.get("AB_REPS", "5"))
BATCH = 256
NBATCH = 16  # per rep per arm
CONTIG_LEN = 10_000


def main() -> None:
    import jax
    import jax.numpy as jnp

    from palace_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from palace_tpu.models.gcn import DEFAULT_CONFIG, init_params
    from palace_tpu.models.scoring import _score_codes, _score_codes_k, pack_batch

    cfg = DEFAULT_CONFIG
    dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = rng.integers(0, 4, size=(NBATCH * BATCH, CONTIG_LEN), dtype=np.int8)
    seqs = [bytes(lut[row]).decode() for row in base]
    chunks = [seqs[i * BATCH : (i + 1) * BATCH] for i in range(NBATCH)]
    packs = [pack_batch(c) for c in chunks]

    params = init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)

    out = {"reps": REPS, "batch": BATCH, "nbatch": NBATCH}
    path = Path(__file__).parent / "ab_fusek.json"

    def log(msg):
        print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

    # ---- put throughput vs size ------------------------------------------
    log("put-size sweep")
    put = {}
    for mb, arr in (
        ("0.66MB", packs[0][0]),
        ("2.6MB", np.stack([p[0] for p in packs[:4]])),
        ("5.3MB", np.stack([p[0] for p in packs[:8]])),
    ):
        @jax.jit
        def touch(x):
            return x.reshape(-1)[0].astype(jnp.int32) + x.reshape(-1)[-1].astype(jnp.int32)

        int(np.asarray(touch(jnp.asarray(arr))))  # compile
        ts = []
        for r in range(REPS):
            fresh = arr ^ np.uint8(r + 1)
            t0 = time.perf_counter()
            int(np.asarray(touch(jnp.asarray(fresh))))
            ts.append(time.perf_counter() - t0)
        med = statistics.median(ts)
        put[mb] = {"s": med, "mb_per_s": arr.nbytes / 1e6 / med}
    out["put_by_size"] = put
    path.write_text(json.dumps(out, indent=1) + "\n")

    # ---- compile both arms -----------------------------------------------
    log("compiling arms")
    K = 4
    groups = []
    for g in range(NBATCH // K):
        sel = packs[g * K : (g + 1) * K]
        groups.append((np.stack([p[0] for p in sel]),
                       np.stack([p[1] for p in sel]),
                       np.stack([p[2] for p in sel])))
    np.asarray(_score_codes(params, jnp.asarray(packs[0][0]),
                            jnp.asarray(packs[0][1]), jnp.asarray(packs[0][2]),
                            cfg, dtype))
    np.asarray(_score_codes_k(params, *(jnp.asarray(a) for a in groups[0]),
                              cfg, dtype))

    def arm_per_batch():
        last = None
        for pk, nc, ln in packs:
            last = _score_codes(params, jnp.asarray(pk), jnp.asarray(nc),
                                jnp.asarray(ln), cfg, dtype)
        np.asarray(last)

    def arm_fused():
        last = None
        for pk, nc, ln in groups:
            last = _score_codes_k(params, jnp.asarray(pk), jnp.asarray(nc),
                                  jnp.asarray(ln), cfg, dtype)
        np.asarray(last)

    # ---- interleave ------------------------------------------------------
    a_ts, b_ts = [], []
    for r in range(REPS):
        log(f"rep {r}")
        t0 = time.perf_counter(); arm_per_batch(); a_ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); arm_fused(); b_ts.append(time.perf_counter() - t0)
    n = NBATCH * BATCH
    out["per_batch_contigs_per_s"] = {
        "median": n / statistics.median(a_ts),
        "min": n / max(a_ts), "max": n / min(a_ts)}
    out["fused4_contigs_per_s"] = {
        "median": n / statistics.median(b_ts),
        "min": n / max(b_ts), "max": n / min(b_ts)}
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
