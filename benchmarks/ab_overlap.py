"""Can the relay overlap host→device puts with device compute?

Three interleaved arms, one process (same relay weather):
  serial    put batch i, dispatch batch i   (the current bench loop)
  prestage  all inputs staged up front, dispatch only (device bound)
  overlap   a background thread device_puts batch i+1 while the main
            thread dispatches batch i on the previously staged input

If the relay serializes DMA with execution server-side, `overlap` will
match `serial`; if it overlaps, `overlap` approaches
max(wire, device) ≈ the wire bound.  Also times a bare device_put
call (no sync) to see whether the put itself blocks the host.

Writes benchmarks/ab_overlap.json.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time
from pathlib import Path
from queue import Queue

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPS = int(os.environ.get("AB_REPS", "5"))
BATCH = 256
NBATCH = 16
CONTIG_LEN = 10_000


def main() -> None:
    import jax
    import jax.numpy as jnp

    from palace_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from palace_tpu.models.gcn import DEFAULT_CONFIG, init_params
    from palace_tpu.models.scoring import _score_codes, pack_batch

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
    path = Path(__file__).parent / "ab_overlap.json"

    def log(msg):
        print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

    np.asarray(_score_codes(params, jnp.asarray(packs[0][0]),
                            jnp.asarray(packs[0][1]), jnp.asarray(packs[0][2]),
                            cfg, dtype))  # compile

    # ---- does a bare put block the host? ---------------------------------
    ts = []
    for r in range(3):
        fresh = packs[0][0] ^ np.uint8(r + 1)
        t0 = time.perf_counter()
        buf = jax.device_put(fresh)
        ts.append(time.perf_counter() - t0)
        del buf
    out["bare_put_ms"] = statistics.median(ts) * 1e3

    def arm_serial():
        last = None
        for pk, nc, ln in packs:
            last = _score_codes(params, jnp.asarray(pk), jnp.asarray(nc),
                                jnp.asarray(ln), cfg, dtype)
        np.asarray(last)

    def arm_prestage():
        staged = [(jax.device_put(p[0]), jax.device_put(p[1]),
                   jax.device_put(p[2])) for p in packs]
        last = None
        for pk, nc, ln in staged:
            last = _score_codes(params, pk, nc, ln, cfg, dtype)
        np.asarray(last)

    def arm_overlap():
        q: Queue = Queue(maxsize=2)

        def putter():
            for p in packs:
                q.put((jax.device_put(p[0]), jax.device_put(p[1]),
                       jax.device_put(p[2])))
            q.put(None)

        t = threading.Thread(target=putter, daemon=True)
        t.start()
        last = None
        while True:
            item = q.get()
            if item is None:
                break
            last = _score_codes(params, *item, cfg, dtype)
        np.asarray(last)
        t.join()

    arms = {"serial": arm_serial, "prestage": arm_prestage,
            "overlap": arm_overlap}
    times = {k: [] for k in arms}
    for r in range(REPS):
        log(f"rep {r}")
        for k, fn in arms.items():
            t0 = time.perf_counter()
            fn()
            times[k].append(time.perf_counter() - t0)
    n = NBATCH * BATCH
    for k, ts in times.items():
        out[k + "_contigs_per_s"] = {
            "median": n / statistics.median(ts),
            "min": n / max(ts), "max": n / min(ts)}
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
