"""Attribute the headline-bench bottleneck: relay wire vs dispatch
overhead vs device compute vs host packing.

Every timing here includes a host fetch of a fresh result — under the
axon relay `block_until_ready` acks without waiting (see ANALYSIS.md),
so only fetch-inclusive wall-times are meaningful.

Sections (each repeated REPS times, median reported):
  pack        host-side native packer rate (contigs/s)
  wire_put    sustained host→device throughput at the bench payload
              (B=256 packed batches, ~640 KB each), MB/s
  rtt         tiny-payload round-trip latency (dispatch+fetch of a
              scalar), ms
  device      scoring loop with ALL inputs pre-staged on device —
              isolates device compute + dispatch, no wire
  e2e         the current bench loop (pack-pipeline + ship + dispatch)
  fusedK      ship K batches in ONE transfer, lax.map on device
              (K in {4, 8}) — the candidate fix

Writes benchmarks/wire_diagnosis.json and prints a summary table.
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

REPS = int(os.environ.get("DIAG_REPS", "5"))
BATCH = 256
NBATCH = int(os.environ.get("DIAG_NBATCH", "16"))
CONTIG_LEN = 10_000
# comma-list of sections to run (default all); earlier results are
# preserved in wire_diagnosis.json so sections can be re-run piecemeal
SECTIONS = set(
    os.environ.get("DIAG_SECTIONS", "pack,rtt,wire,device,e2e,fused").split(",")
)


def median(xs):
    return statistics.median(xs)


def note(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


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

    params = init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)

    path = Path(__file__).parent / "wire_diagnosis.json"
    out = json.loads(path.read_text()) if path.exists() else {}
    out.update({"reps": REPS, "batch": BATCH, "nbatch": NBATCH,
                "contig_len": CONTIG_LEN})

    def save():  # partial results survive a timeout
        path.write_text(json.dumps(out, indent=1) + "\n")

    packs = [pack_batch(c) for c in chunks]
    if "pack" in SECTIONS:
        note("packing section")
        # ---- pack: host packer rate -------------------------------------
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            packs = [pack_batch(c) for c in chunks]
            ts.append(time.perf_counter() - t0)
        pack_t = median(ts)
        out["pack_contigs_per_s"] = NBATCH * BATCH / pack_t
        payload_bytes = sum(p[0].nbytes + p[1].nbytes + p[2].nbytes for p in packs)
        out["payload_mb_per_batch"] = payload_bytes / NBATCH / 1e6
        save()

    if "rtt" in SECTIONS:
        note("rtt section")
        # ---- rtt: tiny round-trip ---------------------------------------
        one = jnp.ones((8,), jnp.float32)
        tiny = jax.jit(lambda x: x.sum())
        float(np.asarray(tiny(one)))  # compile
        ts = []
        for _ in range(REPS * 4):
            t0 = time.perf_counter()
            float(np.asarray(tiny(one + 1.0)))
            ts.append(time.perf_counter() - t0)
        out["rtt_ms"] = median(ts) * 1e3
        save()

    note("wire_put section")
    if "wire" in SECTIONS:
        # ---- wire_put: sustained host→device at bench payload ------------
        # Queue all NBATCH transfers, then force completion by summing one
        # element from each on device and fetching the (fresh) scalar.
        host_payloads = [p[0] for p in packs]  # (256, L/4) uint8 each
        total_mb = sum(a.nbytes for a in host_payloads) / 1e6

        @jax.jit
        def touch(xs):
            return sum(x[0, 0].astype(jnp.int32) for x in xs)

        bufs = [jax.device_put(a) for a in host_payloads]
        int(np.asarray(touch(bufs)))  # compile + first pass
        ts = []
        for r in range(REPS):
            # fresh arrays each rep so the relay can't memoize
            fresh = [a ^ np.uint8(r + 1) for a in host_payloads]
            t0 = time.perf_counter()
            bufs = [jax.device_put(a) for a in fresh]
            int(np.asarray(touch(bufs)))
            ts.append(time.perf_counter() - t0)
        out["wire_put_mb_per_s"] = total_mb / median(ts)
        out["wire_put_s_per_batch"] = median(ts) / NBATCH
        save()

    if "device" in SECTIONS:
        note("device section (GCN compile ~1-2 min)")
        # ---- device: all inputs pre-staged ------------------------------
        staged = [(jax.device_put(p[0]), jax.device_put(p[1]),
                   jax.device_put(p[2])) for p in packs]
        r = _score_codes(params, *staged[0], cfg, dtype)
        np.asarray(r)  # compile
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            last = None
            for pk, nc, ln in staged:
                last = _score_codes(params, pk, nc, ln, cfg, dtype)
            np.asarray(last)
            ts.append(time.perf_counter() - t0)
        out["device_contigs_per_s"] = NBATCH * BATCH / median(ts)
        out["device_ms_per_batch"] = median(ts) / NBATCH * 1e3
        save()

    if "e2e" in SECTIONS:
        note("e2e section")
        # ---- e2e: current bench loop (ship per batch, no pack pipeline) --
        np.asarray(_score_codes(params, jnp.asarray(packs[0][0]),
                                jnp.asarray(packs[0][1]),
                                jnp.asarray(packs[0][2]), cfg, dtype))
        ts = []
        for r in range(REPS):
            t0 = time.perf_counter()
            last = None
            for pk, nc, ln in packs:
                last = _score_codes(params, jnp.asarray(pk), jnp.asarray(nc),
                                    jnp.asarray(ln), cfg, dtype)
            np.asarray(last)
            ts.append(time.perf_counter() - t0)
        out["e2e_ship_contigs_per_s"] = NBATCH * BATCH / median(ts)
        save()

    if "fused" in SECTIONS:
        note("fusedK section (fresh compiles)")
        # ---- fusedK: K batches per transfer+dispatch, lax.map on device --
        # params MUST be a jit argument, not a closure capture: captured
        # arrays become HLO constants, and 302 MB of bf16 weights inside
        # the compile payload overflows the relay's remote_compile body
        # limit (observed HTTP 413).
        from palace_tpu.models.scoring import _score_codes_k

        for K in (4, 8):
            note(f"compiling fused{K}")
            groups = []
            for g in range(NBATCH // K):
                sel = packs[g * K : (g + 1) * K]
                groups.append((np.stack([p[0] for p in sel]),
                               np.stack([p[1] for p in sel]),
                               np.stack([p[2] for p in sel])))
            r = _score_codes_k(params, *[jnp.asarray(a) for a in groups[0]],
                               cfg, dtype)
            np.asarray(r)  # compile
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                last = None
                for pk, nc, ln in groups:
                    last = _score_codes_k(params, jnp.asarray(pk),
                                          jnp.asarray(nc), jnp.asarray(ln),
                                          cfg, dtype)
                np.asarray(last)
                ts.append(time.perf_counter() - t0)
            out[f"fused{K}_contigs_per_s"] = NBATCH * BATCH / median(ts)
            save()

    save()
    for k, v in out.items():
        print(f"{k:28s} {v:.3f}" if isinstance(v, float) else f"{k:28s} {v}")


if __name__ == "__main__":
    main()
