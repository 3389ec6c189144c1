"""Phase-B scale proof at realistic phagedb size (VERDICT r5 item 5).

Synthetic 5k-reference phagedb with MIXED lengths (log-uniform 5-300 kb,
the span of real phage genomes), scanned through the PRODUCTION
``search_references`` path on the real chip:

- index-build throughput (Mbp/s, the ``.k32`` packed-code build, D6)
- Phase-B Mpos/s (3-rep medians + spread) and dispatch/bucket counts
- device-memory residency: packed-DB bytes, count-table bytes, and the
  device allocator's peak, documenting the single-chip memory budget
  (search/eref.py puts the whole packed DB on device next to the 2 GiB
  nibble table — this run proves the headroom at 5k refs)

Env: PALACE_BENCH_REFS (default 5000), PALACE_BENCH_READS (200000).
Writes benchmarks/phaseb_5kref.json; prints one JSON line.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from _common import fetch as _fetch, force_cpu_if_requested

jax = force_cpu_if_requested()


def main():
    from palace_tpu.config import KmerParams
    from palace_tpu.search.eref import count_reads_into_table, search_references
    from palace_tpu.search.index import build_index
    from palace_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    bits = 32 if dev.platform == "tpu" else 26
    n_refs = int(os.environ.get("PALACE_BENCH_REFS", "5000"))
    n_reads = int(os.environ.get("PALACE_BENCH_READS", "200000"))
    reps = int(os.environ.get("PALACE_BENCH_REPS", "3"))
    read_len = 150

    rng = np.random.default_rng(7)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    tmp = Path(tempfile.mkdtemp())

    # log-uniform 5-300 kb — real phage genome span
    lengths = np.exp(rng.uniform(np.log(5_000), np.log(300_000), n_refs)).astype(np.int64)
    total_bp = int(lengths.sum())
    db = tmp / "db.fasta"
    t0 = time.perf_counter()
    with open(db, "w") as fh:
        for i, L in enumerate(lengths):
            seq = rng.integers(0, 4, int(L), dtype=np.uint8)
            fh.write(f">ref{i + 1}\n" + bytes(lut[seq]).decode() + "\n")
    gen_s = time.perf_counter() - t0

    # reads tiled from a subset of refs so Phase B reports real hits
    planted = rng.integers(0, max(1, n_refs // 50), n_reads)
    fq = tmp / "reads.fastq"
    with open(db) as fh:  # reread the planted refs' sequences
        seqs = {}
        name = None
        want = {f"ref{i + 1}" for i in set(int(p) for p in planted)}
        for line in fh:
            if line.startswith(">"):
                name = line[1:].strip()
            elif name in want:
                seqs[name] = seqs.get(name, "") + line.strip()
    keys = sorted(seqs)
    with open(fq, "w") as f:
        for i in range(n_reads):
            s = seqs[keys[i % len(keys)]]
            st = int(rng.integers(0, max(1, len(s) - read_len)))
            f.write(f"@r{i}\n{s[st:st + read_len]}\n+\n{'I' * read_len}\n")

    t0 = time.perf_counter()
    index = build_index(db, k=bits, save=False)
    build_s = time.perf_counter() - t0

    params = KmerParams(k=bits)

    def phase_a():
        t0 = time.perf_counter()
        table = count_reads_into_table([fq], index, params)
        _fetch(table.table.reshape(-1)[:1])
        return time.perf_counter() - t0, table

    def phase_b(table):
        t0 = time.perf_counter()
        hits = search_references(table, index, params)
        return time.perf_counter() - t0, hits

    ta_warm, table = phase_a()
    tb_warm, _ = phase_b(table)

    a_ts, b_ts, n_hits = [], [], 0
    for _ in range(reps):
        dt_a, table = phase_a()
        a_ts.append(dt_a)
        dt_b, hits = phase_b(table)
        b_ts.append(dt_b)
        n_hits = len(hits)
    dt_b = statistics.median(b_ts)
    total_pos = int(sum(int(L) for L in index.lengths))

    mem = {}
    try:
        stats = dev.memory_stats() or {}
        mem = {
            "bytes_in_use": int(stats.get("bytes_in_use", 0)),
            "peak_bytes_in_use": int(stats.get("peak_bytes_in_use", 0)),
            "bytes_limit": int(stats.get("bytes_limit", 0)),
        }
    except Exception:
        pass

    from palace_tpu.ops.window import bucket_len

    targets = sorted({bucket_len(int(L)) for L in index.lengths})
    payload = {
        "device": str(dev),
        "table_bits": bits,
        "n_refs": n_refs,
        "length_span_bp": [int(lengths.min()), int(lengths.max())],
        "total_bp": total_bp,
        "index_build_s": round(build_s, 2),
        "index_build_Mbp_per_s": round(total_bp / build_s / 1e6, 2),
        "packed_db_MB": round(index.packed.nbytes / 1e6, 1),
        "phaseA_reads_per_s": round(n_reads / statistics.median(a_ts), 1),
        "phaseB_s": round(dt_b, 3),
        "phaseB_warm_first_s": round(tb_warm, 2),
        "phaseB_Mpos_per_s": round(total_pos / dt_b / 1e6, 2),
        "phaseB_spread_s": [round(min(b_ts), 3), round(max(b_ts), 3)],
        "n_len_buckets": len(targets),
        "n_hits": n_hits,
        "n_planted": len(want),
        "device_memory": mem,
        "db_gen_s": round(gen_s, 1),
        "recorded_unix": int(time.time()),
    }
    out = Path(__file__).parent / f"phaseb_{n_refs // 1000}kref.json"
    out.write_text(json.dumps(payload, indent=1) + "\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
