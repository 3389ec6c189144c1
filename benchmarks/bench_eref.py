"""End-to-end eref throughput: reads/s through the full data path —
native FASTQ loader → device k-mer hashing → count-table update —
plus the Phase B reference scan (positions/s).

Reference equivalent: extract_ref.cpp read_fastq + read_index
multithreaded over CPU cores.  Run with no args; prints one JSON
object.  On the default axon device this measures the real chip; set
PALACE_BENCH_FORCE_CPU=1 to force host CPU.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from _common import fetch as _fetch, force_cpu_if_requested

jax = force_cpu_if_requested()

import jax.numpy as jnp


def main():
    from palace_tpu.config import KmerParams
    from palace_tpu.ops.count_table import CountTable
    from palace_tpu.ops.kmer import kmer_hashes
    from palace_tpu.ops.window import good_windows, window_thresholds
    from palace_tpu.search.eref import READ_BATCH, ROW_LEN, read_code_batches
    from palace_tpu.search.index import load_or_build_index

    dev = jax.devices()[0]
    bits = 32 if dev.platform == "tpu" else 26
    n_reads = int(os.environ.get("PALACE_BENCH_READS", "200000"))
    read_len = 150

    rng = np.random.default_rng(0)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    tmp = Path(tempfile.mkdtemp())
    ref = bytes(lut[rng.integers(0, 4, 300_000)]).decode()
    db = tmp / "db.fasta"
    db.write_text(f">ref1\n{ref}\n")
    fq = tmp / "reads.fastq"
    starts = rng.integers(0, len(ref) - read_len, n_reads)
    with open(fq, "w") as f:
        for i, s in enumerate(starts):
            f.write(f"@r{i}\n{ref[s:s+read_len]}\n+\n{'I'*read_len}\n")

    params = KmerParams(k=bits)
    index = load_or_build_index(db, k=bits)
    perm = jnp.asarray(index.perm)
    table = CountTable.create(bits)

    # warm the jit caches
    for codes in read_code_batches(fq, READ_BATCH, ROW_LEN, 100, bits):
        h, v = kmer_hashes(jnp.asarray(codes[:READ_BATCH]), perm, bits)
        table = table.add_kmers(h, v)
        break
    # force completion with a SCALAR fetch: fetching the full table
    # (4 GiB of counters at 32 bits) through a ~40 MB/s relay tunnel
    # would bill ~100 s of wire time to Phase A (the r3 --all run
    # recorded 1010 reads/s for exactly this reason)
    _fetch(table.table.reshape(-1)[:1])

    t0 = time.perf_counter()
    done = 0
    for codes in read_code_batches(fq, READ_BATCH, ROW_LEN, 100, bits):
        done += codes.shape[0]
        if codes.shape[0] < READ_BATCH:
            codes = np.pad(codes, ((0, READ_BATCH - codes.shape[0]), (0, 0)),
                           constant_values=4)
        h, v = kmer_hashes(jnp.asarray(codes), perm, bits)
        table = table.add_kmers(h, v)
    _fetch(table.table.reshape(-1)[:1])
    dt = time.perf_counter() - t0
    reads_per_s = done / dt

    # Phase B scan
    ref_hashes = np.asarray(index.ref_hashes(0))
    one_min, three_min = window_thresholds(params.window, params.hit_ratio,
                                           params.perfect_hit_ratio)
    # warm BOTH jits (the first good_windows call compiles; timing it
    # billed ~seconds of TPU compile to Phase B throughput)
    rh = jnp.asarray(ref_hashes)
    counts = table.lookup(rh)
    _fetch(good_windows(counts, rh, params.window, one_min, three_min))
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        counts = table.lookup(jnp.asarray(ref_hashes))
        good = good_windows(counts, jnp.asarray(ref_hashes), params.window,
                            one_min, three_min)
    _fetch(good)
    scan_pos_per_s = iters * ref_hashes.shape[0] / (time.perf_counter() - t0)

    print(json.dumps({
        "device": str(dev),
        "table_bits": bits,
        "phaseA_reads_per_s": round(reads_per_s, 1),
        "phaseA_Mbp_per_s": round(reads_per_s * read_len / 1e6, 2),
        "phaseB_Mpos_per_s": round(scan_pos_per_s / 1e6, 2),
    }))


if __name__ == "__main__":
    main()
