"""Component-level timings on the current JAX device.

Times (a) the 3-mer encoder, (b) the GCN forward, (c) k-mer hashing of
read batches, (d) count-table update, (e) count-table lookup + window
scan — the hot ops of the two device pipelines.  Used to direct
Pallas-kernel work; prints one JSON object.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from _common import fetch as _fetch, force_cpu_if_requested

jax = force_cpu_if_requested()

import jax.numpy as jnp


def timeit(fn, *args, warmup=2, iters=20):
    r = None
    for _ in range(warmup):
        r = fn(*args)
    _fetch(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _fetch(r)
    return (time.perf_counter() - t0) / iters


def main():
    from palace_tpu.models.gcn import DEFAULT_CONFIG, forward, init_params, model_inputs_from_features
    from palace_tpu.ops.encoder import _transition_counts
    from palace_tpu.ops.count_table import CountTable
    from palace_tpu.ops.kmer import kmer_hashes, make_choose_coder
    from palace_tpu.ops.window import good_windows, window_thresholds

    dev = jax.devices()[0]
    out = {"device": str(dev)}
    rng = np.random.default_rng(0)

    # (a) encoder: batch 64 contigs of 10 kb
    B, L = 64, 10240
    locs = jnp.asarray(rng.integers(0, 64, (B, L), dtype=np.int32))
    nloc = jnp.full((B,), L - 100, jnp.int32)
    t = timeit(lambda: _transition_counts(locs, nloc))
    out["encoder_s_per_batch64"] = round(t, 5)
    out["encoder_contigs_per_s"] = round(B / t, 1)

    # (b) GCN forward, batch 64
    cfg = DEFAULT_CONFIG
    params = init_params(jax.random.PRNGKey(0), cfg)
    x_p = jnp.asarray(rng.normal(0, 1, (64, cfg.pnode_num, cfg.hidden_dim)), jnp.float32)
    x_f = jnp.asarray(rng.normal(0, 1, (64, cfg.fnode_num, 1)), jnp.float32)
    fwd = jax.jit(lambda p, a, b: forward(p, a, b, cfg))
    t = timeit(fwd, params, x_p, x_f)
    out["gcn_s_per_batch64"] = round(t, 5)
    out["gcn_contigs_per_s"] = round(64 / t, 1)

    # (c) k-mer hashing: 4096 reads × 150 bp, k=32
    k = 32
    perm = make_choose_coder(k, 1)
    codes = jnp.asarray(rng.integers(0, 4, (4096, 150), dtype=np.uint8))
    t = timeit(lambda: kmer_hashes(codes, perm, k))
    n_kmers = 4096 * (150 - k + 1)
    out["hash_s_per_batch"] = round(t, 5)
    out["hash_Mkmers_per_s"] = round(n_kmers / t / 1e6, 2)
    out["hash_reads_per_s"] = round(4096 / t, 1)

    # (d) count-table update (full 2^32 table on TPU; 2^26 on CPU)
    bits = 32 if dev.platform == "tpu" else 26
    table = CountTable.create(k=bits)
    hashes, valid = kmer_hashes(codes, perm, k)
    if bits < 32:
        hashes = jnp.asarray(np.asarray(hashes) % np.uint32(1 << bits), jnp.uint32)
    t = timeit(lambda: CountTable(table.table, bits).add_kmers(hashes, valid).table)
    out["table_bits"] = bits
    out["update_s_per_batch"] = round(t, 5)
    out["update_Mkmers_per_s"] = round(n_kmers * 3 / t / 1e6, 2)

    # (e) lookup + window scan over 1 Mb of reference positions
    M = 1 << 20
    ref_hashes = jnp.asarray(rng.integers(0, 1 << bits, (M, 3), dtype=np.uint32))
    t = timeit(lambda: table.lookup(ref_hashes))
    out["lookup_s_per_Mpos"] = round(t, 5)
    out["lookup_Mpos_per_s"] = round(M / t / 1e6, 2)

    counts = table.lookup(ref_hashes)
    one_min, three_min = window_thresholds(500, 0.9, 0.85)
    t = timeit(lambda: good_windows(counts, ref_hashes, 500, one_min, three_min))
    out["window_s_per_Mpos"] = round(t, 5)
    out["window_Mpos_per_s"] = round(M / t / 1e6, 2)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
