"""Isolate the Phase-A table-update cost on TPU and A/B variants.

bench_eref Phase A runs at ~204 ms/batch; the per-batch device work is
one sort (1.66 M hashes) + one gather + one scatter into the 4 GiB
table.  TPU scatter is the suspect (~100 ns/element serialized).

Variants, interleaved in one process:
  set        current TPU path: gather + scatter-set (indices sorted)
  addmin     scatter-add + scatter-min (the CPU path)
  set_donated same as set but with the table buffer donated
  sort_only  the sort alone (upper half of the update)
  gather_only the gather alone

Writes benchmarks/ab_table_scatter.json.
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
ITERS = int(os.environ.get("AB_ITERS", "4"))
N = int(os.environ.get("AB_N", str(4096 * 135 * 3)))  # hashes/batch
BITS = int(os.environ.get("AB_BITS", "32"))


def note(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from palace_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from palace_tpu.ops.count_table import (
        _sorted_run_lengths,
        split_hash,
        table_shape,
    )

    rows, width = table_shape(BITS)
    rng = np.random.default_rng(0)
    hashes = rng.integers(0, 2**BITS, (N,), dtype=np.uint64).astype(np.uint32)
    h = jax.device_put(jnp.asarray(hashes))
    table = jax.device_put(jnp.zeros((rows, width), jnp.uint8))
    cap = 3

    out = {"n": N, "bits": BITS, "reps": REPS, "iters": ITERS}
    path = Path(__file__).parent / "ab_table_scatter.json"

    def save():
        path.write_text(json.dumps(out, indent=1) + "\n")

    @jax.jit
    def upd_set(table, h, salt):
        s, total = _sorted_run_lengths(h ^ salt.astype(jnp.uint32),
                                       jnp.ones(h.shape, bool))
        hi, lo = split_hash(s, width)
        old = table[hi, lo]
        newv = jnp.minimum(old.astype(jnp.int32) + total,
                           jnp.int32(cap)).astype(jnp.uint8)
        t2 = table.at[hi, lo].set(newv, mode="drop", indices_are_sorted=True)
        return t2[0, 0].astype(jnp.int32) + t2[-1, -1].astype(jnp.int32)

    @jax.jit
    def upd_addmin(table, h, salt):
        s, total = _sorted_run_lengths(h ^ salt.astype(jnp.uint32),
                                       jnp.ones(h.shape, bool))
        n = s.shape[0]
        pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        nxt = jnp.concatenate([s[1:], s[-1:]])
        is_last = (pos == n - 1) | (s != nxt)
        inc = jnp.where(is_last, jnp.minimum(total, cap), 0).astype(jnp.uint8)
        hi, lo = split_hash(s, width)
        t2 = table.at[hi, lo].add(inc, mode="drop", indices_are_sorted=True)
        t2 = t2.at[hi, lo].min(jnp.uint8(cap), mode="drop",
                               indices_are_sorted=True)
        return t2[0, 0].astype(jnp.int32) + t2[-1, -1].astype(jnp.int32)

    @jax.jit
    def sort_only(h, salt):
        s, total = _sorted_run_lengths(h ^ salt.astype(jnp.uint32),
                                       jnp.ones(h.shape, bool))
        return s[0].astype(jnp.int32) + total[-1]

    @jax.jit
    def gather_only(table, h, salt):
        hi, lo = split_hash(h ^ salt.astype(jnp.uint32), width)
        return table[hi, lo].astype(jnp.int32).sum()

    arms = {
        "set": lambda salt: upd_set(table, h, salt),
        "addmin": lambda salt: upd_addmin(table, h, salt),
        "sort_only": lambda salt: sort_only(h, salt),
        "gather_only": lambda salt: gather_only(table, h, salt),
    }
    note("compiling")
    for name, fn in arms.items():
        note(f"  {name}")
        np.asarray(fn(jnp.int32(0)))
    note("timing")
    times = {k: [] for k in arms}
    for r in range(REPS):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            last = None
            for i in range(ITERS):
                last = fn(jnp.int32(r * ITERS + i + 1))
            np.asarray(last)
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        out[name + "_ms"] = statistics.median(ts) / ITERS * 1e3
    save()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
