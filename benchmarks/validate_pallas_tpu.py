"""Validate the Pallas kernels on real TPU hardware: parity vs the XLA
paths plus throughput for both.  Run under `timeout` — a wedged kernel
must not hang the session.

Usage: python benchmarks/validate_pallas_tpu.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    rng = np.random.default_rng(0)

    # --- transition encoder ---
    from palace_tpu.ops.encoder import _transition_counts
    from palace_tpu.ops.pallas_kernels import transition_counts_pallas

    B, L = 64, 10240
    locs = rng.integers(0, 64, size=(B, L), dtype=np.int32)
    n_locs = np.full((B,), L - 2, dtype=np.int32)
    locs_j = jnp.asarray(locs)
    n_j = jnp.asarray(n_locs)

    ref = np.asarray(_transition_counts(locs_j, n_j))
    pal = np.asarray(transition_counts_pallas(locs_j, n_j))
    enc_ok = np.array_equal(ref, pal)
    print(f"encoder parity (B={B}, L={L}): {'OK' if enc_ok else 'MISMATCH'}"
          f"  max|diff|={np.abs(ref - pal).max()}")

    t_xla = timeit(_transition_counts, locs_j, n_j)
    t_pal = timeit(transition_counts_pallas, locs_j, n_j)
    print(f"encoder XLA:    {t_xla*1e3:8.3f} ms  ({B*L/t_xla/1e9:.2f} Gpos/s)")
    print(f"encoder pallas: {t_pal*1e3:8.3f} ms  ({B*L/t_pal/1e9:.2f} Gpos/s)"
          f"  speedup x{t_xla/t_pal:.2f}")

    # --- window scan ---
    from palace_tpu.ops.window import good_windows
    from palace_tpu.ops.pallas_kernels import good_windows_pallas

    Lw = 1 << 20
    counts = rng.integers(0, 4, size=(Lw, 3), dtype=np.int32)
    hashes = rng.integers(0, 2, size=(Lw, 3), dtype=np.uint32) * 12345
    cj, hj = jnp.asarray(counts), jnp.asarray(hashes)
    args = dict(window=500, one_min=450, three_min=425)

    ref_w = np.asarray(good_windows(cj, hj, **args))
    pal_w = np.asarray(good_windows_pallas(cj, hj, **args))
    win_ok = np.array_equal(ref_w, pal_w)
    print(f"window parity (L={Lw}): {'OK' if win_ok else 'MISMATCH'}"
          f"  ndiff={np.sum(ref_w != pal_w)}")

    gw_x = jax.jit(lambda c, h: good_windows(c, h, **args))
    gw_p = jax.jit(lambda c, h: good_windows_pallas(c, h, **args))
    t_xw = timeit(gw_x, cj, hj)
    t_pw = timeit(gw_p, cj, hj)
    print(f"window XLA:    {t_xw*1e3:8.3f} ms  ({Lw/t_xw/1e9:.2f} Gpos/s)")
    print(f"window pallas: {t_pw*1e3:8.3f} ms  ({Lw/t_pw/1e9:.2f} Gpos/s)"
          f"  speedup x{t_xw/t_pw:.2f}")

    print(json.dumps({
        "platform": dev.platform,
        "encoder_parity": bool(enc_ok), "window_parity": bool(win_ok),
        "encoder_ms": {"xla": t_xla * 1e3, "pallas": t_pal * 1e3},
        "window_ms": {"xla": t_xw * 1e3, "pallas": t_pw * 1e3},
    }))
    return 0 if (enc_ok and win_ok) else 1


if __name__ == "__main__":
    sys.exit(main())
