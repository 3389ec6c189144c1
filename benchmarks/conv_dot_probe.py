"""Bare-dot probe at the conv head's ACTUAL dot shapes (VERDICT r5 item 3).

The r4 analysis attributed the conv stack's ~40 TF/s (vs 110 TF/s on
square bf16 matmuls on this chip) to its M=64/N=64 dot shapes.  This
probe extends that evidence chain from the 4096³ control to the exact
shapes the head executes, plus the candidate restructurings:

  ctl_4096   : (4096,4096)x(4096,4096)              — square control
  tapdot     : batch-B (L,128)x(128,64)              — conv1 as one tap dot
  tapdot64   : batch-B (L,64)x(64,64)                — conv2/3 tap dot
  im2col1024 : (B*L, 1024)x(1024, 64)                — conv1 im2col
  im2col512  : (B*L, 512)x(512, 64)                  — conv2/3 im2col (judge shape)
  im2col_n128: (B*L/2, 1152)x(1152, 128)             — paired-output N=128
  wstat      : (64, 1024)x(1024, B*L/4)              — weight-stationary M=64
  conv1_xla  : production lax.conv reference

Timing rules per verify-skill: salted inputs, interleaved rounds,
median-of-N, completion forced with a real np.asarray fetch of a tiny
slice (block_until_ready ACKS WITHOUT WAITING through the axon relay).

Relay gotchas this probe hit and codes around: (a) device-side
jax.random compiles one sampler program per shape (~minutes each
through the relay) → operands are generated on HOST and device_put;
(b) operands captured in closures become jit CONSTANTS — a 1 GB
constant is serialised into the HLO shipped to the relay compiler
(>15 min observed) → every operand is an explicit jit ARGUMENT.

Prints one JSON line; writes benchmarks/conv_dot_probe.json.
"""
from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from palace_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

B = 128           # im2col operands scale with B·L — 128 keeps the
                  # largest case ~0.5 GB and the compile set tractable
L = 4082          # conv1 output length at k=8 over 4089 in
ROUNDS = 3
K_CHAIN = 32      # dependent iterations per dispatch: one relay RTT is
                  # ~29 ms — an un-chained 4096³ matmul (3.8 ms compute)
                  # measures 4.3 TF/s instead of its true ~36 (observed
                  # in this probe's first run); chaining makes the RTT
                  # <3 % of each sample
DTYPE = jnp.bfloat16


def flops(m, n, k, batch=1):
    return 2.0 * m * n * k * batch


CASES = {}  # name -> (jitted fn taking (salt, *ops), ops tuple, nflops)


def case(name, f, ops, nflops):
    def chained(s, *ops):
        def body(carry, _):
            y = f(carry, *ops)
            leaf = jax.tree_util.tree_leaves(y)[0]
            # scalar feedback serialises the iterations (no overlap/DCE)
            return (carry + leaf.ravel()[0].astype(DTYPE)
                    * jnp.asarray(1e-12, DTYPE)), ()
        out, _ = jax.lax.scan(body, s, None, length=K_CHAIN)
        return out

    CASES[name] = (jax.jit(chained), ops, nflops * K_CHAIN)


def build():
    import ml_dtypes

    nprng = np.random.default_rng(0)

    def rnd(*shape):
        a = nprng.standard_normal(shape, dtype=np.float32)
        return jax.device_put(a.astype(ml_dtypes.bfloat16))

    a, b = rnd(4096, 4096), rnd(4096, 4096)
    case("ctl_4096", lambda s, a, b: (a + s) @ b, (a, b),
         flops(4096, 4096, 4096))

    x = rnd(B, L, 128)
    w = rnd(128, 64)
    case("tapdot", lambda s, x, w: jnp.einsum("blk,kn->bln", x + s, w),
         (x, w), flops(L, 64, 128, B))

    x2 = rnd(B, L, 64)
    w2 = rnd(64, 64)
    case("tapdot64", lambda s, x2, w2: jnp.einsum("blk,kn->bln", x2 + s, w2),
         (x2, w2), flops(L, 64, 64, B))

    xi = rnd(B * L, 1024)
    wi = rnd(1024, 64)
    case("im2col1024", lambda s, xi, wi: (xi + s) @ wi, (xi, wi),
         flops(B * L, 64, 1024))
    xj = rnd(B * L, 512)
    wj = rnd(512, 64)
    case("im2col512", lambda s, xj, wj: (xj + s) @ wj, (xj, wj),
         flops(B * L, 64, 512))

    xp = rnd(B * L // 2, 1152)
    wp = rnd(1152, 128)
    case("im2col_n128", lambda s, xp, wp: (xp + s) @ wp, (xp, wp),
         flops(B * L // 2, 128, 1152))

    xw = rnd(1024, B * L // 4)
    ww = rnd(64, 1024)
    case("wstat", lambda s, xw, ww: ww @ (xw + s), (xw, ww),
         flops(64, B * L // 4, 1024))

    xc = rnd(B, 128, 4089)
    wc = rnd(64, 128, 8)
    case("conv1_xla",
         lambda s, xc, wc: jax.lax.conv_general_dilated(
             xc + s, wc, (1,), "VALID",
             dimension_numbers=("NCH", "OIH", "NCH")),
         (xc, wc), flops(L, 64, 128 * 8, B))


def fetch(y):
    return float(np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[:1]))


def main():
    build()
    for name, (f, ops, _) in CASES.items():
        t0 = time.perf_counter()
        fetch(f(jnp.asarray(0.0, DTYPE), *ops))
        print(f"compiled {name} in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
    results = {name: [] for name in CASES}
    for r in range(ROUNDS):
        for name, (f, ops, nf) in CASES.items():   # interleaved
            s = jnp.asarray(0.001 * (r + 1), DTYPE)  # salt
            t0 = time.perf_counter()
            y = f(s, *ops)
            fetch(y)
            dt = time.perf_counter() - t0
            results[name].append(nf / dt / 1e12)
    out = {}
    for name, (f, ops, nf) in CASES.items():
        med = statistics.median(results[name])
        out[name] = {
            "tf_per_s": round(med, 2),
            "rounds_tf": [round(v, 2) for v in results[name]],
            "gflops": round(nf / 1e9, 1),
        }
    payload = {"dtype": "bf16", "B": B, "L": L, "results": out,
               "ts": int(time.time())}
    Path(__file__).with_suffix(".json").write_text(json.dumps(payload, indent=1) + "\n")
    print(json.dumps({k: v["tf_per_s"] for k, v in out.items()}))


if __name__ == "__main__":
    main()
