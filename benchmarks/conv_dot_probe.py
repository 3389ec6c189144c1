"""Bare-dot probe at the conv head's ACTUAL dot shapes (VERDICT r5 item 3).

The r4 analysis attributed the conv stack's ~40 TF/s (vs 110 TF/s on
square bf16 matmuls on this chip) to its M=64/N=64 dot shapes.  This
probe extends that evidence chain from the 4096³ control to the exact
shapes the head executes, plus the candidate restructurings:

  ctl_4096   : (4096,4096)x(4096,4096)              — square control
  tapdot     : batch-B (L,128)x(128,64)              — conv1 as one tap dot
  tapdot64   : batch-B (L,64)x(64,64)                — conv2/3 tap dot
  im2col512  : (B*L, 1024)x(1024, 64)                — judge-suggested shape
  im2col_n128: (B*L/2, 1152)x(1152, 128)             — paired-output N=128
  wstat      : (64, 1024)x(1024, B*L)                — weight-stationary M=64

Timing rules per verify-skill: salted inputs, interleaved rounds,
median-of-N, completion forced with a real np.asarray fetch of a tiny
slice (block_until_ready ACKS WITHOUT WAITING through the axon relay).

Prints one JSON line; writes benchmarks/conv_dot_probe.json.
"""
from __future__ import annotations

import json
import statistics
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

B = 128           # im2col operands scale with B·L — 128 keeps the
                  # largest case ~1 GB and the compile set tractable
L = 4082          # conv1 output length at k=8 over 4089 in
ROUNDS = 5
DTYPE = jnp.bfloat16


def flops(m, n, k, batch=1):
    return 2.0 * m * n * k * batch


CASES = {}


def case(name, f, nflops):
    CASES[name] = (jax.jit(f), nflops)


def build():
    key = jax.random.PRNGKey(0)

    def rnd(*shape):
        nonlocal key
        key, sub = jax.random.split(key)
        return jax.random.normal(sub, shape, DTYPE)

    # control: square
    a, b = rnd(4096, 4096), rnd(4096, 4096)
    case("ctl_4096", lambda s, a=a, b=b: ((a + s) @ b), flops(4096, 4096, 4096))

    # conv1 single-tap shape, batched over B
    x = rnd(B, L, 128)
    w = rnd(128, 64)
    case("tapdot", lambda s, x=x, w=w: jnp.einsum("blk,kn->bln", x + s, w),
         flops(L, 64, 128, B))

    # conv2/3 single-tap shape
    x2 = rnd(B, L, 64)
    w2 = rnd(64, 64)
    case("tapdot64", lambda s, x2=x2, w2=w2: jnp.einsum("blk,kn->bln", x2 + s, w2),
         flops(L, 64, 64, B))

    # judge-suggested im2col shapes: (B*L, C*K)x(C*K, 64)
    xi = rnd(B * L, 1024)
    wi = rnd(1024, 64)
    case("im2col1024", lambda s, xi=xi, wi=wi: (xi + s) @ wi,
         flops(B * L, 64, 1024))
    xj = rnd(B * L, 512)          # conv2/3 class: (B·4075, 512)x(512, 64)
    wj = rnd(512, 64)
    case("im2col512", lambda s, xj=xj, wj=wj: (xj + s) @ wj,
         flops(B * L, 64, 512))

    # paired-output-position variant: N=128 lanes, K=9 taps
    xp = rnd(B * L // 2, 1152)
    wp = rnd(1152, 128)
    case("im2col_n128", lambda s, xp=xp, wp=wp: (xp + s) @ wp,
         flops(B * L // 2, 128, 1152))

    # weight-stationary transposed: M=64, huge N
    xw = rnd(1024, B * L // 4)   # /4 keeps the operand under 512 MB
    ww = rnd(64, 1024)
    case("wstat", lambda s, xw=xw, ww=ww: ww @ (xw + s),
         flops(64, B * L // 4, 1024))

    # the production conv1 via lax.conv for reference
    xc = rnd(B, 128, 4089)
    wc = rnd(64, 128, 8)
    case("conv1_xla",
         lambda s, xc=xc, wc=wc: jax.lax.conv_general_dilated(
             xc + s, wc, (1,), "VALID", dimension_numbers=("NCH", "OIH", "NCH")),
         flops(L, 64, 128 * 8, B))


def fetch(y):
    return float(np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[:1]))


def main():
    build()
    # compile + first-touch
    for name, (f, _) in CASES.items():
        fetch(f(jnp.asarray(0.0, DTYPE)))
    results = {name: [] for name in CASES}
    for r in range(ROUNDS):
        for name, (f, nf) in CASES.items():   # interleaved
            s = jnp.asarray(0.001 * (r + 1), DTYPE)  # salt
            t0 = time.perf_counter()
            y = f(s)
            fetch(y)
            dt = time.perf_counter() - t0
            results[name].append(nf / dt / 1e12)
    out = {}
    for name, (f, nf) in CASES.items():
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
