"""Scorer + train-step 1→N scaling on the virtual CPU mesh, plus a
collective-vs-compute decomposition of the count-table n8 point
(VERDICT r5 item 6).

Same methodology as benchmarks/scaling.py (interleaved medians,
p25/p75, shared-core caveat): on an N-virtual-device CPU mesh total
compute is constant, so ideal relative throughput is ~1.0 and any
deficit is partition/collective overhead — the quantity a reader needs
to project to real ICI, where the collectives ride ~100 GB/s links
instead of host memcpy.

Paths measured:
  scorer_dp      : eval forward, batch sharded over "data", n 1/2/4/8
  scorer_dpxtp   : eval forward, dp×tp (model axis 2), n 4/8
  train_dp       : jitted train_step (fwd+bwd+adam), dp, n 1/2/4/8
  train_dpxtp    : train_step dp×tp, n 4/8
  table_n8_split : sharded add_kmers vs an all_gather-only program of
                   the SAME payload shapes — collective share of the
                   n8 count-table step

Usage: python benchmarks/scaling_scorer.py   (forces the CPU mesh)
Writes benchmarks/scaling_scorer_cpu8.json; prints one JSON object.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

from palace_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

BATCH = 64          # per-measurement global batch (constant across N)
SAMPLES = int(os.environ.get("SCALING_SAMPLES", "6"))


def _med_stats(ts, work_items):
    ts = np.asarray(sorted(ts))
    med = float(np.median(ts))
    return {
        "items_per_s_median": round(work_items / med, 2),
        "items_per_s_p25": round(work_items / float(np.percentile(ts, 75)), 2),
        "items_per_s_p75": round(work_items / float(np.percentile(ts, 25)), 2),
        "samples": len(ts),
    }


def main():
    from palace_tpu.models.gcn import DEFAULT_CONFIG, init_params, forward
    from palace_tpu.models.train import init_train_state, train_step
    from palace_tpu.ops.count_table import ShardedCountTable
    from palace_tpu.parallel.mesh import (
        data_sharding,
        make_mesh,
        replicate,
        shard_params_for_gcn,
    )

    cfg = DEFAULT_CONFIG
    rng = np.random.default_rng(0)
    params_f32 = init_params(jax.random.PRNGKey(0), cfg)
    x_p_np = rng.standard_normal((BATCH, cfg.pnode_num, cfg.hidden_dim)).astype(np.float32)
    x_f_np = rng.standard_normal((BATCH, cfg.fnode_num, 1)).astype(np.float32)
    labels_np = rng.integers(0, 2, BATCH).astype(np.int32)

    variants = {}  # name -> (callable, mesh)

    def add_scorer(name, n, mp):
        mesh = make_mesh(n, model_parallel=mp)
        p = shard_params_for_gcn(params_f32, mesh) if mp > 1 else \
            jax.device_put(params_f32, replicate(mesh))
        xp = jax.device_put(jnp.asarray(x_p_np), data_sharding(mesh, 3))
        xf = jax.device_put(jnp.asarray(x_f_np), data_sharding(mesh, 3))
        f = jax.jit(lambda pp, a, b: forward(pp, a, b, cfg))

        def step(f=f, p=p, xp=xp, xf=xf):
            return f(p, xp, xf)

        variants[name] = step

    def add_train(name, n, mp):
        mesh = make_mesh(n, model_parallel=mp)
        p = shard_params_for_gcn(params_f32, mesh) if mp > 1 else \
            jax.device_put(params_f32, replicate(mesh))
        state = init_train_state(p)
        xp = jax.device_put(jnp.asarray(x_p_np), data_sharding(mesh, 3))
        xf = jax.device_put(jnp.asarray(x_f_np), data_sharding(mesh, 3))
        lb = jax.device_put(jnp.asarray(labels_np), data_sharding(mesh, 1))
        stepped = {"s": state}
        key = jax.random.PRNGKey(1)
        jstep = jax.jit(lambda s, a, b, l, k: train_step(s, a, b, l, k, cfg))

        def step(stepped=stepped, xp=xp, xf=xf, lb=lb, key=key, jstep=jstep):
            s2, loss = jstep(stepped["s"], xp, xf, lb, key)
            stepped["s"] = s2
            return loss

        variants[name] = step

    ns = [1, 2, 4, 8]
    for n in ns:
        add_scorer(f"scorer_dp_n{n}", n, 1)
        add_train(f"train_dp_n{n}", n, 1)
    for n in (4, 8):
        add_scorer(f"scorer_dpxtp_n{n}", n, 2)
        add_train(f"train_dpxtp_n{n}", n, 2)

    # count-table n8 decomposition
    mesh8 = make_mesh(8, model_parallel=1)
    k = 24
    hashes = jnp.asarray(rng.integers(0, 1 << k, (1 << 20,), dtype=np.uint32))
    table8 = ShardedCountTable.create(mesh8, k)

    def table_step(table8=table8, hashes=hashes):
        return table8.add_kmers(hashes).table

    variants["table_n8"] = table_step

    # all_gather-only program with the batch-sharded update's payload
    # shapes: per shard (n/8,) uint32 values + (n/8,) uint8 increments
    from jax.experimental.shard_map import shard_map

    n_flat = hashes.shape[0]
    s_loc = jax.device_put(
        hashes, NamedSharding(mesh8, P("data")))
    inc_loc = jax.device_put(
        jnp.ones((n_flat,), jnp.uint8), NamedSharding(mesh8, P("data")))

    @jax.jit
    def gather_only(s=s_loc, inc=inc_loc):
        def f(sv, iv):
            sa = jax.lax.all_gather(sv, ("data", "model"))
            ia = jax.lax.all_gather(iv, ("data", "model"))
            dev = (jax.lax.axis_index("data") * jax.lax.axis_size("model")
                   + jax.lax.axis_index("model")).astype(jnp.uint32)
            tot = sa.sum(dtype=jnp.uint32) + ia.sum(dtype=jnp.uint32) + dev
            return tot.reshape(1)

        return shard_map(
            f, mesh=mesh8, in_specs=(P("data"), P("data")),
            out_specs=P(("data", "model")))(s, inc)

    variants["table_n8_gather_only"] = lambda: gather_only()

    # warm/compile every variant, then interleave samples
    for name, step in variants.items():
        t0 = time.perf_counter()
        jax.block_until_ready(step())
        print(f"compiled {name} in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
    times = {name: [] for name in variants}
    for _ in range(SAMPLES):
        for name, step in variants.items():
            t0 = time.perf_counter()
            jax.block_until_ready(step())
            times[name].append(time.perf_counter() - t0)

    out = {}
    for name, ts in times.items():
        items = BATCH if name.startswith(("scorer", "train")) else n_flat
        st = _med_stats(ts, items)
        st["wall_ms_median"] = round(float(np.median(ts)) * 1e3, 2)
        out[name] = st
    for fam in ("scorer_dp", "train_dp"):
        base = out[f"{fam}_n1"]["items_per_s_median"]
        for n in ns:
            out[f"{fam}_n{n}"]["relative_vs_n1"] = round(
                out[f"{fam}_n{n}"]["items_per_s_median"] / base, 3)
    tbl = out["table_n8"]["wall_ms_median"]
    gat = out["table_n8_gather_only"]["wall_ms_median"]
    decomp = {
        "full_ms": tbl,
        "all_gather_only_ms": gat,
        "collective_share_pct": round(100.0 * gat / tbl, 1),
        "note": ("the gather-only program moves the identical payload "
                 "over the mesh; on real ICI (~100+ GB/s/link) this "
                 "share shrinks by the ratio of ICI to host-memcpy "
                 "bandwidth — the compute remainder is what real chips "
                 "would keep"),
    }
    payload = {
        "devices": len(jax.devices()),
        "batch": BATCH,
        "samples_per_point": SAMPLES,
        "note": ("shared-core virtual mesh: constant total compute — "
                 "relative ~1.0 means sharding overhead ~0; see "
                 "benchmarks/scaling.py for the methodology"),
        "scaling": out,
        "table_n8_decomposition": decomp,
        "recorded_unix": int(time.time()),
    }
    Path(__file__).parent.joinpath("scaling_scorer_cpu8.json").write_text(
        json.dumps(payload, indent=1) + "\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
