"""Saturating k-mer count tables on device.

The reference allocates one 2^32-byte host array and lets pthreads
race on saturating increments ("benign" race, extract_ref.cpp:26,
:995-998 — counts saturate at least_depth=3).  The TPU design keeps
exact saturation semantics with batched scatters:

1. sort the batch's hashes and keep at most ``cap`` occurrences of
   each (dropped/invalid hashes are redirected to slot 0, which the
   reference itself treats as a permanent miss, extract_ref.cpp:861-866),
2. scatter-add ones (now each slot gains ≤ cap per batch, so uint8
   never wraps),
3. scatter-min the touched slots back down to ``cap``.

``ShardedCountTable`` splits the table across every device of a mesh
by hash range (the multi-chip story of BASELINE.json): updates mask
out-of-range hashes per shard, lookups psum partial gathers over the
mesh axes, so a 4 GiB k=32 table becomes 4/N GiB per chip and both
phases ride ICI collectives.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _cap_batch_multiplicity(hashes: jnp.ndarray, valid: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Flatten, drop invalid (→0), and keep ≤cap copies of each hash.

    ``valid`` may be per-hash or per-position (one axis short, e.g.
    (B, M) against (B, M, 3) coder hashes) — it broadcasts up."""
    if valid.ndim == hashes.ndim - 1:
        valid = valid[..., None]
    valid = jnp.broadcast_to(valid, hashes.shape)
    flat = jnp.where(valid.reshape(-1), hashes.reshape(-1), 0)
    s = jnp.sort(flat)
    # drop element i if the previous `cap` sorted entries are all equal to it
    drop = jnp.ones_like(s, dtype=bool)
    for back in range(1, cap + 1):
        prev = jnp.concatenate([jnp.zeros((back,), s.dtype), s[:-back]]) if back <= s.shape[0] else s
        drop = drop & (s == prev) & (jax.lax.broadcasted_iota(jnp.int32, s.shape + (1,), 0)[:, 0] >= back)
    return jnp.where(drop, 0, s)


@functools.partial(jax.jit, static_argnames=("cap",))
def _update_table(table: jnp.ndarray, hashes: jnp.ndarray, valid: jnp.ndarray,
                  cap: int) -> jnp.ndarray:
    capped = _cap_batch_multiplicity(hashes, valid, cap)  # sorted uint32
    table = table.at[capped].add(jnp.uint8(1), mode="drop",
                                 indices_are_sorted=True)
    table = table.at[capped].min(jnp.uint8(cap), mode="drop",
                                 indices_are_sorted=True)
    return table


@jax.jit
def _lookup_table(table: jnp.ndarray, hashes: jnp.ndarray) -> jnp.ndarray:
    return table[hashes]


@dataclass
class CountTable:
    """Single-device saturating counter over 2^k hash slots."""

    table: jnp.ndarray  # (2^k,) uint8
    k: int
    cap: int = 3

    @classmethod
    def create(cls, k: int, cap: int = 3) -> "CountTable":
        return cls(table=jnp.zeros((1 << k,), jnp.uint8), k=k, cap=cap)

    def add_kmers(self, hashes: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> "CountTable":
        if valid is None:
            valid = jnp.ones(hashes.shape, bool)
        return CountTable(_update_table(self.table, hashes, valid, self.cap), self.k, self.cap)

    def lookup(self, hashes: jnp.ndarray) -> jnp.ndarray:
        """Counts per hash; slot 0 always reads 0 (reference miss
        semantics, extract_ref.cpp:861-866)."""
        counts = _lookup_table(self.table, hashes)
        return jnp.where(hashes == 0, jnp.uint8(0), counts)


# ---------------------------------------------------------------------------
# sharded variant
# ---------------------------------------------------------------------------

@dataclass
class ShardedCountTable:
    """Count table range-sharded over all devices of a mesh."""

    table: jnp.ndarray  # (2^k,) uint8, sharded over flattened mesh axes
    k: int
    mesh: Mesh
    cap: int = 3

    @classmethod
    def create(cls, mesh: Mesh, k: int, cap: int = 3) -> "ShardedCountTable":
        axes = tuple(mesh.axis_names)
        sharding = NamedSharding(mesh, P(axes))
        n_dev = int(np.prod(mesh.devices.shape))
        shard_size = -(-(1 << k) // n_dev)  # ceil: pad so any n_dev works
        table = jax.device_put(jnp.zeros((shard_size * n_dev,), jnp.uint8), sharding)
        return cls(table=table, k=k, mesh=mesh, cap=cap)

    def _shard_fns(self):
        axes = tuple(self.mesh.axis_names)
        n_dev = int(np.prod(self.mesh.devices.shape))
        shard_size = -(-(1 << self.k) // n_dev)
        cap = self.cap

        def _local_idx(hashes):
            # device's linear index over the flattened mesh axes
            dev = jnp.zeros((), jnp.uint32)
            for ax in axes:
                dev = dev * jnp.uint32(jax.lax.axis_size(ax)) + jax.lax.axis_index(
                    ax
                ).astype(jnp.uint32)
            lo = dev * jnp.uint32(shard_size)
            # all arithmetic in uint32: hashes < 2^32, lo ≤ (n_dev-1)·shard
            local = hashes - lo
            in_range = (hashes >= lo) & (local < jnp.uint32(shard_size))
            idx = jnp.where(in_range, local, jnp.uint32(0))
            return idx, in_range

        def update_shard(table_shard, hashes):
            idx, in_range = _local_idx(hashes)
            inc = jnp.where(in_range, 1, 0).astype(jnp.uint8)
            table_shard = table_shard.at[idx].add(inc)
            table_shard = table_shard.at[idx].min(jnp.uint8(cap))
            return table_shard

        def lookup_shard(table_shard, hashes):
            idx, in_range = _local_idx(hashes)
            part = jnp.where(in_range, table_shard[idx], 0).astype(jnp.int32)
            return jax.lax.psum(part, axes)

        return update_shard, lookup_shard, axes

    def add_kmers(self, hashes: jnp.ndarray,
                  valid: Optional[jnp.ndarray] = None) -> "ShardedCountTable":
        if valid is None:
            valid = jnp.ones(hashes.shape, bool)
        capped = _cap_batch_multiplicity(jnp.asarray(hashes, jnp.uint32), valid, self.cap)
        update_shard, _, axes = self._shard_fns()
        spec_table = P(axes)
        f = jax.jit(
            jax.shard_map(
                update_shard, mesh=self.mesh,
                in_specs=(spec_table, P()), out_specs=spec_table,
            )
        )
        new_table = f(self.table, capped)
        return ShardedCountTable(new_table, self.k, self.mesh, self.cap)

    def lookup(self, hashes: jnp.ndarray) -> jnp.ndarray:
        _, lookup_shard, axes = self._shard_fns()
        shape = hashes.shape
        flat = jnp.asarray(hashes, jnp.uint32).reshape(-1)
        f = jax.jit(
            jax.shard_map(
                lookup_shard, mesh=self.mesh,
                in_specs=(P(axes), P()), out_specs=P(),
            )
        )
        counts = f(self.table, flat)
        counts = jnp.where(flat == 0, 0, counts)
        return counts.reshape(shape).astype(jnp.uint8)
