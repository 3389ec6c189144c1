"""Saturating k-mer count tables on device.

The reference allocates one 2^32-byte host array and lets pthreads
race on saturating increments ("benign" race, extract_ref.cpp:26,
:995-998 — counts saturate at least_depth=3).  The TPU design keeps
exact saturation semantics with batch-sorted updates: sort the batch's
hashes (invalid → slot 0, the reference's permanent-miss slot,
extract_ref.cpp:861-866), derive each value's multiplicity from its
sorted run, then either

* ``set``: one gather + one scatter-set of ``min(old+mult, cap)`` —
  every run member writes the identical value, so the scatter needs no
  duplicate combine (fast path on TPU), or
* ``addmin``: scatter-add the (≤cap-clipped) multiplicity at each run's
  last occurrence, then scatter-min back to ``cap`` (fast path on CPU).

``ShardedCountTable`` splits the table across every device of a mesh
by hash range (the multi-chip story of BASELINE.json): updates mask
out-of-range hashes per shard, lookups psum partial gathers over the
mesh axes, so a 4 GiB k=32 table becomes 4/N GiB per chip and both
phases ride ICI collectives.
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from palace_tpu.ops.kmer import kmer_hashes_traced, perm_to_key, unpack_codes_mask


def _sorted_run_lengths(
    hashes: jnp.ndarray, valid: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sort the batch and compute per-value multiplicities.

    ``valid`` may be per-hash or per-position (one axis short, e.g.
    (B, M) against (B, M, 3) coder hashes) — it broadcasts up.
    Invalid hashes map to 0 (the reference's permanent-miss slot,
    extract_ref.cpp:861-866).

    Returns ``(s, total)``: the sorted flat hashes and, at every
    position, the TOTAL multiplicity of that position's value in the
    batch (identical across all members of a run).
    """
    if valid.ndim == hashes.ndim - 1:
        valid = valid[..., None]
    valid = jnp.broadcast_to(valid, hashes.shape)
    flat = jnp.where(valid.reshape(-1), hashes.reshape(-1), 0)
    s = jnp.sort(flat)
    n = s.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    prev = jnp.concatenate([s[:1], s[:-1]])
    is_new = (pos == 0) | (s != prev)
    nxt = jnp.concatenate([s[1:], s[-1:]])
    is_last = (pos == n - 1) | (s != nxt)
    first_pos = jax.lax.cummax(jnp.where(is_new, pos, -1))
    last_pos = jnp.flip(jax.lax.cummin(jnp.flip(jnp.where(is_last, pos, n))))
    total = last_pos - first_pos + 1
    return s, total


def _update_set_traced(table: jnp.ndarray, hashes: jnp.ndarray,
                       valid: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Exact saturating update as ONE gather + ONE scatter-set.

    Every member of a sorted run writes the identical value
    ``min(old + run_multiplicity, cap)`` to its own slot — duplicate
    scatter-sets of equal values are order-independent, so no
    duplicate-handling combine (the slow part of scatter-add on TPU)
    is needed, and the sorted-indices hint holds."""
    s, total = _sorted_run_lengths(hashes, valid)
    old = table[s]
    newv = jnp.minimum(
        old.astype(jnp.int32) + total, jnp.int32(cap)
    ).astype(jnp.uint8)
    return table.at[s].set(newv, mode="drop", indices_are_sorted=True)


_update_table_set = jax.jit(_update_set_traced, static_argnames=("cap",))


@functools.partial(jax.jit, static_argnames=("cap", "perm_key", "k"),
                   donate_argnums=(0,))
def _update_table_packed(table: jnp.ndarray, packed: jnp.ndarray,
                         mask: jnp.ndarray, cap: int,
                         perm_key, k: int) -> jnp.ndarray:
    """Fused Phase-A batch update: 2-bit-packed codes + invalid bitmask
    → unpack → 3-coder hashes → saturating table update, all in ONE
    dispatch with the table buffer donated (no second 2^bits copy in
    HBM, no extra relay round-trips)."""
    codes = unpack_codes_mask(packed, mask)
    hashes, valid = kmer_hashes_traced(codes, perm_key, k)
    return _update_set_traced(table, hashes, valid, cap)


@functools.partial(jax.jit, static_argnames=("cap",))
def _update_table_addmin(table: jnp.ndarray, hashes: jnp.ndarray,
                         valid: jnp.ndarray, cap: int) -> jnp.ndarray:
    """add-then-min variant: each position adds min(run_prefix≤cap)…
    kept because CPU XLA runs the two cheap scatters faster than the
    gather+set pair; per-batch adds are bounded by ``total ≤ batch`` so
    we clip to cap before adding to keep uint8 safe."""
    s, total = _sorted_run_lengths(hashes, valid)
    n = s.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    nxt = jnp.concatenate([s[1:], s[-1:]])
    is_last = (pos == n - 1) | (s != nxt)
    inc = jnp.where(is_last, jnp.minimum(total, cap), 0).astype(jnp.uint8)
    table = table.at[s].add(inc, mode="drop", indices_are_sorted=True)
    table = table.at[s].min(jnp.uint8(cap), mode="drop",
                            indices_are_sorted=True)
    return table


def _update_table(table: jnp.ndarray, hashes: jnp.ndarray, valid: jnp.ndarray,
                  cap: int) -> jnp.ndarray:
    impl = os.environ.get("PALACE_TABLE_IMPL")
    if impl == "set":
        return _update_table_set(table, hashes, valid, cap)
    if impl == "addmin":
        return _update_table_addmin(table, hashes, valid, cap)
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    fn = _update_table_set if on_tpu else _update_table_addmin
    return fn(table, hashes, valid, cap)


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

    def add_packed(self, packed: np.ndarray, mask: np.ndarray,
                   perm: np.ndarray, kmer_k: int) -> "CountTable":
        """Fused single-dispatch update from wire-packed codes (see
        kmer.pack_codes_mask).  DONATES the current table buffer — the
        receiver object must not be used after this call."""
        new = _update_table_packed(
            self.table, jnp.asarray(packed), jnp.asarray(mask),
            self.cap, perm_to_key(perm), kmer_k,
        )
        return CountTable(new, self.k, self.cap)

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
        n_dev = int(np.prod(self.mesh.devices.shape))
        return _make_shard_fns(
            tuple(self.mesh.axis_names), n_dev,
            -(-(1 << self.k) // n_dev), self.cap,
        )

    def add_kmers(self, hashes: jnp.ndarray,
                  valid: Optional[jnp.ndarray] = None) -> "ShardedCountTable":
        if valid is None:
            valid = jnp.ones(hashes.shape, bool)
        s, total = _sorted_run_lengths(jnp.asarray(hashes, jnp.uint32), valid)
        update_shard, _, axes = self._shard_fns()
        spec_table = P(axes)
        f = jax.jit(
            jax.shard_map(
                update_shard, mesh=self.mesh,
                in_specs=(spec_table, P(), P()), out_specs=spec_table,
            )
        )
        new_table = f(self.table, s, total)
        return ShardedCountTable(new_table, self.k, self.mesh, self.cap)

    def add_packed(self, packed: np.ndarray, mask: np.ndarray,
                   perm: np.ndarray, kmer_k: int) -> "ShardedCountTable":
        """Fused sharded update: the replicated unpack→hash→sort and the
        per-shard masked scatter run in ONE jit; the table shards are
        donated."""
        f = _sharded_update_packed(
            self.mesh, self.k, self.cap, perm_to_key(perm), kmer_k)
        new_table = f(self.table, jnp.asarray(packed), jnp.asarray(mask))
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


@functools.lru_cache(maxsize=32)
def _make_shard_fns(axes, n_dev: int, shard_size: int, cap: int):
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

    def update_shard(table_shard, s, total):
        # s is globally sorted with per-value totals (computed once,
        # replicated); each shard rewrites only its hash range.
        # Out-of-range entries target index shard_size (OOB → drop);
        # duplicates within a run write identical values, so the
        # scatter-set needs no combine.
        idx, in_range = _local_idx(s)
        old = table_shard[jnp.where(in_range, idx, 0)]
        newv = jnp.minimum(
            old.astype(jnp.int32) + total, jnp.int32(cap)
        ).astype(jnp.uint8)
        idx_s = jnp.where(in_range, idx, jnp.uint32(shard_size))
        return table_shard.at[idx_s].set(newv, mode="drop")

    def lookup_shard(table_shard, hashes):
        idx, in_range = _local_idx(hashes)
        part = jnp.where(in_range, table_shard[idx], 0).astype(jnp.int32)
        return jax.lax.psum(part, axes)

    return update_shard, lookup_shard, axes


@functools.lru_cache(maxsize=16)
def _sharded_update_packed(mesh: Mesh, table_bits: int, cap: int,
                           perm_key, kmer_k: int):
    """One cached jit per (mesh, table, coder) config: replicated
    unpack→hash→sort feeding the per-shard masked scatter, table
    shards donated."""
    axes = tuple(mesh.axis_names)
    n_dev = int(np.prod(mesh.devices.shape))
    update_shard, _, _ = _make_shard_fns(axes, n_dev,
                                         -(-(1 << table_bits) // n_dev), cap)
    spec_table = P(axes)
    shard_update = jax.shard_map(
        update_shard, mesh=mesh,
        in_specs=(spec_table, P(), P()), out_specs=spec_table,
    )

    def f(table, packed, mask):
        codes = unpack_codes_mask(packed, mask)
        hashes, valid = kmer_hashes_traced(codes, perm_key, kmer_k)
        s, total = _sorted_run_lengths(hashes, valid)
        return shard_update(table, s, total)

    return jax.jit(f, donate_argnums=(0,))
