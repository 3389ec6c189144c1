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
  duplicate combine (the slow part of scatter-add on TPU), or
* ``addmin``: scatter-add the (≤cap-clipped) multiplicity at each run's
  last occurrence, then scatter-min back to ``cap`` (fast path on CPU), or
* ``nibble`` (TPU, k > 30): 8 × 4-bit fields per uint32 word with
  gather-FREE scatter-adds of clipped multiplicities and a deferred
  clamp — exact because ``min(Σ min(m_t, cap), cap) == min(Σ m_t, cap)``
  (see ``_update_packed_words_traced``).

**Layout: the 2^k hash space is a 2-D array** ``(2^(k-16), 2^16)``;
hash h lives at ``(h >> 16, h & 0xFFFF)``.  A flat 2^32 table is
silently broken on the TPU backend — any dimension ≥ 2^31 overflows
the int32 index arithmetic XLA:TPU lowers gather/scatter with, so
every access drops/fills 0 (verified empirically on v5e: scatter+
gather round-trips 0 for ALL indices once the dimension hits 2^31).
Both split coordinates also stay well inside int32, so uint32 hashes
never truncate.

``ShardedCountTable`` splits the table's row axis across every device
of a mesh (the multi-chip story of BASELINE.json): updates mask
out-of-row-range hashes per shard, lookups psum partial gathers over
the mesh axes, so a 4 GiB k=32 table becomes 4/N GiB per chip and both
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

#: low bits of the hash addressing within a row (row width 2^16)
ROW_BITS = 16


def table_shape(k: int) -> Tuple[int, int]:
    """(rows, row_width) of the 2-D table for a 2^k hash space."""
    row = min(k, ROW_BITS)
    return (1 << (k - row), 1 << row)


def split_hash(hashes: jnp.ndarray, row_width: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """uint32 hashes → (row int32, col int32) coordinates; ``row_width``
    must be the table's (static) second dimension."""
    row_bits = row_width.bit_length() - 1
    h = hashes.astype(jnp.uint32)
    hi = jax.lax.shift_right_logical(h, jnp.uint32(row_bits)).astype(jnp.int32)
    lo = (h & jnp.uint32(row_width - 1)).astype(jnp.int32)
    return hi, lo


def lookup_traced(table: jnp.ndarray, hashes: jnp.ndarray) -> jnp.ndarray:
    """Traceable gather: counts for arbitrary-shape uint32 hashes
    against the 2-D table (hash 0 NOT masked here — callers apply the
    reference's slot-0 permanent-miss rule).  Dispatches statically on
    dtype: uint8 → byte table, uint32 → nibble-packed table (8 × 4-bit
    fields per word, see ``_update_packed_words_traced``)."""
    flat = hashes.reshape(-1)
    if table.dtype == jnp.uint32:
        h = flat.astype(jnp.uint32)
        row = jax.lax.shift_right_logical(h, jnp.uint32(16)).astype(jnp.int32)
        colw = ((h & jnp.uint32(0xFFFF)) >> jnp.uint32(3)).astype(jnp.int32)
        shift = jnp.uint32(4) * (h & jnp.uint32(7))
        words = table[row, colw]
        # nibble fields accumulate clipped per-batch increments and may
        # hold a ≤15 residue between clamps; the saturated count is
        # min(field, 3) — exact: min(Σ min(m_t,3), 3) == min(Σ m_t, 3)
        field = jax.lax.shift_right_logical(words, shift) & jnp.uint32(15)
        return jnp.minimum(field, jnp.uint32(3)).astype(
            jnp.uint8).reshape(hashes.shape)
    hi, lo = split_hash(flat, table.shape[1])
    return table[hi, lo].reshape(hashes.shape)


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
    hi, lo = split_hash(s, table.shape[1])
    old = table[hi, lo]
    newv = jnp.minimum(
        old.astype(jnp.int32) + total, jnp.int32(cap)
    ).astype(jnp.uint8)
    # flat-sorted s ⇒ (hi, lo) lexicographically sorted
    return table.at[hi, lo].set(newv, mode="drop", indices_are_sorted=True)


_update_table_set = jax.jit(_update_set_traced, static_argnames=("cap",))


def _update_packed_words_traced(table: jnp.ndarray, hashes: jnp.ndarray,
                                valid: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Exact saturating update of a NIBBLE-PACKED table: 8 × 4-bit
    fields per uint32, table shape (rows, 2^13) = 2^29 elements, 2 GiB.

    Why packed at all: XLA:TPU falls off its 32-bit-index scatter path
    once a scatter operand reaches 2^31 elements — packing keeps the
    2^32-slot space inside the fast regime.

    Why 4-bit fields and NO gather (round 4): each distinct value adds
    its CLIPPED multiplicity ``min(total, cap) << shift`` (at its run's
    last position; duplicates add 0) with one scatter-ADD and never
    reads the old word.  Saturation algebra makes the deferred form
    exact: ``min(Σ_t min(m_t, 3), 3) == min(Σ_t m_t, 3)`` — lookups
    clamp the field to 3, and a cheap element-wise clamp pass every
    ``CLAMP_EVERY`` batches (see ``_clamp_nibbles``) keeps the ≤15
    residue from ever carrying into a neighbour field.  Removing the
    old-word gather (176 ms per 12.6 M-hash batch, HBM-latency-bound)
    and the r3 word-merge segment machinery (~400 ms of cumsums +
    prefix gathers) cut the per-batch update 770 → ~230 ms on v5e.

    Cross-field safety within one batch: distinct values in a word own
    disjoint nibbles and each gets ≤ one ≤3 increment — no carries.
    Requires ``cap == 3`` (enforced by _use_packed_words).
    """
    assert cap <= 3, "nibble table lookups clamp at 3 (cap <= 3)"
    s, total = _sorted_run_lengths(hashes, valid)
    n = s.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    row = jax.lax.shift_right_logical(s, jnp.uint32(16)).astype(jnp.int32)
    colw = ((s & jnp.uint32(0xFFFF)) >> jnp.uint32(3)).astype(jnp.int32)
    shift = jnp.uint32(4) * (s & jnp.uint32(7))

    # one clipped increment per distinct VALUE (at its run's last
    # position); duplicates scatter-add zero
    nxt_s = jnp.concatenate([s[1:], s[-1:]])
    v_last = (pos == n - 1) | (s != nxt_s)
    inc = jnp.where(v_last, jnp.minimum(total, cap), 0).astype(jnp.uint32)
    inc = jax.lax.shift_left(inc, shift)

    # slot 0 (the reference's permanent-miss slot) lives in word 0
    # field 0 and is never read back — writing it is harmless (and its
    # residue is bounded by the clamp cadence like every other field)
    return table.at[row, colw].add(inc, mode="drop",
                                   indices_are_sorted=True)


#: clamp the nibble residue every N adds: per add a field grows ≤ 3,
#: so after CLAMP_EVERY=4 unclamped adds it is ≤ 3 + 4·3 = 15 — the
#: 4-bit maximum; one more add could carry, so the table is clamped
#: back to ≤3 first
NIBBLE_CLAMP_EVERY = 4


@functools.partial(jax.jit, donate_argnums=(0,))
def _clamp_nibbles(table: jnp.ndarray) -> jnp.ndarray:
    """Element-wise: every 4-bit field → min(field, 3).  A field
    exceeds 3 iff bit2|bit3 of its nibble is set."""
    gt3 = (jax.lax.shift_right_logical(table, jnp.uint32(2))
           | jax.lax.shift_right_logical(table, jnp.uint32(3))) \
        & jnp.uint32(0x11111111)
    full = gt3 * jnp.uint32(15)
    return (table & ~full) | (gt3 * jnp.uint32(3))


# no donation: add_kmers documents VALUE semantics (callers may keep
# the old CountTable); only the fused add_packed path donates
_update_table_packed_words = jax.jit(
    _update_packed_words_traced, static_argnames=("cap",))


@functools.partial(jax.jit, static_argnames=("cap", "perm_key", "k"),
                   donate_argnums=(0,))
def _update_packed_words_fused(table, packed, mask, cap: int, perm_key,
                               k: int):
    """Fused Phase-A batch update over the word-packed table (the
    production ``add_packed`` path) — one dispatch, table donated."""
    codes = unpack_codes_mask(packed, mask)
    hashes, valid = kmer_hashes_traced(codes, perm_key, k)
    return _update_packed_words_traced(table, hashes, valid, cap)


def packed_table_shape(k: int) -> Tuple[int, int]:
    """(rows, words_per_row) of the nibble-packed table (8 × 4-bit
    fields per uint32 word)."""
    rows, width = table_shape(k)
    assert width % 8 == 0
    return rows, width // 8


@functools.partial(
    jax.jit, static_argnames=("cap", "perm_key", "k", "B", "L", "exc_cap"),
    donate_argnums=(0,))
def _update_fused_wire(table, wire, cap: int, perm_key, k: int,
                       B: int, L: int, exc_cap: int):
    """Fused Phase-A batch update from the single-buffer wire format
    (kmer.pack_codes_wire): one put + one dispatch per batch, table
    donated.  Dispatches on table dtype like lookup_traced."""
    from palace_tpu.ops.kmer import unpack_codes_wire

    codes = unpack_codes_wire(wire, B, L, exc_cap)
    hashes, valid = kmer_hashes_traced(codes, perm_key, k)
    if table.dtype == jnp.uint32:
        return _update_packed_words_traced(table, hashes, valid, cap)
    return _update_set_traced(table, hashes, valid, cap)


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
    hi, lo = split_hash(s, table.shape[1])
    table = table.at[hi, lo].add(inc, mode="drop", indices_are_sorted=True)
    table = table.at[hi, lo].min(jnp.uint8(cap), mode="drop",
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


_lookup_table = jax.jit(lookup_traced)


def _use_packed_words(k: int, cap: int) -> bool:
    """Nibble-packed storage for the big tables on TPU: XLA:TPU's
    scatter leaves its fast 32-bit-index path at 2^31-element operands
    (6–9× slower, benchmarks/ANALYSIS.md), so k > 30 byte tables are
    stored as 2^29 uint32 words of 8 × 4-bit fields with gather-free
    scatter-add updates (_update_packed_words_traced).  CPU has no such
    cliff and keeps the byte layout.  Requires cap == 3 (lookups clamp
    fields at the reference's least_depth).  PALACE_TABLE_PACKED=0/1
    overrides."""
    env = os.environ.get("PALACE_TABLE_PACKED")
    if env is not None:
        return bool(int(env)) and cap == 3
    if k <= 30 or cap != 3:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@dataclass
class CountTable:
    """Single-device saturating counter over 2^k hash slots.

    Storage is either the (2^(k-16), 2^16) uint8 byte table or — on
    TPU for k > 30 — a (2^(k-16), 2^13) uint32 NIBBLE-PACKED table
    with 8 × 4-bit fields per word (see ``_update_packed_words_traced``:
    gather-free scatter-add updates; the update scatter stays on
    XLA:TPU's fast 32-bit-index path).  Both forms have identical count
    semantics; ``lookup_traced`` dispatches on dtype.  ``pending``
    counts adds since the last nibble clamp (overflow prevention —
    lookups are exact at any residue, see _clamp_nibbles).
    """

    table: jnp.ndarray
    k: int
    cap: int = 3
    pending: int = 0

    @classmethod
    def create(cls, k: int, cap: int = 3) -> "CountTable":
        if _use_packed_words(k, cap):
            return cls(table=jnp.zeros(packed_table_shape(k), jnp.uint32),
                       k=k, cap=cap)
        return cls(table=jnp.zeros(table_shape(k), jnp.uint8), k=k, cap=cap)

    @property
    def packed_words(self) -> bool:
        return self.table.dtype == jnp.uint32

    def _packed_result(self, new: jnp.ndarray) -> "CountTable":
        """Wrap an updated (owned) nibble table, clamping the residue
        every NIBBLE_CLAMP_EVERY adds so fields never carry; donating
        ``new`` is safe — it is this call's fresh intermediate."""
        if self.pending + 1 >= NIBBLE_CLAMP_EVERY:
            return CountTable(_clamp_nibbles(new), self.k, self.cap, 0)
        return CountTable(new, self.k, self.cap, self.pending + 1)

    def merged(self) -> jnp.ndarray:
        """The table array in its native layout (kept for callers that
        feed it to ``lookup_traced``-based scans)."""
        return self.table

    def add_kmers(self, hashes: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> "CountTable":
        if valid is None:
            valid = jnp.ones(hashes.shape, bool)
        if self.packed_words:
            new = _update_table_packed_words(
                self.table, jnp.asarray(hashes, jnp.uint32), valid, self.cap)
            return self._packed_result(new)
        return CountTable(_update_table(self.table, hashes, valid, self.cap),
                          self.k, self.cap)

    def add_packed(self, packed: np.ndarray, mask: np.ndarray,
                   perm: np.ndarray, kmer_k: int) -> "CountTable":
        """Fused single-dispatch update from wire-packed codes (see
        kmer.pack_codes_mask).  DONATES the current table buffer — the
        receiver object must not be used after this call."""
        if self.packed_words:
            new = _update_packed_words_fused(
                self.table, jnp.asarray(packed), jnp.asarray(mask),
                self.cap, perm_to_key(perm), kmer_k)
            return self._packed_result(new)
        new = _update_table_packed(
            self.table, jnp.asarray(packed), jnp.asarray(mask),
            self.cap, perm_to_key(perm), kmer_k,
        )
        return CountTable(new, self.k, self.cap)

    def add_wire(self, wire: np.ndarray, B: int, L: int,
                 perm: np.ndarray, kmer_k: int,
                 exc_cap: Optional[int] = None) -> "CountTable":
        """Fused single-put update from the length-coded wire buffer
        (kmer.pack_codes_wire).  DONATES the current table buffer."""
        from palace_tpu.ops.kmer import WIRE_EXC_CAP

        new = _update_fused_wire(
            self.table, jnp.asarray(wire), self.cap, perm_to_key(perm),
            kmer_k, B, L, WIRE_EXC_CAP if exc_cap is None else exc_cap)
        if self.packed_words:
            return self._packed_result(new)
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
    """Count table row-sharded over all devices of a mesh."""

    table: jnp.ndarray  # (rows, 2^16) uint8, rows sharded over mesh axes
    k: int
    mesh: Mesh
    cap: int = 3
    #: device scalar accumulating pairs lost to windowed-scatter
    #: capacity overflow (see _batch_sharded_scatter); 0 on every
    #: realistic distribution — check with ``overflow_dropped()``
    dropped: Optional[jnp.ndarray] = None

    def overflow_dropped(self) -> int:
        """Total (hash, inc) pairs dropped by the batch-sharded
        windowed scatter across all updates — syncs with the device."""
        return 0 if self.dropped is None else int(np.asarray(self.dropped))

    def _accum_dropped(self, new: jnp.ndarray) -> jnp.ndarray:
        tot = jnp.sum(new).astype(jnp.int32)
        return tot if self.dropped is None else self.dropped + tot

    @classmethod
    def create(cls, mesh: Mesh, k: int, cap: int = 3) -> "ShardedCountTable":
        axes = tuple(mesh.axis_names)
        sharding = NamedSharding(mesh, P(axes))
        n_dev = int(np.prod(mesh.devices.shape))
        rows, width = table_shape(k)
        shard_rows = -(-rows // n_dev)  # ceil: pad so any n_dev works
        table = jax.device_put(
            jnp.zeros((shard_rows * n_dev, width), jnp.uint8), sharding)
        return cls(table=table, k=k, mesh=mesh, cap=cap)

    def add_kmers(self, hashes: jnp.ndarray,
                  valid: Optional[jnp.ndarray] = None) -> "ShardedCountTable":
        n_dev = int(np.prod(self.mesh.devices.shape))
        if n_dev * self.cap + self.cap <= 255:
            # batch-sharded path: invalid → slot 0, pad to n_dev multiple
            # (slot 0 is the permanent-miss slot — padding is invisible)
            h = jnp.asarray(hashes, jnp.uint32)
            if valid is not None:
                v = valid
                if v.ndim == h.ndim - 1:
                    v = v[..., None]
                h = jnp.where(jnp.broadcast_to(v, h.shape), h, 0)
            flat = h.reshape(-1)
            pad = (-flat.shape[0]) % n_dev
            flat = jnp.pad(flat, (0, pad))
            f = _sharded_update_hashes_batch(self.mesh, self.k, self.cap,
                                             _cap_win_override())
            new_table, dropped = f(self.table, flat)
            return ShardedCountTable(new_table, self.k, self.mesh, self.cap,
                                     self._accum_dropped(dropped))
        if valid is None:
            valid = jnp.ones(hashes.shape, bool)
        s, total = _sorted_run_lengths(jnp.asarray(hashes, jnp.uint32), valid)
        f = _sharded_update_replicated(self.mesh, self.k, self.cap)
        new_table = f(self.table, s, total)
        return ShardedCountTable(new_table, self.k, self.mesh, self.cap,
                                 self.dropped)

    def add_packed(self, packed: np.ndarray, mask: np.ndarray,
                   perm: np.ndarray, kmer_k: int) -> "ShardedCountTable":
        """Fused sharded update in ONE jit with the table shards donated.

        When the batch divides the device count, the *batch* is sharded
        too: each device unpacks/hashes/sorts only its 1/N slice and the
        per-slice (hash, increment) pairs ride one ``all_gather`` over
        ICI before the local-row scatter — removing the replicated
        O(B·M·3 log) sort that capped round-1 scaling at 0.78
        (VERDICT weak #3).  Otherwise falls back to the replicated
        preprocessing with per-shard masked scatter."""
        n_dev = int(np.prod(self.mesh.devices.shape))
        if packed.shape[0] % n_dev == 0 and n_dev * self.cap + self.cap <= 255:
            f = _sharded_update_packed_batch(
                self.mesh, self.k, self.cap, perm_to_key(perm), kmer_k,
                _cap_win_override())
            new_table, dropped = f(self.table, jnp.asarray(packed),
                                   jnp.asarray(mask))
            return ShardedCountTable(new_table, self.k, self.mesh, self.cap,
                                     self._accum_dropped(dropped))
        f = _sharded_update_packed(
            self.mesh, self.k, self.cap, perm_to_key(perm), kmer_k)
        new_table = f(self.table, jnp.asarray(packed), jnp.asarray(mask))
        return ShardedCountTable(new_table, self.k, self.mesh, self.cap,
                                 self.dropped)

    def lookup(self, hashes: jnp.ndarray) -> jnp.ndarray:
        shape = hashes.shape
        flat = jnp.asarray(hashes, jnp.uint32).reshape(-1)
        f = _sharded_lookup(self.mesh, self.k, self.cap)
        counts = f(self.table, flat)
        counts = jnp.where(flat == 0, 0, counts)
        return counts.reshape(shape).astype(jnp.uint8)


@functools.lru_cache(maxsize=32)
def _make_shard_fns(axes, n_dev: int, shard_rows: int, row_width: int, cap: int):
    def _local_idx(hashes):
        # device's linear index over the flattened mesh axes
        dev = jnp.zeros((), jnp.int32)
        for ax in axes:
            dev = dev * jnp.int32(jax.lax.axis_size(ax)) + jax.lax.axis_index(ax)
        base_row = dev * jnp.int32(shard_rows)
        hi, lo = split_hash(hashes, row_width)
        local_hi = hi - base_row
        in_range = (local_hi >= 0) & (local_hi < shard_rows)
        return jnp.where(in_range, local_hi, 0), lo, in_range

    def update_shard(table_shard, s, total):
        # s is globally sorted with per-value totals (computed once,
        # replicated); each shard rewrites only its hash row range.
        # Out-of-range entries target row shard_rows (OOB → drop);
        # duplicates within a run write identical values, so the
        # scatter-set needs no combine.
        local_hi, lo, in_range = _local_idx(s)
        old = table_shard[local_hi, lo]
        newv = jnp.minimum(
            old.astype(jnp.int32) + total, jnp.int32(cap)
        ).astype(jnp.uint8)
        hi_s = jnp.where(in_range, local_hi, jnp.int32(shard_rows))
        return table_shard.at[hi_s, lo].set(newv, mode="drop")

    def lookup_shard(table_shard, hashes):
        local_hi, lo, in_range = _local_idx(hashes)
        part = jnp.where(in_range, table_shard[local_hi, lo], 0).astype(jnp.int32)
        return jax.lax.psum(part, axes)

    return update_shard, lookup_shard, axes


@functools.lru_cache(maxsize=32)
def _sharded_lookup(mesh: Mesh, table_bits: int, cap: int):
    """Cached jit per (mesh, table, cap) config.  Rebuilding
    ``jax.jit(shard_map(...))`` inside every ``lookup`` call created a
    fresh jit cache per call — a full retrace each time, measured at
    ~80 ms/call on the 8-device CPU mesh and mistaken for 'sharding
    overhead' in benchmarks/scaling.py until attributed."""
    axes = tuple(mesh.axis_names)
    n_dev = int(np.prod(mesh.devices.shape))
    rows, width = table_shape(table_bits)
    _, lookup_shard, _ = _make_shard_fns(axes, n_dev, -(-rows // n_dev),
                                         width, cap)
    return jax.jit(jax.shard_map(
        lookup_shard, mesh=mesh, in_specs=(P(axes), P()), out_specs=P()))


@functools.lru_cache(maxsize=32)
def _sharded_update_replicated(mesh: Mesh, table_bits: int, cap: int):
    """Cached jit for the replicated (non-batch-shardable) update path
    — same per-call-retrace trap as ``_sharded_lookup``."""
    axes = tuple(mesh.axis_names)
    n_dev = int(np.prod(mesh.devices.shape))
    rows, width = table_shape(table_bits)
    update_shard, _, _ = _make_shard_fns(axes, n_dev, -(-rows // n_dev),
                                         width, cap)
    spec_table = P(axes)
    return jax.jit(jax.shard_map(
        update_shard, mesh=mesh,
        in_specs=(spec_table, P(), P()), out_specs=spec_table))


@functools.lru_cache(maxsize=16)
def _sharded_update_packed(mesh: Mesh, table_bits: int, cap: int,
                           perm_key, kmer_k: int):
    """One cached jit per (mesh, table, coder) config: replicated
    unpack→hash→sort feeding the per-shard masked scatter, table
    shards donated."""
    axes = tuple(mesh.axis_names)
    n_dev = int(np.prod(mesh.devices.shape))
    rows, width = table_shape(table_bits)
    update_shard, _, _ = _make_shard_fns(axes, n_dev, -(-rows // n_dev),
                                         width, cap)
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


@functools.lru_cache(maxsize=16)
def _sharded_update_packed_batch(mesh: Mesh, table_bits: int, cap: int,
                                 perm_key, kmer_k: int, cap_win: int = 0):
    """Batch-sharded saturating update: every device preprocesses only
    its batch slice.

    Per shard: unpack → hash → sort the local slice, emit one clipped
    increment per distinct value (at its run's last occurrence), then
    ``all_gather`` the (hash, increment) pairs so each shard applies
    every slice's contribution to its own row range with a duplicate-
    combining scatter-add followed by a scatter-min back to ``cap``.
    Cross-slice duplicates are ≤ n_dev per slot and each increment is
    ≤ cap, so ``n_dev·cap + cap ≤ 255`` keeps the uint8 adds exact
    (checked by the caller).  Saturation semantics match the replicated
    path and the reference's racy byte table (extract_ref.cpp:995-998).
    """
    axes = tuple(mesh.axis_names)
    n_dev = int(np.prod(mesh.devices.shape))
    rows, width = table_shape(table_bits)
    shard_rows = -(-rows // n_dev)

    scatter = _batch_sharded_scatter(axes, n_dev, shard_rows, width, cap,
                                     cap_win)

    def shard_fn(table_shard, packed_loc, mask_loc):
        codes = unpack_codes_mask(packed_loc, mask_loc)
        hashes, valid = kmer_hashes_traced(codes, perm_key, kmer_k)
        s, total = _sorted_run_lengths(hashes, valid)
        return scatter(table_shard, s, total)

    spec_table = P(axes)
    f = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec_table, P(axes), P(axes)),
        out_specs=(spec_table, P(axes)),
    )
    return jax.jit(f, donate_argnums=(0,))


def _cap_win_override() -> int:
    """PALACE_SCATTER_CAP_WIN shrinks the windowed-scatter capacity so
    tests can force overflow through the production read path (uniform
    hashes never overflow the 2·E default).  Read at builder-call time
    and folded into the lru keys so env changes take effect."""
    return int(os.environ.get("PALACE_SCATTER_CAP_WIN", "0") or 0)


def _batch_sharded_scatter(axes, n_dev: int, shard_rows: int, width: int,
                           cap: int, cap_win_override: int = 0):
    """Shared tail of the batch-sharded updates: compress the local
    slice's sorted runs to one clipped increment per distinct value,
    all_gather the (hash, increment) pairs, scatter the slice windows
    that fall in the local row range, scatter-min back to cap.

    **Windowed scatter** (the 1→N scaling fix): a naive scatter of the
    full gathered array costs O(B) per shard — N·B total — which caps
    scaling at the scatter (measured 0.72 relative throughput at n8 on
    the virtual mesh).  Each slice is sorted, so the pairs belonging to
    this shard's row range form ONE contiguous window per slice;
    ``searchsorted`` finds it and a fixed-capacity ``dynamic_slice``
    extracts it, cutting per-shard scatter work to N·C ≈ 2B/N.  Every
    window element is still range-checked individually, so window
    placement (including ``dynamic_slice``'s start clamping) affects
    only performance, never correctness — EXCEPT capacity overflow:
    a slice contributing more than C distinct in-range values to one
    shard loses the tail.  Uniform coder-permuted hashes make that a
    large-deviation event at C = 2·E[window]; the scatter counts every
    dropped pair and returns it so callers can assert zero (see
    ``ShardedCountTable.dropped``).

    Returns ``(table_shard, dropped (1,) int32)``.
    """

    def scatter(table_shard, s, total):
        n = s.shape[0]
        if cap_win_override:
            cap_win = min(n, cap_win_override)
        else:
            cap_win = min(n, max(256, 2 * (-(-n // n_dev))))
        pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        nxt = jnp.concatenate([s[1:], s[-1:]])
        is_last = (pos == n - 1) | (s != nxt)
        inc = jnp.where(is_last, jnp.minimum(total, cap), 0).astype(jnp.uint8)

        # compact to distinct values with an O(n) stream compaction
        # (cumsum + scatter — a second full sort here cost more than the
        # windowing saved): kept entries stay in per-slice sorted order,
        # the tail is pre-filled with the max sentinel so the array
        # stays sorted for searchsorted (sentinels carry inc=0)
        keep = inc > 0
        idx = jnp.cumsum(keep.astype(jnp.int32)) - 1
        n_keep = idx[-1] + 1
        tgt = jnp.where(keep, idx, n)
        s_c = jnp.full((n,), 0xFFFFFFFF, jnp.uint32).at[tgt].set(s, mode="drop")
        inc_c = jnp.zeros((n,), jnp.uint8).at[tgt].set(inc, mode="drop")

        # one collective: every shard sees every slice's compacted runs
        s_all = jax.lax.all_gather(s_c, axes)        # (N, n)
        inc_all = jax.lax.all_gather(inc_c, axes)    # (N, n)
        len_all = jax.lax.all_gather(n_keep, axes)   # (N,)

        dev = jnp.zeros((), jnp.int32)
        for ax in axes:
            dev = dev * jnp.int32(jax.lax.axis_size(ax)) + jax.lax.axis_index(ax)
        base_row = dev * jnp.int32(shard_rows)
        # shard value range [lo_val, hi_val); products stay < 2^32 for
        # every shard except the last's upper bound, which wraps — the
        # last shard uses the compacted length instead (this also keeps
        # genuine 0xFFFFFFFF hashes in and sentinels out)
        lo_val = base_row.astype(jnp.uint32) * jnp.uint32(width)
        hi_val = (base_row + shard_rows).astype(jnp.uint32) * jnp.uint32(width)
        is_last_shard = dev == n_dev - 1

        lo_j = jax.vmap(lambda seg: jnp.searchsorted(seg, lo_val))(s_all)
        hi_j = jnp.where(
            is_last_shard, len_all,
            jax.vmap(lambda seg: jnp.searchsorted(seg, hi_val))(s_all))
        hi_j = jnp.maximum(hi_j, lo_j)
        dropped = jnp.sum(jnp.maximum(hi_j - lo_j - cap_win, 0))

        win_s = jax.vmap(
            lambda seg, st: jax.lax.dynamic_slice(seg, (st,), (cap_win,))
        )(s_all, lo_j).reshape(-1)
        win_inc = jax.vmap(
            lambda seg, st: jax.lax.dynamic_slice(seg, (st,), (cap_win,))
        )(inc_all, lo_j).reshape(-1)

        hi, lo = split_hash(win_s, width)
        local_hi = hi - base_row
        in_range = (local_hi >= 0) & (local_hi < shard_rows) & (win_inc > 0)
        hi_s = jnp.where(in_range, local_hi, jnp.int32(shard_rows))  # OOB → drop
        table_shard = table_shard.at[hi_s, lo].add(win_inc, mode="drop")
        table_shard = table_shard.at[hi_s, lo].min(jnp.uint8(cap), mode="drop")
        return table_shard, dropped[None]

    return scatter


@functools.lru_cache(maxsize=16)
def _sharded_update_hashes_batch(mesh: Mesh, table_bits: int, cap: int,
                                 cap_win: int = 0):
    """Batch-sharded update from a flat pre-hashed array (padded to a
    multiple of the device count; invalid entries already mapped to the
    slot-0 permanent miss)."""
    axes = tuple(mesh.axis_names)
    n_dev = int(np.prod(mesh.devices.shape))
    rows, width = table_shape(table_bits)
    shard_rows = -(-rows // n_dev)
    scatter = _batch_sharded_scatter(axes, n_dev, shard_rows, width, cap,
                                     cap_win)

    def shard_fn(table_shard, flat_loc):
        s, total = _sorted_run_lengths(flat_loc, jnp.ones(flat_loc.shape, bool))
        return scatter(table_shard, s, total)

    spec_table = P(axes)
    f = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec_table, P(axes)), out_specs=(spec_table, P(axes)),
    )
    # no donation: add_kmers keeps value semantics (only add_packed
    # documents buffer donation)
    return jax.jit(f)
