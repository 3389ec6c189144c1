"""Three-coder canonical k-mer hashing, TPU-native.

Reference semantics (bin/extract_ref.cpp):

* three binary base projections ("coders", :1010-1054):
  coder0: A/T→1, C/G→0;  coder1: A/C→1, T/G→0;  coder2: A/G→1, T/C→0;
  any other character invalidates the k-mer.
* a per-position permutation of the three coders ("choose_coder",
  :1082-1102): hash slot ``i`` at k-mer offset ``z`` uses coder
  ``perm[z, i]``; each row of ``perm`` is a permutation of (0,1,2).
  The reference draws it from ``time(0)`` at index build and persists
  it in the index header (:680-682); we derive it from a fixed seed so
  runs are reproducible (SURVEY.md §7 hard part b).
* forward hash  h_i(j) = Σ_z bit_{perm[z,i]}(s[j+z]) · 2^(k-1-z)
  (:965-999); reverse-complement hash samples the complemented
  projections back-to-front (:973,:984); canonical = min(fwd, rc)
  (:401-406, :989-994).

The complement collapses algebraically: complementing a base leaves
coder0 unchanged and flips coder1/coder2, so the rc bit-streams are
``[b0, 1-b1, 1-b2]`` — no second base pass needed.

Implemented as vectorised JAX over ``(B, L)`` base-code batches: the
k·3 shifted adds unroll into fused VPU ops under jit.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

#: the 6 permutations of (0,1,2) in the reference's order
#: (extract_ref.cpp:1084)
_PERMUTATIONS = np.array(
    [[0, 1, 2], [0, 2, 1], [1, 2, 0], [1, 0, 2], [2, 0, 1], [2, 1, 0]], dtype=np.int32
)

# base codes: A=0 C=1 G=2 T=3, invalid=4
BASE_LUT = np.full(256, 4, dtype=np.uint8)
for ch, code in (("A", 0), ("C", 1), ("G", 2), ("T", 3)):
    BASE_LUT[ord(ch)] = code
    BASE_LUT[ord(ch.lower())] = code

#: coder bit per (coder, base-code) — extract_ref.cpp:1017-1051
#: (column 4 = invalid placeholder, masked separately)
CODER_BITS = np.array(
    [
        [1, 0, 0, 1, 0],  # coder0: A,T → 1
        [1, 1, 0, 0, 0],  # coder1: A,C → 1
        [1, 0, 1, 0, 0],  # coder2: A,G → 1
    ],
    dtype=np.uint32,
)


def make_choose_coder(k: int, seed: int = 1) -> np.ndarray:
    """Deterministic per-position coder permutation, shape (k, 3).

    Same structure as random_coder (extract_ref.cpp:1082-1102) but
    seeded, so index build and search always agree."""
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, 6, size=k)
    return _PERMUTATIONS[rows]


def seq_to_codes(seq: str) -> np.ndarray:
    return BASE_LUT[np.frombuffer(seq.encode(), dtype=np.uint8)]


def kmer_hashes_traced(
    codes: jnp.ndarray, perm_key: Tuple[Tuple[int, int, int], ...], k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Traceable hash core — composes into larger jits (the fused
    count-table update and the fused reference scan dispatch once per
    batch instead of once per sub-op; on the tunneled chip every extra
    dispatch is a relay round-trip)."""
    perm_host = np.asarray(perm_key, dtype=np.int32)
    B, L = codes.shape
    M = L - k + 1
    coder_bits = jnp.asarray(CODER_BITS)  # (3, 5)
    codes32 = codes.astype(jnp.int32)
    # per-coder bit streams b[c, :, :] = coder_bits[c][codes]
    bits = coder_bits[:, codes32]  # (3, B, L) uint32
    invalid = (codes >= 4).astype(jnp.int32)  # (B, L)

    fwd = [jnp.zeros((B, M), jnp.uint32) for _ in range(3)]
    rc = [jnp.zeros((B, M), jnp.uint32) for _ in range(3)]
    for z in range(k):
        w = jnp.uint32(1) << jnp.uint32(k - 1 - z)
        for i in range(3):
            c = int(perm_host[z, i])
            # forward: bit of coder c at position j+z
            fwd[i] = fwd[i] + bits[c, :, z : z + M] * w
            # reverse complement: complemented coder c at j+(k-1-z)
            src = bits[c, :, k - 1 - z : k - 1 - z + M]
            if c != 0:  # coders 1/2 flip under complement; coder0 doesn't
                src = jnp.uint32(1) - src
            rc[i] = rc[i] + src * w

    canonical = jnp.stack(
        [jnp.minimum(f, r) for f, r in zip(fwd, rc)], axis=2
    )  # (B, M, 3)
    # validity: no invalid base inside the window
    inv_cum = jnp.cumsum(invalid, axis=1)
    window_inv = inv_cum[:, k - 1 :] - jnp.pad(inv_cum, ((0, 0), (1, 0)))[:, :M]
    valid = window_inv == 0
    return canonical, valid


@functools.lru_cache(maxsize=16)
def _hash_fn(perm_key: Tuple[Tuple[int, int, int], ...], k: int):
    return jax.jit(functools.partial(kmer_hashes_traced, perm_key=perm_key, k=k))


def perm_to_key(perm: np.ndarray) -> Tuple[Tuple[int, int, int], ...]:
    """Hashable static form of the (k, 3) coder permutation."""
    return tuple(tuple(int(x) for x in row) for row in np.asarray(perm))


def kmer_hashes(codes, perm, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Canonical 3-coder hashes for every k-mer of a code batch.

    codes: (B, L) uint8 base codes (0..3, 4=invalid)
    perm:  (k, 3) coder permutation (static — loop structure depends on it)
    Returns ``(hashes (B, L-k+1, 3) uint32, valid (B, L-k+1) bool)``.
    """
    codes = jnp.asarray(codes)
    B, L = codes.shape
    if L - k + 1 <= 0:
        return jnp.zeros((B, 0, 3), jnp.uint32), jnp.zeros((B, 0), bool)
    return _hash_fn(perm_to_key(perm), k)(codes)


def pack_codes_mask(codes: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side wire packing: (B, L) base codes 0..4 (L % 8 == 0) →
    ``(packed (B, L//4) uint8, invalid (B, L//8) uint8)`` — 2 bits per
    base plus a 1-bit invalid mask ≈ 0.28 B/base, 3.6× less
    host→device traffic than raw uint8 codes.  Invalid codes pack as
    base 0; the mask restores them on device."""
    c = codes.astype(np.uint8)
    inv = c >= 4
    c2 = np.where(inv, 0, c)
    packed = (c2[:, 0::4] | (c2[:, 1::4] << 2) | (c2[:, 2::4] << 4)
              | (c2[:, 3::4] << 6))
    mask = np.packbits(inv, axis=1, bitorder="little")
    return packed, mask


def unpack_codes_mask(packed: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Device-side (traceable) inverse of ``pack_codes_mask``:
    → (B, 4·P) int32 codes with 4 restored at invalid positions."""
    p = packed.astype(jnp.int32)
    codes = jnp.stack([(p >> (2 * i)) & 3 for i in range(4)], axis=2)
    codes = codes.reshape(p.shape[0], p.shape[1] * 4)
    m = mask.astype(jnp.int32)
    bits = jnp.stack([(m >> i) & 1 for i in range(8)], axis=2)
    inv = bits.reshape(m.shape[0], m.shape[1] * 8).astype(bool)
    return jnp.where(inv, 4, codes)


#: fixed exception capacity of the length-coded wire format (in-read
#: invalid positions, e.g. N bases — rare in quality-filtered data)
WIRE_EXC_CAP = 2048


def pack_codes_wire(codes: np.ndarray,
                    cap: int = WIRE_EXC_CAP) -> Optional[np.ndarray]:
    """Host-side wire packing v2: ONE flat uint8 buffer per batch.

    Layout: ``[B·L/4 bytes of 2-bit codes | B uint8 row lengths |
    cap little-endian uint32 exception flat-indices (0xFFFFFFFF pad)]``.

    vs ``pack_codes_mask`` this drops the 1-bit/base invalid mask
    (1/3 of the wire) — padding is derivable from the row length and
    in-read invalid bases (N) ride a fixed sparse exception list —
    and, being a single array, costs ONE relay put instead of two
    (~65 ms RTT each, benchmarks/race_eref.json).  Trailing in-read
    Ns fold into the length (identical invalid semantics).

    Returns None when L > 255 or the batch has more than ``cap``
    in-read invalid positions; callers fall back to pack_codes_mask.
    """
    c = codes.astype(np.uint8)
    B, L = c.shape
    if L > 255 or L % 4:
        return None
    inv = c >= 4
    valid_any = ~inv.all(axis=1)
    last_valid = L - 1 - np.argmax(~inv[:, ::-1], axis=1)
    lens = np.where(valid_any, last_valid + 1, 0)
    exc_mask = inv & (np.arange(L)[None, :] < lens[:, None])
    exc = np.flatnonzero(exc_mask)
    if exc.size > cap:
        return None
    c2 = np.where(inv, 0, c)
    packed = (c2[:, 0::4] | (c2[:, 1::4] << 2) | (c2[:, 2::4] << 4)
              | (c2[:, 3::4] << 6))
    excw = np.full(cap, 0xFFFFFFFF, np.uint32)
    excw[: exc.size] = exc.astype(np.uint32)
    return np.concatenate([packed.reshape(-1), lens.astype(np.uint8),
                           excw.view(np.uint8)])


def unpack_codes_wire(wire: jnp.ndarray, B: int, L: int,
                      cap: int = WIRE_EXC_CAP) -> jnp.ndarray:
    """Device-side (traceable) inverse of ``pack_codes_wire`` →
    (B, L) int32 codes with 4 restored beyond each row's length and at
    exception positions."""
    nP = B * (L // 4)
    p = wire[:nP].reshape(B, L // 4).astype(jnp.int32)
    codes = jnp.stack([(p >> (2 * i)) & 3 for i in range(4)], axis=2)
    codes = codes.reshape(B, L)
    lens = wire[nP:nP + B].astype(jnp.int32)
    excb = wire[nP + B:nP + B + 4 * cap].reshape(cap, 4)
    # keep indices UNSIGNED: as int32 the 0xFFFFFFFF sentinel would be
    # -1, which .at[] wraps numpy-style to the LAST element instead of
    # dropping; as uint32 it is out of range and mode="drop" drops it
    exc = jax.lax.bitcast_convert_type(excb, jnp.uint32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    codes = jnp.where(pos < lens[:, None], codes, 4)
    flat = codes.reshape(-1)
    flat = flat.at[exc].set(4, mode="drop")
    return flat.reshape(B, L)


def kmer_hashes_np(codes: np.ndarray, perm: np.ndarray, k: int):
    """Host-side oracle mirroring the reference C++ scalar loop
    (extract_ref.cpp:965-999); used by tests."""
    comple_code = {0: 3, 1: 2, 2: 1, 3: 0, 4: 4}
    L = codes.shape[-1]
    M = L - k + 1
    hashes = np.zeros((M, 3), dtype=np.uint64)
    valid = np.zeros(M, dtype=bool)
    base = [2 ** (k - 1 - z) for z in range(k)]
    for j in range(M):
        ok = True
        for i in range(3):
            h = 0
            hc = 0
            for z in range(k):
                b = int(codes[j + z])
                if b >= 4:
                    ok = False
                    break
                c_fwd = int(perm[z, i])
                h += int(CODER_BITS[c_fwd, b]) * base[z]
                # reference: n = coder[choose_coder[(k-1-z)*3+i]][comple(s[j+z])]
                # accumulated with weight base[k-1-z]
                c_rc = int(perm[k - 1 - z, i])
                hc += int(CODER_BITS[c_rc, comple_code[b]]) * base[k - 1 - z]
            if not ok:
                break
            hashes[j, i] = min(h, hc)
        valid[j] = ok
    return hashes.astype(np.uint32), valid
