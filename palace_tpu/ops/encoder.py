"""3-mer transition-matrix contig encoder, TPU-native.

Reference semantics (share/palace/scripts/encode.pyx:8-55): uppercase
the sequence, drop non-ACGT characters (shifting positions!), form
K=3-mer base-4 codes, and for gaps d∈{0,1,2} count transitions
``matrix[loc[i], loc[i+K+d]] += 1`` over ``i < len(loc)-K-d``; the
three 64×64 matrices are flattened, concatenated and scaled by
``100/len(seq)`` (original length, including dropped characters).

The reference implements this as a Cython per-sequence scalar loop run
under multiprocessing.  Here the counting is expressed as one-hot
matmuls — ``counts_d = onehot(loc[:-(K+d)])ᵀ · onehot(loc[K+d:])`` —
which XLA tiles onto the MXU, with padding masks so a whole batch of
variable-length contigs is encoded in one fused kernel.
"""
from __future__ import annotations

import functools
from typing import Iterable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

K = 3
NUM_CODES = 64  # 4**K
GAPS = (0, 1, 2)
FEATURE_DIM = len(GAPS) * NUM_CODES * NUM_CODES  # 12288

# base → code lookup (A0 C1 G2 T3, others invalid), as in encode.pyx:9
_BASE_LUT = np.full(256, 255, dtype=np.uint8)
for ch, code in (("A", 0), ("C", 1), ("G", 2), ("T", 3)):
    _BASE_LUT[ord(ch)] = code
    _BASE_LUT[ord(ch.lower())] = code

# bytes.translate tables: map ACGT/acgt → code byte and DELETE everything
# else, in one C pass — ~4× faster than numpy LUT gather + boolean select
_CODE_TT = bytes(int(_BASE_LUT[i]) if _BASE_LUT[i] != 255 else 0 for i in range(256))
_CODE_DELETE = bytes(i for i in range(256) if _BASE_LUT[i] == 255)


def seq_to_kmer_locs(seq: str) -> Tuple[np.ndarray, int]:
    """Host-side: sequence → array of 3-mer base-4 codes.

    Non-ACGT characters are removed *before* k-merisation, exactly as
    encode.pyx:8-12 (`filter(str.isdigit)`), so 3-mers can span a
    dropped character.  Returns ``(locs, original_length)``.
    """
    codes = np.frombuffer(seq.encode().translate(_CODE_TT, _CODE_DELETE),
                          dtype=np.uint8).astype(np.int32)
    if codes.size < K:
        return np.zeros(0, dtype=np.int32), len(seq)
    locs = codes[:-2] * 16 + codes[1:-1] * 4 + codes[2:]
    return locs, len(seq)


@functools.partial(jax.jit, static_argnames=("block",))
def _transition_counts(locs: jnp.ndarray, n_locs: jnp.ndarray, block: int = 0) -> jnp.ndarray:
    """Batched gap-transition counts on device.

    locs: (B, L) int32 3-mer codes, padded arbitrarily past ``n_locs``.
    n_locs: (B,) int32 number of valid codes per row.
    Returns (B, 3, 64, 64) float32 count matrices.
    """
    B, L = locs.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    # one-hot of every position once; per-gap masks select valid pairs
    safe = jnp.where(pos < n_locs[:, None], locs, 0)
    onehot = jax.nn.one_hot(safe, NUM_CODES, dtype=jnp.float32)  # (B, L, 64)

    outs = []
    for d in GAPS:
        shift = K + d
        # pair (i, i+shift) valid iff i < n_locs - shift   (encode.pyx:33)
        limit = n_locs[:, None] - shift
        mask = (pos < jnp.maximum(limit, 0)).astype(jnp.float32)  # (B, L)
        a = onehot * mask[:, :, None]
        b = jnp.roll(onehot, -shift, axis=1)
        outs.append(jnp.einsum("blu,blv->buv", a, b, preferred_element_type=jnp.float32))
    return jnp.stack(outs, axis=1)


def transition_features(
    locs_padded: np.ndarray, n_locs: np.ndarray, seq_lens: np.ndarray
) -> jnp.ndarray:
    """(B, L) padded codes → (B, 12288) features, scaled ×100/len
    (encode.pyx:55).  Uses the fused Pallas kernel on TPU (no one-hot
    materialisation in HBM); the XLA einsum path elsewhere."""
    from palace_tpu.ops.pallas_kernels import transition_counts_pallas, use_pallas

    if use_pallas():
        counts = transition_counts_pallas(jnp.asarray(locs_padded), jnp.asarray(n_locs))
    else:
        counts = _transition_counts(jnp.asarray(locs_padded), jnp.asarray(n_locs))
    feats = counts.reshape(counts.shape[0], FEATURE_DIM)
    scale = 100.0 / jnp.maximum(jnp.asarray(seq_lens, dtype=jnp.float32), 1.0)
    return feats * scale[:, None]


def _pad_to_multiple(n: int, m: int = 512) -> int:
    return max(m, ((n + m - 1) // m) * m)


def seqs_to_code_batch(seqs: Sequence[str]) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side: sequences → compact int8 base codes.

    Returns ``(codes (B, L) int8 padded with 0, n_codes (B,) int32,
    orig_lens (B,) int32)``.  Non-ACGT characters are compacted out on
    the host (cheap numpy boolean select); the 3-mer codes are then
    derived ON DEVICE from these 1-byte codes — 4× less host→device
    traffic than shipping int32 3-mer locs, which matters when the
    device sits behind a network relay.
    """
    code_list = []
    lens = []
    orig = []
    for s in seqs:
        codes = np.frombuffer(s.encode().translate(_CODE_TT, _CODE_DELETE),
                              dtype=np.uint8)
        code_list.append(codes)
        lens.append(codes.size)
        orig.append(len(s))
    L = _pad_to_multiple((max(lens) if lens else 1) + 2)
    padded = np.zeros((len(seqs), L), dtype=np.int8)
    for i, codes in enumerate(code_list):
        padded[i, : codes.size] = codes
    return padded, np.asarray(lens, dtype=np.int32), np.asarray(orig, dtype=np.int32)


def pack_contigs(seqs: Sequence[str]) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side: sequences → ``(packed (B, L//4) uint8, n_codes, orig_lens)``
    — the fused-scorer input, equal to ``pack_codes(seqs_to_code_batch(...))``.

    Uses the native one-scan ASCII→2-bit packer when available (~6× the
    translate+slice Python path, which was the measured host-side bound
    of the scoring bench); falls back to the Python path otherwise.
    """
    from palace_tpu.io.fastq_native import packer_lib

    lib = packer_lib()
    if lib is None or not seqs:
        codes, n_codes, lens = seqs_to_code_batch(seqs)
        return pack_codes(codes), n_codes, lens
    import ctypes

    bufs = [s.encode() for s in seqs]
    n = len(bufs)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(b) for b in bufs], out=offsets[1:])
    data = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    n_codes = np.zeros(n, dtype=np.int32)
    dptr = data.ctypes.data_as(ctypes.c_void_p)
    optr = offsets.ctypes.data_as(ctypes.c_void_p)
    lib.fqc_count_codes(dptr, optr, n, n_codes.ctypes.data_as(ctypes.c_void_p))
    # identical padded width to the Python path → same jit cache keys
    L = _pad_to_multiple((int(n_codes.max()) if n_codes.size else 1) + 2)
    packed = np.zeros((n, L // 4), dtype=np.uint8)
    lib.fqc_pack_codes(dptr, optr, n_codes.ctypes.data_as(ctypes.c_void_p),
                       n, L // 4, packed.ctypes.data_as(ctypes.c_void_p), 4)
    orig = np.asarray([len(s) for s in seqs], dtype=np.int32)
    return packed, n_codes, orig


def pack_codes(codes: np.ndarray) -> np.ndarray:
    """Host-side: (B, L) int8 base codes (L % 4 == 0) → (B, L//4) uint8,
    4 bases per byte little-endian — 16× less host→device traffic than
    the int32 3-mer locs this replaces."""
    c = codes.astype(np.uint8)
    return c[:, 0::4] | (c[:, 1::4] << 2) | (c[:, 2::4] << 4) | (c[:, 3::4] << 6)


def unpack_codes(packed: jnp.ndarray) -> jnp.ndarray:
    """Device-side inverse of ``pack_codes``: (B, P) uint8 → (B, 4P) int32."""
    p = packed.astype(jnp.int32)
    parts = jnp.stack([(p >> (2 * i)) & 3 for i in range(4)], axis=2)
    return parts.reshape(p.shape[0], p.shape[1] * 4)


def features_from_packed(packed: jnp.ndarray, n_codes: jnp.ndarray,
                         seq_lens: jnp.ndarray) -> jnp.ndarray:
    """Device-side fused encode from 2-bit-packed base codes."""
    return features_from_codes(unpack_codes(packed), n_codes, seq_lens)


def locs_from_codes(codes: jnp.ndarray, n_codes: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side: (B, L) int8 base codes → (B, L-2) int32 3-mer codes
    + (B,) valid-loc counts.  Matches ``seq_to_kmer_locs`` exactly."""
    c = codes.astype(jnp.int32)
    locs = c[:, :-2] * 16 + c[:, 1:-1] * 4 + c[:, 2:]
    n_locs = jnp.maximum(n_codes - (K - 1), 0)
    return locs, n_locs


def features_from_codes(codes: jnp.ndarray, n_codes: jnp.ndarray,
                        seq_lens: jnp.ndarray) -> jnp.ndarray:
    """Device-side fused encode: int8 base codes → (B, 12288) features.
    Traceable (jit-safe); composes into a single-dispatch scorer."""
    locs, n_locs = locs_from_codes(codes, n_codes)
    return transition_features(locs, n_locs, seq_lens)


def encode_batch(seqs: Sequence[str]) -> jnp.ndarray:
    """Encode a batch of sequences into (B, 12288) features on device."""
    codes, n_codes, orig = seqs_to_code_batch(seqs)
    return features_from_codes(jnp.asarray(codes), jnp.asarray(n_codes),
                               jnp.asarray(orig))


def encode_sequences(seqs: Iterable[str], batch_size: int = 64) -> np.ndarray:
    """Bucketless streaming encode; returns stacked (N, 12288) on host."""
    out: List[np.ndarray] = []
    chunk: List[str] = []
    for s in seqs:
        chunk.append(s)
        if len(chunk) == batch_size:
            out.append(np.asarray(encode_batch(chunk)))
            chunk = []
    if chunk:
        out.append(np.asarray(encode_batch(chunk)))
    if not out:
        return np.zeros((0, FEATURE_DIM), dtype=np.float32)
    return np.concatenate(out, axis=0)


def reference_matrix_encoding(seq: str, k: int = K) -> np.ndarray:
    """Pure-numpy oracle with the reference's exact per-sequence loop
    (encode.pyx:41-55); used by tests to pin down parity."""
    seq = seq.upper()
    length = len(seq)
    codes = _BASE_LUT[np.frombuffer(seq.encode(), dtype=np.uint8)]
    codes = codes[codes != 255].astype(np.int64)
    if codes.size >= k:
        locs = [int("".join(str(c) for c in codes[i : i + k]), 4) for i in range(codes.size - k + 1)]
    else:
        locs = []
    feats = []
    for d in GAPS:
        m = np.zeros((NUM_CODES, NUM_CODES), dtype=np.float64)
        for i in range(0, len(locs) - k - d):
            m[locs[i], locs[i + k + d]] += 1
        feats.append(m.flatten())
    feature = np.hstack(feats)
    return feature / (length * 1.0) * 100
