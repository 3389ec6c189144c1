"""Phage reference k-mer index.

Equivalent of the reference's ``.k32.index.dat`` (extract_ref.cpp
read_ref :652-811: per reference, 3 canonical u32 hashes per position,
hash 0 for windows containing non-ACGT).  Differences by design:

* the coder permutation comes from a fixed seed (config
  ``kmer.coder_seed``) instead of ``time(0)`` so index builds are
  reproducible (SURVEY.md §7 hard part b);
* the index stores 2-bit-packed base codes + a 1-bit invalid mask
  (~0.28 B/base) instead of the reference's 12 B/position hash
  stream — 43× smaller, so a whole phage DB stays resident in device
  HBM and Phase B ships no per-reference data at all; the 3-coder
  hashes are recomputed on device inside the fused scan (they are
  cheap VPU work, extract_ref.cpp:858-870's table gather is the real
  cost and that stays on device too);
* index *build* is pure host byte-packing — no device round-trips —
  so it is O(DB bytes) with a tiny constant;
* reference indices are the 1-based FASTA record number — the
  interpretation get_ref_by_index.py:40-49 applies to the reference's
  output (identical when no record is shorter than k, which is the
  only regime where the reference's own numbering is self-consistent).

``ref_hashes(r)`` (the old per-reference hash materialisation) is kept
for oracle tests and the mesh-sharded lookup path.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from palace_tpu.io.fasta import iter_fasta
from palace_tpu.ops.kmer import (
    kmer_hashes,
    make_choose_coder,
    pack_codes_mask,
    seq_to_codes,
)
from palace_tpu.utils.logging import get_logger
from palace_tpu.utils.timers import StageTimer

logger = get_logger("palace")

TILE = 1 << 18  # 256 kb of reference per device batch (ref_hashes only)


@dataclass
class PhageIndex:
    k: int
    perm: np.ndarray            # (k, 3)
    names: List[str]
    lengths: np.ndarray         # (R,) int64 reference lengths
    code_offsets: np.ndarray    # (R+1,) int64 byte offsets into ``packed``
    mask_offsets: np.ndarray    # (R+1,) int64 byte offsets into ``maskbits``
    packed: np.ndarray          # flat uint8: 4 bases/byte, refs byte-aligned
    maskbits: np.ndarray        # flat uint8: 8 positions/byte invalid bits

    @property
    def n_refs(self) -> int:
        return len(self.names)

    def ref_codes(self, r: int) -> np.ndarray:
        """(L,) uint8 base codes 0..4 of reference ``r`` (host unpack)."""
        L = int(self.lengths[r])
        pb = self.packed[self.code_offsets[r] : self.code_offsets[r + 1]]
        mb = self.maskbits[self.mask_offsets[r] : self.mask_offsets[r + 1]]
        codes = np.empty(pb.shape[0] * 4, dtype=np.uint8)
        for i in range(4):
            codes[i::4] = (pb >> (2 * i)) & 3
        inv = np.unpackbits(mb, bitorder="little")[: codes.shape[0]].astype(bool)
        codes[inv] = 4
        return codes[:L]

    def ref_hashes(self, r: int) -> np.ndarray:
        """(M, 3) canonical hashes of reference ``r`` (computed on
        demand, device-tiled; invalid windows → 0)."""
        return compute_hashes_for_codes(self.ref_codes(r), self.perm, self.k)


def _index_path(fasta_path: str | Path, k: int) -> Path:
    return Path(str(fasta_path) + f".k{k}.palace.npz")


def perm_from_reference_index(index_dat: str | Path, k: int = 32) -> np.ndarray:
    """Extract the coder permutation from a reference ``.k32.index.dat``.

    The reference persists ``choose_coder`` as the first 100 "u32"
    header entries (extract_ref.cpp:680-682) — each 4-byte write starts
    at ``&choose_coder[j]`` of a ``short[100]``, so entry j carries
    choose_coder[j] in its low 16 bits (saved_random_coder :1104-1122
    reads them back with the same truncation).  Lets this engine search
    with byte-compatible hashes against an index the reference built.
    """
    raw = np.fromfile(index_dat, dtype="<u4", count=100)
    if raw.shape[0] < 100:
        raise ValueError(f"{index_dat}: truncated header ({raw.shape[0]} < 100 u32)")
    shorts = (raw & 0xFFFF).astype(np.int32)
    perm = shorts[: k * 3].reshape(k, 3)
    if perm.min() < 0 or perm.max() > 2:
        raise ValueError(f"{index_dat}: header is not a coder permutation")
    return perm


def iter_reference_index_records(index_dat: str | Path, k: int = 32):
    """Yield ``(ref_len, hashes (ref_len-k+1, 3) uint32)`` per record of
    a reference-format index (read_index framing, extract_ref.cpp:
    841-878: u32 ref_len then (ref_len-k+1)*3 u32 canonical hashes).
    Records exist only for references longer than k (read_ref :698)."""
    with open(index_dat, "rb") as fh:
        fh.seek(400)  # 100-u32 choose_coder header
        while True:
            head = fh.read(4)
            if len(head) < 4:
                return
            ref_len = int(np.frombuffer(head, dtype="<u4")[0])
            m = ref_len - k + 1
            data = np.fromfile(fh, dtype="<u4", count=m * 3)
            if data.shape[0] < m * 3:
                return
            yield ref_len, data.reshape(m, 3)


def compute_hashes_for_codes(codes: np.ndarray, perm: np.ndarray, k: int) -> np.ndarray:
    """Canonical (M, 3) hashes for one code sequence, tiled on device;
    invalid windows → 0 (extract_ref.cpp:793-796)."""
    L = codes.shape[0]
    M = L - k + 1
    if M <= 0:
        return np.zeros((0, 3), np.uint32)
    perm_j = jnp.asarray(perm)
    chunks = []
    for start in range(0, M, TILE):
        stop = min(start + TILE, M)
        tile = codes[start : stop + k - 1][None, :]
        h, valid = kmer_hashes(jnp.asarray(tile), perm_j, k)
        h = np.array(h[0])  # writable copy off-device
        valid = np.asarray(valid[0])
        h[~valid] = 0
        chunks.append(h)
    return np.concatenate(chunks, axis=0)


def compute_hashes_for_seq(seq: str, perm: np.ndarray, k: int) -> np.ndarray:
    return compute_hashes_for_codes(seq_to_codes(seq), perm, k)


def build_index(
    fasta_path: str | Path,
    k: int = 32,
    coder_seed: int = 1,
    save: bool = True,
    perm: Optional[np.ndarray] = None,
) -> PhageIndex:
    """Build the packed index.  ``perm`` overrides the seeded coder
    permutation — pass ``perm_from_reference_index(...)`` to search
    hash-compatibly with an index the reference binary built."""
    if perm is None:
        perm = make_choose_coder(k, coder_seed)
    names: List[str] = []
    lengths: List[int] = []
    code_offsets: List[int] = [0]
    mask_offsets: List[int] = [0]
    packed_parts: List[np.ndarray] = []
    mask_parts: List[np.ndarray] = []
    with StageTimer("eref.index_build", unit="refs"):
        for name, seq in iter_fasta(fasta_path):
            names.append(name)
            lengths.append(len(seq))
            codes = seq_to_codes(seq)
            pad = (-codes.shape[0]) % 8
            if pad:
                codes = np.pad(codes, (0, pad), constant_values=4)
            pb, mb = pack_codes_mask(codes[None, :])
            packed_parts.append(pb[0])
            mask_parts.append(mb[0])
            code_offsets.append(code_offsets[-1] + pb.shape[1])
            mask_offsets.append(mask_offsets[-1] + mb.shape[1])
    index = PhageIndex(
        k=k,
        perm=perm,
        names=names,
        lengths=np.asarray(lengths, np.int64),
        code_offsets=np.asarray(code_offsets, np.int64),
        mask_offsets=np.asarray(mask_offsets, np.int64),
        packed=(np.concatenate(packed_parts) if packed_parts
                else np.zeros(0, np.uint8)),
        maskbits=(np.concatenate(mask_parts) if mask_parts
                  else np.zeros(0, np.uint8)),
    )
    if save:
        save_index(fasta_path, index)
    return index


def save_index(fasta_path: str | Path, index: PhageIndex) -> None:
    path = _index_path(fasta_path, index.k)
    np.savez(
        path,
        k=np.int64(index.k),
        perm=index.perm,
        names=np.asarray(index.names),
        lengths=index.lengths,
        code_offsets=index.code_offsets,
        mask_offsets=index.mask_offsets,
        packed=index.packed,
        maskbits=index.maskbits,
    )
    logger.info("Saved k-mer index: %s (%d refs, %d bytes packed)",
                path, index.n_refs, index.packed.shape[0])


def load_index(fasta_path: str | Path, k: int = 32) -> Optional[PhageIndex]:
    path = _index_path(fasta_path, k)
    if not path.exists():
        return None
    meta = np.load(path, allow_pickle=False)
    return PhageIndex(
        k=int(meta["k"]),
        perm=np.asarray(meta["perm"]),
        names=[str(n) for n in meta["names"]],
        lengths=np.asarray(meta["lengths"]),
        code_offsets=np.asarray(meta["code_offsets"]),
        mask_offsets=np.asarray(meta["mask_offsets"]),
        packed=np.asarray(meta["packed"]),
        maskbits=np.asarray(meta["maskbits"]),
    )


def load_or_build_index(fasta_path: str | Path, k: int = 32, coder_seed: int = 1) -> PhageIndex:
    """Cache-or-build, mirroring the reference's skip-if-index-exists
    behaviour (extract_ref.cpp:1245-1254)."""
    index = load_index(fasta_path, k)
    if index is not None:
        logger.info("Reference index is detected.")
        return index
    logger.info("Reference index not detected, start index...")
    return build_index(fasta_path, k, coder_seed)
