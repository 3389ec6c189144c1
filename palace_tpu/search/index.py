"""Phage reference k-mer index.

Equivalent of the reference's ``.k32.index.dat`` (extract_ref.cpp
read_ref :652-811: per reference, 3 canonical u32 hashes per position,
hash 0 for windows containing non-ACGT).  Differences by design:

* the coder permutation comes from a fixed seed (config
  ``kmer.coder_seed``) instead of ``time(0)`` so index builds are
  reproducible (SURVEY.md §7 hard part b);
* stored as a memory-mappable ``.npy`` (hashes) + ``.npz`` (meta)
  pair instead of a bespoke binary stream;
* reference indices are the 1-based FASTA record number — the
  interpretation get_ref_by_index.py:40-49 applies to the reference's
  output (identical when no record is shorter than k, which is the
  only regime where the reference's own numbering is self-consistent).

Hash computation runs on device in fixed-size tiles with k−1 overlap,
so multi-Mbp references stream through without dynamic shapes.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from palace_tpu.io.fasta import iter_fasta
from palace_tpu.ops.kmer import kmer_hashes, make_choose_coder, seq_to_codes
from palace_tpu.utils.logging import get_logger
from palace_tpu.utils.timers import StageTimer

logger = get_logger("palace")

TILE = 1 << 18  # 256 kb of reference per device batch


@dataclass
class PhageIndex:
    k: int
    perm: np.ndarray            # (k, 3)
    names: List[str]
    lengths: np.ndarray         # (R,) int64 reference lengths
    offsets: np.ndarray         # (R+1,) int64 row offsets into hashes
    hashes: np.ndarray          # (total_rows, 3) uint32 (may be a memmap)

    def ref_hashes(self, r: int) -> np.ndarray:
        return self.hashes[self.offsets[r] : self.offsets[r + 1]]

    @property
    def n_refs(self) -> int:
        return len(self.names)


def _hash_paths(fasta_path: str | Path, k: int) -> Tuple[Path, Path]:
    base = Path(str(fasta_path) + f".k{k}.palace")
    return Path(str(base) + ".hash.npy"), Path(str(base) + ".meta.npz")


def compute_hashes_for_seq(seq: str, perm: np.ndarray, k: int) -> np.ndarray:
    """Canonical (M, 3) hashes for one sequence, tiled on device;
    invalid windows → 0 (extract_ref.cpp:793-796)."""
    codes = seq_to_codes(seq)
    L = codes.shape[0]
    M = L - k + 1
    if M <= 0:
        return np.zeros((0, 3), np.uint32)
    perm_j = jnp.asarray(perm)
    chunks = []
    step = TILE
    for start in range(0, M, step):
        stop = min(start + step, M)
        tile = codes[start : stop + k - 1][None, :]
        h, valid = kmer_hashes(jnp.asarray(tile), perm_j, k)
        h = np.array(h[0])  # writable copy off-device
        valid = np.asarray(valid[0])
        h[~valid] = 0
        chunks.append(h)
    return np.concatenate(chunks, axis=0)


def build_index(
    fasta_path: str | Path, k: int = 32, coder_seed: int = 1, save: bool = True
) -> PhageIndex:
    perm = make_choose_coder(k, coder_seed)
    names: List[str] = []
    lengths: List[int] = []
    offsets: List[int] = [0]
    parts: List[np.ndarray] = []
    with StageTimer("eref.index_build", unit="refs"):
        for name, seq in iter_fasta(fasta_path):
            names.append(name)
            lengths.append(len(seq))
            h = compute_hashes_for_seq(seq, perm, k)
            parts.append(h)
            offsets.append(offsets[-1] + h.shape[0])
    hashes = (
        np.concatenate(parts, axis=0) if parts else np.zeros((0, 3), np.uint32)
    )
    index = PhageIndex(
        k=k,
        perm=perm,
        names=names,
        lengths=np.asarray(lengths, np.int64),
        offsets=np.asarray(offsets, np.int64),
        hashes=hashes,
    )
    if save:
        save_index(fasta_path, index)
    return index


def save_index(fasta_path: str | Path, index: PhageIndex) -> None:
    hash_path, meta_path = _hash_paths(fasta_path, index.k)
    np.save(hash_path, index.hashes)
    np.savez(
        meta_path,
        k=np.int64(index.k),
        perm=index.perm,
        names=np.asarray(index.names),
        lengths=index.lengths,
        offsets=index.offsets,
    )
    logger.info("Saved k-mer index: %s (%d refs, %d rows)",
                hash_path, index.n_refs, index.hashes.shape[0])


def load_index(fasta_path: str | Path, k: int = 32) -> Optional[PhageIndex]:
    hash_path, meta_path = _hash_paths(fasta_path, k)
    if not (hash_path.exists() and meta_path.exists()):
        return None
    meta = np.load(meta_path, allow_pickle=False)
    hashes = np.load(hash_path, mmap_mode="r")
    return PhageIndex(
        k=int(meta["k"]),
        perm=np.asarray(meta["perm"]),
        names=[str(n) for n in meta["names"]],
        lengths=np.asarray(meta["lengths"]),
        offsets=np.asarray(meta["offsets"]),
        hashes=hashes,
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
