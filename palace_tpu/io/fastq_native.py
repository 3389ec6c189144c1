"""ctypes bindings for the native FASTQ code-batch loader
(native/fastqcodec.cpp).

The eref stage's Phase A streams gigabases of reads into the device
count table (reference extract_ref.cpp:905-1008 does this with pthread
byte-range shards); Python line iteration is the host-side bottleneck,
so the parse runs in C (zlib gzread handles .gz and plain files alike)
and yields fixed-shape ``(batch, maxlen)`` uint8 code matrices — fixed
shapes also mean the jitted k-mer hash kernel compiles once.

Falls back transparently when the toolchain is unavailable:
:func:`available` is False and callers use the Python reader
(palace_tpu/search/eref.py), which implements identical semantics
(pad code 4, deterministic down-sampling, k-1-overlap splitting of
reads longer than maxlen).
"""
from __future__ import annotations

import ctypes
import shutil
import subprocess
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

from palace_tpu import _native
from palace_tpu.utils.logging import get_logger

logger = get_logger("palace")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    lib_path, src = _native.find_artifact("libfastqcodec.so")
    if lib_path is None:
        if src is None or shutil.which("make") is None or shutil.which("g++") is None:
            return None
        try:
            subprocess.run(
                ["make", "-C", str(src), "libfastqcodec.so"],
                check=True, capture_output=True, text=True,
            )
        except subprocess.CalledProcessError as e:
            logger.warning("fastqcodec build failed, using Python reader:\n%s",
                           e.stderr)
            return None
        lib_path, _ = _native.find_artifact("libfastqcodec.so")
        if lib_path is None:
            return None
    try:
        lib = ctypes.CDLL(str(lib_path))
    except OSError as e:
        logger.warning("fastqcodec load failed: %s", e)
        return None
    lib.fqc_open.restype = ctypes.c_void_p
    lib.fqc_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.fqc_next_batch.restype = ctypes.c_long
    lib.fqc_next_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int,
    ]
    lib.fqc_close.restype = None
    lib.fqc_close.argtypes = [ctypes.c_void_p]
    lib.fqc_count_bases.restype = ctypes.c_double
    lib.fqc_count_bases.argtypes = [ctypes.c_char_p]
    if hasattr(lib, "fqc_pack_codes"):  # absent in pre-r2 built artifacts
        lib.fqc_count_codes.restype = None
        lib.fqc_count_codes.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
        ]
        lib.fqc_pack_codes.restype = None
        lib.fqc_pack_codes.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_long, ctypes.c_void_p, ctypes.c_int,
        ]
    _lib = lib
    return _lib


def packer_lib() -> Optional[ctypes.CDLL]:
    """The loaded codec library iff it exports the contig batch packer
    (fqc_count_codes/fqc_pack_codes); None → use the Python packer."""
    lib = _load()
    return lib if lib is not None and hasattr(lib, "fqc_pack_codes") else None


def available() -> bool:
    return _load() is not None


def count_bases(path: str | Path) -> Optional[int]:
    """Total sequence bases of a FASTQ file, or None if native is
    unavailable / the file can't be opened."""
    lib = _load()
    if lib is None:
        return None
    n = lib.fqc_count_bases(str(path).encode())
    return None if n < 0 else int(n)


def native_batches(
    path: str | Path, batch: int, maxlen: int, ratio: int = 100, k: int = 32
) -> Iterator[np.ndarray]:
    """Yield (rows, maxlen) uint8 code matrices (rows ≤ batch; the last
    batch may be short).  Raises RuntimeError if native is unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native fastqcodec unavailable")
    h = lib.fqc_open(str(path).encode(), int(ratio), int(k))
    if not h:
        raise FileNotFoundError(path)
    try:
        while True:
            out = np.empty((batch, maxlen), dtype=np.uint8)
            n = lib.fqc_next_batch(
                h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                batch, maxlen,
            )
            if n < 0:
                raise RuntimeError(f"fastqcodec parse error on {path}")
            if n == 0:
                return
            yield out[:n]
    finally:
        lib.fqc_close(h)
