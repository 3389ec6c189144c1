"""Locator for the native host runtime artifacts.

The C++ runtime (``palace_native`` BAM/graph binary, ``libfastqcodec.so``
FASTQ loader — TPU-side equivalents of the reference's bin/generate_graph.cpp
and the pthread FASTQ splitting of bin/extract_ref.cpp:1267-1329) can live
in three places, resolved in order:

1. ``$PALACE_NATIVE_DIR`` — explicit override;
2. this package directory — where wheels install the built artifacts
   (declared as package-data; setup.py's build hook copies them here);
3. the repo-root ``native/`` source tree — a development checkout, where
   callers may also (re)build with make.

Resolution returns the path plus whether an on-demand make is possible
(only in a source tree)."""
from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Tuple

_PKG_DIR = Path(__file__).resolve().parent
_REPO_NATIVE = _PKG_DIR.parent.parent / "native"


def source_dir() -> Optional[Path]:
    """The buildable native/ source directory, if this is a dev checkout."""
    return _REPO_NATIVE if (_REPO_NATIVE / "Makefile").exists() else None


def find_artifact(name: str) -> Tuple[Optional[Path], Optional[Path]]:
    """Resolve a native artifact by file name.

    Returns ``(path, buildable_dir)``: ``path`` is the first existing
    candidate (or None), ``buildable_dir`` is the make-able source dir to
    build into when the artifact is missing (or None in installed wheels).
    """
    env = os.environ.get("PALACE_NATIVE_DIR")
    candidates = []
    if env:
        candidates.append(Path(env) / name)
    candidates.append(_PKG_DIR / name)
    src = source_dir()
    if src is not None:
        candidates.append(src / name)
    for c in candidates:
        if c.exists():
            return c, src
    return None, src
