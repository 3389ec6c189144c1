"""Build/invoke the native C++ BAM runtime (native/bamgraph.cpp).

The reference's graph builder and depth pass are native C++ (htslib /
samtools); ours is the self-contained ``palace_native`` binary, built
on demand with make.  When the toolchain is unavailable the pipeline
falls back to the pure-Python implementations in
palace_tpu.graph.{builder,depth} (identical semantics, tested
against each other).
"""
from __future__ import annotations

import os
import shutil
import subprocess
from pathlib import Path
from typing import Optional

from palace_tpu import _native
from palace_tpu.utils.logging import get_logger

logger = get_logger("palace")


def ensure_native_binary(rebuild: bool = False) -> Optional[Path]:
    """Return the binary path — installed package-data, $PALACE_NATIVE_DIR,
    or a dev-tree build (making it on demand); None when unavailable."""
    path, src = _native.find_artifact("palace_native")
    if path is not None and not rebuild:
        return path
    if src is None:
        logger.warning("palace_native not installed; using pure-Python BAM path")
        return None
    if shutil.which("make") is None or shutil.which("g++") is None:
        logger.warning("No C++ toolchain; falling back to pure-Python BAM path")
        return None
    try:
        subprocess.run(
            ["make", "-C", str(src)],
            check=True,
            capture_output=True,
            text=True,
        )
    except subprocess.CalledProcessError as e:
        logger.warning("native build failed, using Python fallback:\n%s", e.stderr)
        return None
    path, _ = _native.find_artifact("palace_native")
    return path


def native_graph(bam: str | Path, fastg_fai: str | Path, out: str | Path,
                 avg_depth: float) -> bool:
    binary = ensure_native_binary()
    if binary is None:
        return False
    subprocess.run(
        [str(binary), "graph", str(bam), str(fastg_fai), str(out), str(avg_depth)],
        check=True,
    )
    return True


def native_depth(bam: str | Path, out: str | Path) -> bool:
    binary = ensure_native_binary()
    if binary is None:
        return False
    subprocess.run([str(binary), "depth", str(bam), str(out)], check=True)
    return True


def build_graph(bam: str | Path, fastg_fai: str | Path, out: str | Path,
                avg_depth: float, prefer_native: bool = True) -> None:
    """Graph stage entry point: native fast path with Python fallback."""
    if prefer_native and native_graph(bam, fastg_fai, out, avg_depth):
        return
    from palace_tpu.graph.builder import build_graph_from_bam, write_graph_output

    graph = build_graph_from_bam(bam, fastg_fai, avg_depth)
    write_graph_output(out, graph)


def compute_depth_file(bam: str | Path, out: str | Path,
                       prefer_native: bool = True) -> None:
    """Depth stage entry point: native fast path with Python fallback."""
    if prefer_native and native_depth(bam, out):
        return
    from palace_tpu.graph.depth import compute_depth

    compute_depth(bam).write_text(out)
