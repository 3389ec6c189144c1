"""Matching-mode sensitivity analysis (VERDICT r4 weak #5 / item 8).

``bin/matching`` is absent upstream, so our solver's ``-s`` semantics
are an invention (PARITY.md D8).  This test quantifies how much of the
FINAL pipeline product depends on those invented details: the demo e2e
runs under three solver modes —

  auto       : r5 default (per-component exact blossom)
  handshake  : forced ``--no-exact`` (mutual-best + abstention, the
               r4 behaviour)
  aggressive : handshake + greedy non-mutual joins

— and both planted genomes must be reconstructed IDENTICALLY in every
mode (the mode-stable core).  The per-mode record sets are printed so
the PARITY.md sensitivity note can cite measured numbers.
"""
from __future__ import annotations

import dataclasses
import shutil
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


def _rc(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def _cyclic_eq(got, want):
    if len(got) != len(want):
        return False
    return got in want + want or _rc(got) in want + want


@pytest.fixture(scope="module")
def mode_runs(tmp_path_factory):
    import make_demo

    from palace_tpu.config import PalaceConfig
    from palace_tpu.pipeline.driver import run_pipeline

    base = tmp_path_factory.mktemp("sens")
    src_root = base / "src"
    # make_demo draws from a MODULE-level RNG stream — reset it so the
    # planted genomes match the regeneration below regardless of which
    # other test modules consumed the stream first
    make_demo.RNG = np.random.default_rng(123)
    cfg_path = make_demo.build(src_root)

    finals = {}
    for mode, (exact, aggressive) in {
        "auto": ("", 0),
        "handshake": ("0", 0),
        "aggressive": ("0", 1),
    }.items():
        root = base / mode
        shutil.copytree(src_root, root)
        cfg = PalaceConfig.from_file(root / "config.txt")
        out_dir = str(root / "output")
        cfg = dataclasses.replace(
            cfg, out_dir=out_dir, matching_exact=exact,
            matching_aggressive=aggressive)
        finals[mode] = run_pipeline(cfg)

    rng = np.random.default_rng(123)
    phage = "".join(rng.choice(list("ACGT"), size=20000))
    phage2 = "".join(rng.choice(list("ACGT"), size=14000))
    return finals, phage, phage2


def test_planted_genomes_mode_stable(mode_runs):
    """Both planted genomes reconstruct under EVERY solver mode — the
    pipeline's correctness core does not hinge on invented solver
    details."""
    from palace_tpu.io.fasta import iter_fasta

    finals, phage, phage2 = mode_runs
    per_mode = {}
    for mode, final in finals.items():
        recs = dict(iter_fasta(final))
        seqs = [s.replace("N" * 50, "") for s in recs.values()]
        assert any(_cyclic_eq(s, phage) for s in seqs), (
            f"mode {mode}: circular phage not reconstructed")
        assert any(s == phage2 or _rc(s) == phage2 for s in seqs), (
            f"mode {mode}: linear phage not reconstructed")
        per_mode[mode] = sorted(seqs)

    # sensitivity accounting for the PARITY note
    all_seqs = set().union(*[set(v) for v in per_mode.values()])
    stable = set(per_mode["auto"])
    for v in per_mode.values():
        stable &= set(v)
    print(f"\nmode-stability: {len(stable)}/{len(all_seqs)} distinct "
          f"records identical across all 3 modes; per-mode counts: "
          f"{ {m: len(v) for m, v in per_mode.items()} }")


def test_mode_record_counts_close(mode_runs):
    """No mode may explode or collapse the record count (a 2x swing
    would mean the invented semantics dominate the output)."""
    from palace_tpu.io.fasta import iter_fasta

    finals, _, _ = mode_runs
    counts = {m: len(dict(iter_fasta(f))) for m, f in finals.items()}
    lo, hi = min(counts.values()), max(counts.values())
    assert hi <= max(2 * lo, lo + 2), f"record counts diverge: {counts}"
