"""Randomized-world composition differential: N random worlds (random
phage count / contig decomposition / circular-vs-linear / decoys), each
run through BOTH arms —

  arm A: our pipeline driver
  arm B: the reference's own scripts chained as `palace` chains them
         (tests/test_reference_replay.py harness)

— asserting (1) final-FASTA agreement between the arms AND (2) ground
truth: every planted genome reconstructs (evidence is clean by
construction, so reconstruction is required, not hoped for).  This
generalises the fixed demo/hostile composition replays to arbitrary
graph shapes.
"""
from __future__ import annotations

import shutil
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

REF = Path("/root/reference/share/palace/scripts")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not REF.exists(), reason="reference tree unavailable"),
]

SEEDS = [101, 202, 303, 404, 505]


def _rc(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def _cyclic_eq(got, want):
    if len(got) != len(want):
        return False
    return got in want + want or _rc(got) in want + want


@pytest.fixture(params=SEEDS, scope="module")
def world_pair(request, tmp_path_factory):
    import make_demo

    from palace_tpu.config import PalaceConfig
    from palace_tpu.pipeline.driver import run_pipeline
    from tests.test_reference_replay import _replay_steps_4_6

    seed = request.param
    base = tmp_path_factory.mktemp(f"rand{seed}")
    ours_root = base / "ours"
    cfg_path, expected = make_demo.build_random(ours_root, seed)
    final_ours = run_pipeline(PalaceConfig.from_file(cfg_path))

    replay_root = base / "replay"
    shutil.copytree(ours_root, replay_root)
    out = replay_root / "output"
    for sub in ("04-match", "05-furth", "final_result"):
        shutil.rmtree(out / sub, ignore_errors=True)
    final_replay = _replay_steps_4_6(out, None, base / "fakebin")
    return final_ours, final_replay, expected, seed


def test_arms_agree(world_pair):
    from palace_tpu.io.fasta import iter_fasta

    final_ours, final_replay, _, seed = world_pair
    ours = dict(iter_fasta(final_ours))
    replay = dict(iter_fasta(final_replay))
    assert sorted(ours.values()) == sorted(replay.values()), (
        f"seed {seed}: final FASTA diverges\n"
        f"ours: { {k: len(v) for k, v in ours.items()} }\n"
        f"replay: { {k: len(v) for k, v in replay.items()} }")


def test_planted_genomes_reconstruct(world_pair):
    from palace_tpu.io.fasta import iter_fasta

    final_ours, _, expected, seed = world_pair
    seqs = [s.replace("N" * 50, "") for s in dict(iter_fasta(final_ours)).values()]
    for i, (genome, circular) in enumerate(expected):
        if circular:
            ok = any(_cyclic_eq(s, genome) for s in seqs)
        else:
            ok = any(s == genome or _rc(s) == genome for s in seqs)
        assert ok, (f"seed {seed}: planted phage {i} "
                    f"({'circular' if circular else 'linear'}, "
                    f"{len(genome)} bp) not reconstructed; "
                    f"record lengths: {[len(s) for s in seqs]}")
