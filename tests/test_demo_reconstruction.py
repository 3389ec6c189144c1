"""End-to-end golden test: the synthetic demo (circular + linear phage)
must reconstruct BOTH planted genomes exactly (modulo the reference
format's 50-N joints between contigs, make_final_fa.py:93-135)."""
import re
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # demo-genome reconstruction e2e

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


def _rc(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


@pytest.fixture(scope="module")
def demo_run(tmp_path_factory):
    import make_demo

    root = tmp_path_factory.mktemp("demo")
    cfg_path = make_demo.build(root)

    from palace_tpu.config import PalaceConfig
    from palace_tpu.pipeline.driver import run_pipeline

    final = run_pipeline(PalaceConfig.from_file(cfg_path))
    # regenerate the planted genomes with make_demo's RNG stream
    rng = np.random.default_rng(123)
    phage = "".join(rng.choice(list("ACGT"), size=20000))
    phage2 = "".join(rng.choice(list("ACGT"), size=14000))
    return final, phage, phage2


@pytest.fixture(scope="module")
def hostile_run(tmp_path_factory):
    """Adversarial demo: shared copy-2 repeat, sub-MIN_COUNT chimera
    junction, just-below-threshold decoy score, 60%-shared decoy
    reference (make_demo.build_hostile)."""
    import make_demo

    root = tmp_path_factory.mktemp("hostile")
    cfg_path = make_demo.build_hostile(root)

    from palace_tpu.config import PalaceConfig
    from palace_tpu.pipeline.driver import run_pipeline

    final = run_pipeline(PalaceConfig.from_file(cfg_path))
    rng = np.random.default_rng(321)

    def seq(n):
        return "".join(rng.choice(list("ACGT"), size=n))

    repeat = seq(3000)
    a1, a2 = seq(7000), seq(8000)
    b1, b2 = seq(6000), seq(6000)
    return final, a1 + repeat + a2, b1 + repeat + b2


def _cyclic_eq(got, want):
    return want in got + got or want in _rc(got) + _rc(got)


def test_hostile_both_phages_through_shared_repeat(hostile_run):
    """The copy-2 repeat must appear in BOTH reconstructed genomes with
    the correct flanks (no A1-R-B2 chimera), despite the equal-weight
    junction tie at R's ends."""
    from palace_tpu.io.fasta import iter_fasta

    final, phage_a, phage_b = hostile_run
    recs = dict(iter_fasta(final))
    assert len(recs) == 2, sorted(recs)
    bodies = [re.sub("N+", "", s) for s in recs.values()]
    by_len = {len(b): b for b in bodies}
    assert set(by_len) == {18000, 15000}
    assert _cyclic_eq(by_len[18000], phage_a)
    assert _cyclic_eq(by_len[15000], phage_b)


def test_hostile_graph_artifacts(hostile_run):
    """Cascade internals: the sub-MIN_COUNT junction is dropped, the
    repeat carries copy number 2, the 0.69-score decoy stays out of the
    filtered graph, and eref does not report the 60%-shared decoy ref."""
    final, _, _ = hostile_run
    out = final.parent.parent  # .../output/final_result/... → output/

    graph = (out / "04-match" / "demo_graph.txt").read_text()
    # chimera bait A2→B1 had support 3 < MIN_COUNT=5
    for line in graph.splitlines():
        if line.startswith("JUNC"):
            assert not ("EDGE_2_length_8000" in line
                        and "EDGE_5_length_6000" in line), line
    seg_r = [l for l in graph.splitlines()
             if l.startswith("SEG") and "EDGE_7_length_3000" in l]
    assert len(seg_r) == 1 and seg_r[0].split()[3] == "2", seg_r

    filtered = (out / "04-match" / "demo_filtered_graph.txt").read_text()
    assert "EDGE_9_length_5000" not in filtered  # score 0.69 < 0.7 gate

    ref_names = (out / "03-search" / "demo_ref_names.txt").read_text()
    picked = (out / "03-search" / "demo_ref_percent.txt").read_text()
    assert "decoyShared" not in picked and "decoyRand" not in picked
    assert "phageA" in picked and "phageB" in picked
    assert ref_names.count("ref_index") == 2


def test_both_phages_reconstructed(demo_run):
    from palace_tpu.io.fasta import iter_fasta

    final, phage, phage2 = demo_run
    recs = dict(iter_fasta(final))
    assert set(recs) == {"demo_phage_1_cycle", "demo_phage_2_linear"}

    cyc = re.sub("N+", "", recs["demo_phage_1_cycle"])
    assert len(cyc) == len(phage)
    # O(n) cyclic equality: a rotation of cyc ⇔ substring of cyc+cyc
    assert phage in cyc + cyc or phage in _rc(cyc) + _rc(cyc)

    lin = re.sub("N+", "", recs["demo_phage_2_linear"])
    assert lin == phage2 or _rc(lin) == phage2
