"""End-to-end golden test: the synthetic demo (circular + linear phage)
must reconstruct BOTH planted genomes exactly (modulo the reference
format's 50-N joints between contigs, make_final_fa.py:93-135)."""
import re
import sys
from pathlib import Path

import numpy as np
import pytest

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
