"""Golden-file unit tests for the IO data contracts (SURVEY.md §4)."""
import os

import pytest

from palace_tpu.config import PalaceConfig, parse_kv_file
from palace_tpu.io.blast import read_outfmt6
from palace_tpu.io.fasta import (
    FastaIndex,
    FastaStore,
    build_fai,
    iter_fasta,
    iter_fastq,
    reverse_complement,
    write_fasta,
)
from palace_tpu.io.fastg import fastg_to_node_fasta, parse_fastg_pairs
from palace_tpu.io.graph_io import parse_graph_file, write_graph_file
from palace_tpu.io.paths_io import (
    iter_path_lines,
    oriented_tokens,
    parse_spades_paths,
    remove_duplicate_pairs,
    reverse_flip,
    split_concatenated_path,
)
from palace_tpu.pipeline.stages import Stage, StageRunner


def test_reverse_complement():
    assert reverse_complement("ACGT") == "ACGT"
    assert reverse_complement("AACG") == "CGTT"
    assert reverse_complement("acgtn") == "nacgt"


def test_fasta_roundtrip(tmp_path):
    fa = tmp_path / "x.fasta"
    records = [("a", "ACGTACGT"), ("b_long_name extra", "GGGG")]
    write_fasta(fa, [("a", "ACGTACGT"), ("b_long_name", "GGGG")])
    got = list(iter_fasta(fa))
    assert got == [("a", "ACGTACGT"), ("b_long_name", "GGGG")]


def test_fai_and_store(tmp_path):
    fa = tmp_path / "x.fasta"
    seq_a = "ACGTACGTAA" * 13
    seq_b = "TTGGCCAA"
    with open(fa, "w") as fh:
        fh.write(">a desc\n")
        for i in range(0, len(seq_a), 60):
            fh.write(seq_a[i : i + 60] + "\n")
        fh.write(">b\n" + seq_b + "\n")
    idx = build_fai(fa)
    assert idx.by_name["a"].length == len(seq_a)
    assert idx.by_name["b"].length == len(seq_b)
    assert idx.name_by_row(1) == "a"
    assert idx.name_by_row(2) == "b"

    store = FastaStore(fa)
    assert store.fetch("a") == seq_a
    assert store.fetch("b") == seq_b
    assert store.fetch_oriented("b-") == reverse_complement(seq_b)
    assert store.fetch_oriented("b+") == seq_b
    # fallback name handling (make_fa_from_path.py:36-39)
    assert store.fetch_oriented("b_1+") == seq_b
    store.close()


def test_fastq_gz(tmp_path):
    import gzip

    fq = tmp_path / "r.fastq.gz"
    with gzip.open(fq, "wt") as fh:
        fh.write("@r1/1 extra\nACGT\n+\nIIII\n@r2\nGGTT\n+\nIIII\n")
    got = list(iter_fastq(fq))
    assert got == [("r1", "ACGT", "IIII"), ("r2", "GGTT", "IIII")]


def test_graph_roundtrip(tmp_path):
    p = tmp_path / "g.txt"
    with open(p, "w") as fh:
        fh.write("SEG EDGE_1_length_100_cov_5.5 12.5 2\n")
        fh.write("SEG EDGE_2_length_50_cov_3.3 6.1 1 0 0.913 1\n")
        fh.write("JUNC EDGE_1_length_100_cov_5.5 + EDGE_2_length_50_cov_3.3 - 9 1\n")
    g = parse_graph_file(p)
    assert g.segs["EDGE_1_length_100_cov_5.5"].copy_number == 2
    assert g.segs["EDGE_2_length_50_cov_3.3"].score == "0.913"
    assert g.segs["EDGE_2_length_50_cov_3.3"].contig_length() == 50
    assert g.juncs[0].support == 9

    out = tmp_path / "g2.txt"
    write_graph_file(out, g)
    g2 = parse_graph_file(out)
    assert g2.segs.keys() == g.segs.keys()
    assert g2.juncs[0].to_line() == g.juncs[0].to_line()

    adj = g.adjacency_with_conjugates()
    assert "EDGE_2_length_50_cov_3.3-" in adj["EDGE_1_length_100_cov_5.5+"]
    # conjugate edge: (B,+) -> (A,-)
    assert "EDGE_1_length_100_cov_5.5-" in adj["EDGE_2_length_50_cov_3.3+"]


def test_path_lines(tmp_path):
    p = tmp_path / "r.txt"
    with open(p, "w") as fh:
        fh.write("iter 1\nA+\tB-\nself\nC+\nD-\tE+\n")
    lines = list(iter_path_lines(p))
    assert [l.marker for l in lines] == ["iter", "self", None]
    assert lines[0].tokens == ["A+", "B-"]
    assert lines[0].names() == ["A", "B"]
    assert reverse_flip(["A+", "B-"]) == ["B+", "A-"]
    assert oriented_tokens("A+B-C+") == ["A+", "B-", "C+"]
    assert split_concatenated_path("A+B-") == ["A+", "B-"]


def test_remove_duplicate_pairs(tmp_path):
    src = tmp_path / "c.txt"
    with open(src, "w") as fh:
        fh.write("iter 1\nA+\tB-\niter 1\nA+\tB-\niter 2\nC+\n")
    dst = tmp_path / "c2.txt"
    remove_duplicate_pairs(src, dst)
    assert open(dst).read() == "iter 1\nA+\tB-\niter 2\nC+\n"


def test_spades_paths(tmp_path):
    p = tmp_path / "contigs.paths"
    with open(p, "w") as fh:
        fh.write("NODE_1_length_100_cov_5\n1+,2-;\n3+\nNODE_1_length_100_cov_5'\n3-\n")
    recs = parse_spades_paths(p)
    assert len(recs) == 2
    assert recs[0].segments == [["1+", "2-"], ["3+"]]


def test_fastg(tmp_path):
    fastg = tmp_path / "a.fastg"
    with open(fastg, "w") as fh:
        fh.write(">EDGE_1_length_4_cov_1:EDGE_2_length_4_cov_1';\nACGT\n")
        fh.write(">EDGE_1_length_4_cov_1':EDGE_2_length_4_cov_1;\nACGT\n")
        fh.write(">EDGE_2_length_4_cov_1;\nGGTT\n")
    out = tmp_path / "nodes.fasta"
    n = fastg_to_node_fasta(fastg, out)
    assert n == 2
    d = dict(iter_fasta(out))
    assert d["EDGE_1_length_4_cov_1"] == "ACGT"

    # fai-style pair parsing: use header column as first field
    fai = tmp_path / "a.fastg.fai"
    with open(fai, "w") as fh:
        fh.write("EDGE_1_length_4_cov_1:EDGE_2_length_4_cov_1';\t4\t0\t4\t5\n")
    pairs = parse_fastg_pairs(fai)
    assert ("EDGE_1_length_4_cov_1", "EDGE_2_length_4_cov_1", "+", "-") in pairs
    # positional flip (generate_graph.cpp:160-164)
    assert ("EDGE_2_length_4_cov_1", "EDGE_1_length_4_cov_1", "-", "+") in pairs


def test_blast_layouts(tmp_path):
    p = tmp_path / "x.blast"
    with open(p, "w") as fh:
        fh.write("q1\ts1\t99.0\t100\t1\t0\t1\t100\t200\t101\t1e-10\t180\t150\t5000\n")
    hit_a = next(read_outfmt6(p, layout="a"))
    assert hit_a.length == 100 and hit_a.qlen == 150 and hit_a.slen == 5000
    assert hit_a.s_lo == 101 and hit_a.s_hi == 200 and not hit_a.plus_strand

    pb = tmp_path / "y.blast"
    with open(pb, "w") as fh:
        fh.write("q1\ts1\t99.0\t150\t5000\t100\t1\t0\t1\t100\t200\t101\t1e-10\t180\n")
    hit_b = next(read_outfmt6(pb, layout="b"))
    assert hit_b.qlen == 150 and hit_b.slen == 5000 and hit_b.length == 100
    assert hit_b.s_lo == 101 and not hit_b.plus_strand


def test_config(tmp_path):
    cfg_file = tmp_path / "config.txt"
    with open(cfg_file, "w") as fh:
        fh.write("#comment\nfastq1=/x/1.fq\nfastq2=/x/2.fq\nphagedb=/x/db.fa\n")
        fh.write("protein_db=/x/prot\ngcn_model=/x/m.pt\nout_dir=out\nprefix=demo\n")
        fh.write("threads=8\nMIN_LEN=10000\n")
    kv = parse_kv_file(cfg_file)
    assert kv["fastq1"] == "/x/1.fq"
    cfg = PalaceConfig.from_file(cfg_file)
    assert cfg.prefix == "demo"
    assert cfg.min_len == 10000
    assert cfg.threads == 8
    assert cfg.kmer.k == 32 and cfg.kmer.window == 500
    problems = cfg.validate(check_files=True)
    assert any("not found" in p for p in problems)
    assert not cfg.validate(check_files=False)

    missing = PalaceConfig()
    assert any("fastq1" in p for p in missing.validate(check_files=False))


def test_config_score_group_keys():
    cfg = PalaceConfig.from_dict(
        {"score_fuse_k": "4", "score_dtype": "bfloat16",
         "score_batch_size": "128"})
    assert cfg.score.fuse_k == 4
    assert cfg.score.dtype == "bfloat16"
    assert cfg.score.batch_size == 128


def test_stage_runner(tmp_path):
    out = tmp_path / "artifact.txt"
    calls = []

    def produce():
        calls.append(1)
        out.write_text("data")

    runner = StageRunner()
    stage = Stage(name="demo", run=produce, outputs=[out])
    r1 = runner.run(stage)
    assert not r1.skipped and calls == [1]
    r2 = runner.run(stage)
    assert r2.skipped and calls == [1]  # checkpoint skip (palace:140-149)

    forced = StageRunner(force=True)
    forced.run(stage)
    assert calls == [1, 1]
