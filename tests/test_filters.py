"""Golden-file unit tests for the filter stages (SURVEY.md §4: every
stage is a pure file→file function)."""
import numpy as np
import pytest

from palace_tpu.assembly.path_fa import make_fa_from_path
from palace_tpu.filters.blast_filter import cut_end_contig, determine_strand_for_pair
from palace_tpu.filters.common_result import _reverse_string, find_most_common_result
from palace_tpu.filters.cycle_filter import filter_cycle_gene_score, filter_remain_result
from palace_tpu.filters.dedup import (
    apply_smart_quota_dedup,
    find_consecutive_repeats,
    is_similar,
    push_back_cycle_copies,
    reformat_cycle,
    smart_quota_dedup,
)
from palace_tpu.filters.final_fa import is_circular_path_fuzzy, make_final_fa
from palace_tpu.filters.gene_matches import get_hits
from palace_tpu.filters.result_filter import filter_result
from palace_tpu.filters.second_pass import (
    filter_ragtag,
    generate_second_with_blast,
    get_main_path,
    parse_remain,
)
from palace_tpu.filters.subgraph import create_sub_graphs, parse_match_file
from palace_tpu.graph.depth import DepthStore
from palace_tpu.graph.filter import filter_graph, parse_blast_covered, uniq_file
from palace_tpu.io.fasta import build_fai, reverse_complement, write_fasta
from palace_tpu.io.graph_io import parse_graph_file


def _edge(i, length, cov="5.0"):
    return f"EDGE_{i}_length_{length}_cov_{cov}"


E1 = _edge(1, 3000)
E2 = _edge(2, 5000)
E3 = _edge(3, 8000)
E4 = _edge(4, 12000)


@pytest.fixture
def assembly(tmp_path):
    """A little assembly: fasta + fai + fastg fai + contigs.paths."""
    rng = np.random.default_rng(0)
    seqs = {}
    for name in (E1, E2, E3, E4):
        L = int(name.split("_")[3])
        seqs[name] = "".join(rng.choice(list("ACGT"), size=L))
    fasta = tmp_path / "assembly_graph.fasta"
    write_fasta(fasta, list(seqs.items()))
    build_fai(fasta)
    fastg_fai = tmp_path / "assembly_graph.fastg.fai"
    with open(fastg_fai, "w") as fh:
        fh.write(f"{E1}:{E2};\t3000\t0\t80\t81\n")
        fh.write(f"{E2};\t5000\t0\t80\t81\n")
    paths = tmp_path / "contigs.paths"
    with open(paths, "w") as fh:
        fh.write("NODE_1_length_8000_cov_5\n1+,2+;\n")
    return tmp_path, fasta, fastg_fai, paths, seqs


def test_parse_blast_covered(tmp_path):
    fai_len = {E1: 3000, E2: 5000}
    blast = tmp_path / "x.blast"
    with open(blast, "w") as fh:
        # E1 vs refA: two hits at 90% identity → 1500+1000=2500/3000 > 0.7
        fh.write(f"{E1}\trefA\t90.0\t1500\t0\t0\t1\t1500\t1\t1500\t0\t100\n")
        fh.write(f"{E1}\trefA\t90.0\t1000\t0\t0\t1501\t2500\t1501\t2500\t0\t100\n")
        # E2: only 600/5000, below ratio and below 2000 → not covered
        fh.write(f"{E2}\trefA\t90.0\t600\t0\t0\t1\t600\t1\t600\t0\t100\n")
    covered = parse_blast_covered(blast, fai_len, 0.7)
    assert covered == {E1}


def test_filter_graph_seed_and_expand(assembly):
    tmp_path, fasta, fastg_fai, paths, _ = assembly
    graph_file = tmp_path / "graph.txt"
    with open(graph_file, "w") as fh:
        fh.write(f"SEG {E1} 10.5 1\nSEG {E2} 8 1\nSEG {E3} 2 1\nSEG {E4} 2 1\n")
        fh.write(f"JUNC {E1} + {E2} + 9 0\n")   # touches seed E1
        fh.write(f"JUNC {E2} + {E3} + 7 0\n")   # 1-hop via E2
        fh.write(f"JUNC {E3} + {E4} + 7 0\n")   # second expansion wave
    gene_file = tmp_path / "hit_seqs.out"
    gene_file.write_text("")  # no protein hits
    score_file = tmp_path / "node_scores.out"
    score_file.write_text(f"{E1}\t0.95\n{E2}\t0.10\n{E3}\t0.20\n{E4}\t0.10")
    blast_file = tmp_path / "a.blast"
    blast_file.write_text("")
    out = tmp_path / "filtered_pre.txt"
    hits_out = tmp_path / "all_hit_segs.txt"
    filter_graph(
        fastg_fai, graph_file, out, gene_file, score_file, blast_file,
        0.7, str(fasta) + ".fai", hits_out, paths, 0.7,
    )
    final = tmp_path / "filtered.txt"
    uniq_file(out, final)
    g = parse_graph_file(final)
    # E1 seed (score 0.95); E2 via junction; E3 via 1-hop expansion; E4 out
    assert set(g.segs) == {E1, E2, E3}
    assert g.segs[E1].score == "0.950" and g.segs[E1].is_blast == "0"
    assert len(g.juncs) == 2
    hits = open(hits_out).read()
    assert f"SAMPLE\t{E1}\tscore+" in hits


def test_make_fa_from_path(assembly):
    tmp_path, fasta, _, _, seqs = assembly
    pathfile = tmp_path / "res.txt"
    with open(pathfile, "w") as fh:
        fh.write("iter 1\n")
        fh.write(f"{E1}+\t{E2}-\n")
        fh.write("\n")
    out = tmp_path / "out.fasta"
    n = make_fa_from_path(fasta, pathfile, out, 1)
    assert n == 1
    content = open(out).read().splitlines()
    assert content[0] == f">{E1}+{E2}-"
    assert content[1] == seqs[E1] + reverse_complement(seqs[E2])

    out0 = tmp_path / "out0.fasta"
    make_fa_from_path(fasta, pathfile, out0, 0)
    assert open(out0).read().splitlines()[0] == f">res_2_{3000 + 5000}"


def test_filter_result(assembly):
    tmp_path, fasta, _, _, seqs = assembly
    result = tmp_path / "all_result.txt"
    with open(result, "w") as fh:
        fh.write(f"{E3}+\t{E4}+\n")   # gene-hit path → written + big enough
        fh.write(f"{E2}+\n")          # no evidence → dropped
    blast = tmp_path / "f.blast"
    blast.write_text("")
    gene_hit = tmp_path / "hit_seqs.out"
    gene_hit.write_text(f"{E3}\t7\n")
    score = tmp_path / "node_scores.out"
    score.write_text(f"{E1}\t0.95\n{E2}\t0.3\n")
    out_fa = tmp_path / "filtered.fasta"
    out_cycle = tmp_path / "filtered_cycle.txt"
    filter_result(fasta, result, out_fa, blast, 0.75, gene_hit, score, out_cycle)
    fa = open(out_fa).read()
    assert f">{E3}+{E4}+" in fa
    assert f">{E2}+" not in fa


def test_filter_result_cycle_records(assembly):
    tmp_path, fasta, _, _, _ = assembly
    result = tmp_path / "all_result.txt"
    with open(result, "w") as fh:
        fh.write("iter 1\n")
        fh.write(f"{E3}+\t{E4}+\n")
    gene_hit = tmp_path / "hit_seqs.out"
    gene_hit.write_text(f"{E3}\t7\n")
    score = tmp_path / "node_scores.out"
    score.write_text(f"{E4}\t0.95\n")
    blast = tmp_path / "f.blast"
    blast.write_text("")
    out_fa = tmp_path / "filtered.fasta"
    out_cycle = tmp_path / "filtered_cycle.txt"
    filter_result(fasta, result, out_fa, blast, 0.75, gene_hit, score, out_cycle)
    cyc = open(out_cycle).read().splitlines()
    # cyclegene + cyclescore records, tags self/gene/score stripped, "cycle" kept
    assert f"cycle{E3}+{E4}+" in cyc
    assert len([l for l in cyc if l.startswith("cycle")]) == 2


def test_filter_cycle_gene_score(tmp_path):
    inp = tmp_path / "in.txt"
    with open(inp, "w") as fh:
        fh.write(f"cycle{E3}+{E4}+\n")      # multi-contig → kept, tags stripped
        fh.write(f"{E4}+\n")                 # single, gene hit below → kept
        fh.write(f"{E3}+\n")                 # single, no evidence → dropped
        fh.write(f"{E1}+\n")                 # 3000 < 10000 → length gate drops
    gene = tmp_path / "genes.txt"
    gene.write_text(f"{E4}\t6\n")
    score = tmp_path / "scores.txt"
    score.write_text(f"{E2}\t0.9\n")
    out = tmp_path / "out.txt"
    filter_cycle_gene_score(inp, 0, gene, score, out)
    lines = set(open(out).read().splitlines())
    assert f"{E3}+\t{E4}+" in lines
    assert f"{E4}+" in lines
    assert f"{E3}+" not in lines
    assert all(E1 not in l for l in lines)


def test_generate_second_with_blast(tmp_path):
    blast = tmp_path / "filtered.blast"
    q = f"{E3}+{E4}+"
    with open(blast, "w") as fh:
        # layout B: q, ref, pident, qlen, slen, length, ...
        fh.write(f"{q}\trefX\t95\t20000\t30000\t15000\t0\t0\t1\t15000\t1\t15000\t0\t100\n")
        fh.write(f"{q}\trefY\t95\t20000\t30000\t500\t0\t0\t1\t500\t1\t500\t0\t100\n")
    out = tmp_path / "need_second.txt"
    ref_queries = generate_second_with_blast(blast, out)
    assert list(ref_queries) == ["refX"]
    assert open(out).read() == f"{q}\trefX\n"


def test_filter_ragtag(tmp_path):
    agp = tmp_path / "ragtag.scaffold.agp"
    with open(agp, "w") as fh:
        fh.write("# header\n")
        fh.write(f"ref1_RagTag\t1\t8000\t1\tW\t{E3}+\t1\t8000\t+\n")
        fh.write("ref1_RagTag\t8001\t8100\t2\tN\t100\tscaffold\tyes\talign_genus\n")
        fh.write(f"ref1_RagTag\t8101\t20100\t3\tW\t{E4}-\t1\t12000\t-\n")
    out = tmp_path / "part.txt"
    filter_ragtag(agp, out, is_remain=False)
    # '-' oriented W line is reverse-flipped: E4- → E4+
    assert open(out).read() == f"{E3}+{E4}+\n"


def test_get_main_path(tmp_path):
    graph = tmp_path / "sub.second"
    with open(graph, "w") as fh:
        fh.write(f"SEG {E3} 5 1 0 0 1 2\n")    # order 2 > -2 → relevant
        fh.write(f"SEG {E4} 5 1 0 0 1 -2\n")   # -2 → not relevant
    result = tmp_path / "result_cycle.txt"
    with open(result, "w") as fh:
        fh.write(f"{E3}+\n")
        fh.write(f"{E4}+\n")
    out = tmp_path / "main.txt"
    get_main_path(graph, result, out)
    lines = open(out).read().splitlines()
    assert f"{E3}+" in lines  # 100% relevant and >2000
    assert lines[-1] == f"{E3}+"  # most-frequent line appended


def test_parse_remain(tmp_path):
    graph = tmp_path / "remain.second"
    with open(graph, "w") as fh:
        fh.write(f"SEG {E3} 5 1 1 0.95 1 -1\n")  # both (gene + score)
        fh.write(f"SEG {E4} 5 1 0 0.1 1 -1\n")
    remain = tmp_path / "rag.txt"
    remain.write_text(f"{E3}+\n{E4}+\n")
    genes = tmp_path / "genes.txt"
    genes.write_text(f"{E3}\t9\n")
    out = tmp_path / "res.txt"
    before = tmp_path / "before.txt"
    parse_remain(graph, remain, out, 0.6, 5000, before, genes)
    lines = open(out).read().splitlines()
    assert lines == [f"{E3}+"]
    assert open(before).read() == f"{E3}+:{E3}+\n"


def test_create_sub_graphs(tmp_path):
    graph = tmp_path / "filtered_graph.txt"
    with open(graph, "w") as fh:
        fh.write(f"SEG {E3} 5 1 0 0.5 1\nSEG {E4} 6 2 1 0.9 0\nSEG {E1} 2 1 0 0 0\n")
        fh.write(f"JUNC {E3} + {E4} + 9 0\nJUNC {E1} + {E3} + 6 0\n")
    match = tmp_path / "need_second.txt"
    match.write_text(f"{E3}+{E4}+\trefX\n")
    percent = tmp_path / "pct.txt"
    percent.write_text("refX\t0.95\n")
    blast = tmp_path / "a.blast"
    with open(blast, "w") as fh:
        fh.write(f"{E3}\trefX\t95\t8000\t0\t0\t1\t8000\t1\t8000\t0\t99\t8000\t30000\n")
        fh.write(f"{E4}\trefX\t95\t12000\t0\t0\t1\t12000\t9000\t21000\t0\t99\t12000\t30000\n")
    similar_out = tmp_path / "similar_ref.txt"

    store = DepthStore()
    store.arrays[E3] = np.full(8000, 10, np.int32)
    store.arrays[E4] = np.full(12000, 20, np.int32)

    files = create_sub_graphs(
        graph, tmp_path / "demo", match, store, blast, similar_out, percent
    )
    names = [f.name for f in files]
    assert "demo_refrefXref.second" in names
    assert "demo_refremainref.second" in names

    sub = open(tmp_path / "demo_refrefXref.second").read().splitlines()
    seg_lines = [l for l in sub if l.startswith("SEG")]
    assert len(seg_lines) == 2
    # ref order column: E3 starts at 1, E4 at 9000
    e3_line = next(l for l in seg_lines if E3 in l)
    e4_line = next(l for l in seg_lines if E4 in l)
    assert e3_line.endswith(" 1")
    assert e4_line.endswith(" 9000")
    assert any(l.startswith("JUNC") and E3 in l and E4 in l for l in sub)

    remain = open(tmp_path / "demo_refremainref.second").read().splitlines()
    assert any(l.startswith(f"SEG {E1}") and l.endswith("-1") for l in remain)


def test_reverse_string_and_common_result(tmp_path):
    assert _reverse_string(f"{E3}+{E4}-") == f"{E4}+{E3}-"
    d = tmp_path
    (d / "r1_ragtag_scaffold_part.txt").write_text(f"{E3}+{E4}+\n")
    (d / "r2_ragtag_scaffold_part.txt").write_text(_reverse_string(f"{E3}+{E4}+\n".strip()) + "\n")
    (d / "r3_ragtag_scaffold_part.txt").write_text(f"{E1}+\n")
    similar = d / "similar.txt"
    similar.write_text("r1,r2,r3\n")
    out = d / "final_tmp.txt"
    out.write_text("")
    n = find_most_common_result(d, similar, out)
    assert n == 1
    # r1 content and its reverse-flip (r2) vote together and win over r3
    assert open(out).read().strip() == f"{E3}+{E4}+"


def test_dedup_primitives():
    # reformat_cycle rotation: shared prefix/suffix moves to front
    assert reformat_cycle(["A+", "B+", "A+"]) == ["A+", "A+", "B+"]
    # consecutive repeats
    reps = find_consecutive_repeats(["A+", "A+", "B+"])
    assert ["A+"] in reps
    fai = {"A": 5000, "B": 7000, "C": 100}
    sim, idx = is_similar(["A+", "B+"], ["A-", "B-", "C+"], fai)
    assert sim  # shared lengths 12000/12100 ≥ 0.9
    assert idx == 1  # second is longer → keep it, drop first


def test_smart_quota_dedup():
    e_a = f"EDGE_7_length_100_cov_10.0"
    e_b = f"EDGE_8_length_100_cov_30.0"
    line = f"{e_a}+\t{e_b}+\t{e_a}+\t{e_a}+"
    # baseline = 30 (single-copy b); a budget = max(1, round(10/30)) = 1
    out = smart_quota_dedup(line)
    assert out == f"{e_a}+\t{e_b}+"


def test_is_circular_and_final_fa(tmp_path):
    rng = np.random.default_rng(1)
    seqs = {E3: "".join(rng.choice(list("ACGT"), 8000)), E4: "".join(rng.choice(list("ACGT"), 12000))}
    fasta = tmp_path / "edges.fasta"
    write_fasta(fasta, list(seqs.items()))
    graph = tmp_path / "graph.txt"
    with open(graph, "w") as fh:
        fh.write(f"SEG {E3} 5 1\nSEG {E4} 5 1\n")
        fh.write(f"JUNC {E3} + {E4} + 9 0\nJUNC {E4} + {E3} + 9 0\n")
    final_txt = tmp_path / "final.txt"
    final_txt.write_text(f"{E3}+\t{E4}+\n")
    out = tmp_path / "final.fasta"
    n_cycle, n_linear = make_final_fa(final_txt, graph, fasta, out, "demo")
    assert (n_cycle, n_linear) == (1, 0)
    content = open(out).read()
    assert ">demo_phage_1_cycle" in content
    assert "N" * 50 in content


def test_get_hits(tmp_path):
    res = tmp_path / "prot_blast.out"
    with open(res, "w") as fh:
        fh.write(f"gene1\t{E3}\t90\t80.0\t100\t8000\t1e-20\n")   # cov 0.9 id 80 → hit
        fh.write(f"gene2\t{E3}\t50\t80.0\t100\t8000\t1e-20\n")   # cov 0.5 → no
        fh.write(f"gene3\t{E4}\t90\t70.0\t100\t8000\t1e-20\n")   # id 70 → no
    hits = {}
    get_hits(res, hits, 0.75)
    assert hits == {E3: 1}


def test_filter_remain_result(tmp_path):
    a = tmp_path / "a.txt"
    a.write_text(f"{E3}+\t{E4}+\n{E1}+\n")
    b = tmp_path / "b.txt"
    b.write_text(f"{E4}-\n")
    out = tmp_path / "out.txt"
    kept = filter_remain_result(a, b, out)
    assert kept == 1
    assert open(out).read() == f"{E1}+\n"
