"""Differential oracles: the REFERENCE's own filter scripts run head-to-head
against our ports on randomized synthetic worlds.

For each script in /root/reference/share/palace/scripts the test
1. generates a randomized (seeded) synthetic world of pipeline artifacts,
2. runs the unmodified reference script as a subprocess (third-party
   imports satisfied by tests/refshim — a minimal Bio/pysam/pyfaidx),
3. runs our port on the same inputs,
4. compares outputs byte-for-byte — or as line multisets where the
   reference itself is nondeterministic (set/dict iteration, ledgered
   as D4 in PARITY.md).

This closes VERDICT r4 "What's missing #1": the ports were previously
pinned only by hand-traced literals, which a shared misreading passes.
"""
from __future__ import annotations

import os
import re
import subprocess
import sys
from pathlib import Path

import pytest

REF = Path("/root/reference/share/palace/scripts")
SHIM = Path(__file__).parent / "refshim"

pytestmark = [
    pytest.mark.skipif(not REF.exists(), reason="reference tree unavailable"),
]

SEEDS = [0, 1, 2, 3, 4, 5, 6, 7]


# ---------------------------------------------------------------------------
# reference-subprocess runner
# ---------------------------------------------------------------------------

def run_ref(script: str, args, cwd: Path, extra_bin: Path | None = None) -> str:
    """Run the unmodified reference script; returns stdout."""
    env = dict(os.environ)
    env["PYTHONPATH"] = str(SHIM)
    env["PYTHONHASHSEED"] = "0"
    if extra_bin is not None:
        env["PATH"] = f"{extra_bin}:{env.get('PATH', '')}"
    proc = subprocess.run(
        [sys.executable, str(REF / script), *[str(a) for a in args]],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, (
        f"reference {script} failed rc={proc.returncode}\n"
        f"stderr:\n{proc.stderr[-4000:]}\nstdout:\n{proc.stdout[-2000:]}")
    return proc.stdout


# ---------------------------------------------------------------------------
# comparison helpers
# ---------------------------------------------------------------------------

def read(p: Path) -> str:
    return Path(p).read_text()


def assert_same(p_ref: Path, p_ours: Path, label: str):
    a, b = read(p_ref), read(p_ours)
    assert a == b, f"{label}: reference != ours\n--- ref:\n{a}\n--- ours:\n{b}"


def assert_same_lineset(p_ref: Path, p_ours: Path, label: str):
    a = sorted(l for l in read(p_ref).splitlines() if l.strip())
    b = sorted(l for l in read(p_ours).splitlines() if l.strip())
    assert a == b, f"{label}: line multisets differ\n--- ref:\n{a}\n--- ours:\n{b}"


def parse_fasta(p: Path) -> dict:
    recs, name, chunks = {}, None, []
    for line in read(p).splitlines():
        if line.startswith(">"):
            if name is not None:
                recs[name] = "".join(chunks)
            name, chunks = line[1:], []
        else:
            chunks.append(line.strip())
    if name is not None:
        recs[name] = "".join(chunks)
    return recs


def assert_same_fasta(p_ref: Path, p_ours: Path, label: str, ordered: bool = True):
    a, b = parse_fasta(p_ref), parse_fasta(p_ours)
    assert a == b, f"{label}: fasta records differ\nref: {sorted(a)}\nours: {sorted(b)}"
    if ordered:
        assert list(a) == list(b), f"{label}: record order differs"


# ---------------------------------------------------------------------------
# synthetic world
# ---------------------------------------------------------------------------

class World:
    """A randomized, internally-consistent set of pipeline artifacts."""

    def __init__(self, root: Path, rng):
        import numpy as np

        from palace_tpu.graph.depth import DepthStore
        from palace_tpu.io.fasta import build_fai

        self.root = root
        self.rng = rng
        root.mkdir(parents=True, exist_ok=True)

        # --- contigs -----------------------------------------------------
        n = rng.randint(8, 14)
        self.names = []
        self.seqs = {}
        for i in range(1, n + 1):
            # mix of sizes: some tiny, some >2000, some >10k (cycle gates)
            length = rng.choice([rng.randint(300, 900),
                                 rng.randint(2100, 5000),
                                 rng.randint(11000, 16000)])
            cov = round(rng.uniform(3.0, 40.0), 6)
            name = f"EDGE_{i}_length_{length}_cov_{cov}"
            self.names.append(name)
            self.seqs[name] = "".join(rng.choice("ACGT") for _ in range(length))
        self.fasta = root / "contigs.fasta"
        with open(self.fasta, "w") as fh:
            for name in self.names:
                fh.write(f">{name}\n{self.seqs[name]}\n")
        build_fai(self.fasta)
        self.fai = Path(str(self.fasta) + ".fai")

        # --- phage reference db -----------------------------------------
        self.n_refs = rng.randint(3, 6)
        self.ref_names = [f"ref|phage_{j}|genome" if rng.random() < 0.3
                          else f"phageREF_{j}" for j in range(1, self.n_refs + 1)]
        self.phagedb = root / "phagedb.fasta"
        self.ref_lens = {}
        with open(self.phagedb, "w") as fh:
            for rn in self.ref_names:
                L = rng.randint(8000, 30000)
                self.ref_lens[rn] = L
                seq = "".join(rng.choice("ACGT") for _ in range(L))
                fh.write(f">{rn}\n{seq}\n")
        build_fai(self.phagedb)

        # --- graph file (SEG/JUNC as generateGraph writes them) ---------
        self.graph = root / "graph.txt"
        seg_lines, junc_lines = [], []
        for name in self.names:
            depth = round(rng.uniform(2.0, 50.0), 4)
            copy = rng.randint(1, 3)
            seg_lines.append(f"SEG {name} {depth} {copy}")
        n_junc = rng.randint(n, 2 * n)
        seen_junc = set()
        for _ in range(n_junc):
            a, b = rng.choice(self.names), rng.choice(self.names)
            oa, ob = rng.choice("+-"), rng.choice("+-")
            support = rng.choice([0, rng.randint(1, 4), rng.randint(5, 60)])
            span = rng.randint(0, 10)
            key = (a, oa, b, ob)
            if key in seen_junc:
                continue
            seen_junc.add(key)
            junc_lines.append(f"JUNC {a} {oa} {b} {ob} {support} {span}")
        self.graph.write_text("\n".join(seg_lines + junc_lines) + "\n")

        # --- filtered graph (7-field SEG: + gene score is_blast) --------
        # what filter_graph emits and create_sub_graph consumes
        self.filtered_graph = root / "filtered_graph.txt"
        fseg = []
        for line in seg_lines:
            gene = rng.choice(["0", str(rng.randint(1, 9))])
            score = rng.choice(["0.000", f"{rng.uniform(0, 1):.3f}", "1.0"])
            blast = rng.choice(["0", "1"])
            fseg.append(f"{line} {gene} {score} {blast}")
        self.filtered_graph.write_text("\n".join(fseg + junc_lines) + "\n")

        # --- assembly blast: the driver's 14-col outfmt (std + qlen slen,
        #     palace:528), grouped by query/ref like real blastn output ----
        self.blast = root / "contigs.fasta.blast"
        rows = []
        for name in self.names:
            if rng.random() < 0.7:
                for ref in rng.sample(self.ref_names, rng.randint(1, 2)):
                    length = int(name.split("_")[3])
                    slen = self.ref_lens[ref]
                    for _ in range(rng.randint(1, 3)):
                        aln = rng.randint(150, max(200, int(length * 0.9)))
                        ident = round(rng.uniform(60.0, 100.0), 3)
                        qs = rng.randint(1, max(2, length - aln))
                        ss = rng.randint(1, max(2, slen - aln))
                        se = min(ss + aln - 1, slen)
                        if rng.random() < 0.3:  # minus-strand hit
                            ss, se = se, ss
                        rows.append(
                            f"{name}\t{ref}\t{ident}\t{aln}\t{rng.randint(0,9)}"
                            f"\t{rng.randint(0,3)}\t{qs}\t{qs+aln-1}"
                            f"\t{ss}\t{se}"
                            f"\t{rng.choice(['0.0','1e-50','3e-09'])}\t{rng.randint(100,900)}"
                            f"\t{length}\t{slen}")
        self.blast.write_text("\n".join(rows) + ("\n" if rows else ""))

        # --- GCN scores (incl. e-notation quirk rows) --------------------
        self.scores = root / "node_scores.out"
        score_rows = []
        for name in self.names:
            r = rng.random()
            if r < 0.2:
                s = f"{rng.uniform(0.0001, 0.01):.6e}"  # e-notation quirk
            else:
                s = f"{rng.uniform(0.0, 1.0):.6f}"
            score_rows.append(f"{name}\t{s}")
        self.scores.write_text("\n".join(score_rows) + "\n")

        # --- gene hits ----------------------------------------------------
        self.genes = root / "hit_seqs.out"
        gene_rows = [f"{name}\t{rng.randint(1, 12)}"
                     for name in self.names if rng.random() < 0.4]
        self.genes.write_text("\n".join(gene_rows) + ("\n" if gene_rows else ""))

        # --- SPAdes contigs.paths ----------------------------------------
        self.paths = root / "contigs.paths"
        path_rows = []
        node_id = 0
        for _ in range(rng.randint(2, 5)):
            node_id += 1
            members = rng.sample(self.names, rng.randint(1, min(4, n)))
            token = ",".join(f"{m.split('_')[1]}{rng.choice('+-')}" for m in members)
            total = sum(int(m.split("_")[3]) for m in members)
            path_rows.append(f"NODE_{node_id}_length_{total}_cov_12.5")
            path_rows.append(token + ";")
        self.paths.write_text("\n".join(path_rows) + "\n")

        # --- matching result files ---------------------------------------
        def mk_path_line(max_len=5):
            members = rng.sample(self.names, rng.randint(1, max_len))
            return "\t".join(f"{m}{rng.choice('+-')}" for m in members)

        self.linear = root / "linear.txt"
        self.linear.write_text(
            "\n".join(mk_path_line() for _ in range(rng.randint(2, 5))) + "\n")

        cyc_lines = []
        for _ in range(rng.randint(1, 3)):
            cyc_lines.append(rng.choice(["iter 3", "self"]))
            cyc_lines.append(mk_path_line())
        # duplicate one pair to exercise remove_cycle_dup
        if len(cyc_lines) >= 2:
            cyc_lines.extend(cyc_lines[0:2])
        self.cycle = root / "cycle.txt"
        self.cycle.write_text("\n".join(cyc_lines) + "\n")

        # all_result = linear + cycle_nodup (as the driver cats them)
        self.all_result = root / "all_result.txt"
        self.all_result.write_text(read(self.linear) + read(self.cycle))

        # --- depth store + depth.gz --------------------------------------
        arrays = {}
        for name in self.names:
            L = int(name.split("_")[3])
            arr = np.maximum(
                0, np.round(rng.gauss(20, 6) + np.zeros(L)).astype(np.int64))
            # leave random uncovered holes
            holes = rng.randint(0, 4)
            for _ in range(holes):
                h0 = rng.randint(0, max(1, L - 50))
                arr[h0:h0 + rng.randint(10, 50)] = 0
            arrays[name] = arr
        self.depth_store = DepthStore(arrays)
        self.depth_gz = root / "aln.bam.depth.gz"
        self.depth_store.write_text(self.depth_gz, compress=True)


@pytest.fixture(params=SEEDS, scope="module")
def world(request, tmp_path_factory) -> World:
    import random

    root = tmp_path_factory.mktemp(f"diffworld{request.param}")
    return World(root, random.Random(request.param))


# ---------------------------------------------------------------------------
# the differentials
# ---------------------------------------------------------------------------

def test_split_fastg(world, tmp_path):
    # build a small FASTG with ':'-adjacency and '-suffixed revcomp names
    fastg = tmp_path / "assembly.fastg"
    rng = world.rng
    with open(fastg, "w") as fh:
        for name in world.names[:6]:
            nbrs = ",".join(
                f"{m}'" if rng.random() < 0.5 else m
                for m in rng.sample(world.names, rng.randint(1, 2)))
            fh.write(f">{name}:{nbrs};\n{world.seqs[name]}\n")
            fh.write(f">{name}';\n{world.seqs[name][::-1]}\n")
    out_ref = tmp_path / "ref_nodes.fasta"
    out_ours = tmp_path / "ours_nodes.fasta"
    run_ref("split_fastg.py", ["-g", fastg, "-o", out_ref], tmp_path)

    from palace_tpu.io.fastg import fastg_to_node_fasta
    fastg_to_node_fasta(fastg, out_ours)
    assert_same_fasta(out_ref, out_ours, "split_fastg")


def test_remove_cycle_dup(world, tmp_path):
    out_ref = tmp_path / "ref.txt"
    out_ours = tmp_path / "ours.txt"
    run_ref("remove_cycle_dup.py", [world.cycle, out_ref], tmp_path)

    from palace_tpu.io.paths_io import remove_duplicate_pairs
    remove_duplicate_pairs(world.cycle, out_ours)
    assert_same(out_ref, out_ours, "remove_cycle_dup")


def test_filter_graph(world, tmp_path):
    # fastg .fai whose first column is the ':'-adjacency header
    fastg_fai = tmp_path / "assembly.fastg.fai"
    rng = world.rng
    with open(fastg_fai, "w") as fh:
        for name in world.names:
            nbrs = ",".join(rng.sample(world.names, rng.randint(1, 2)))
            fh.write(f"{name}:{nbrs};\t{len(world.seqs[name])}\t0\t80\t81\n")
    out_ref = tmp_path / "ref_filtered.txt"
    out_ours = tmp_path / "ours_filtered.txt"
    hits_ref = tmp_path / "ref_hits.txt"
    hits_ours = tmp_path / "ours_hits.txt"
    run_ref("filter_graph.py",
            [fastg_fai, world.graph, out_ref, 30, 0, world.genes, world.scores,
             world.blast, 0.7, world.fai, hits_ref, world.paths, 0.7],
            tmp_path)

    from palace_tpu.graph.filter import filter_graph
    filter_graph(fastg_fai, world.graph, out_ours, world.genes, world.scores,
                 world.blast, 0.7, world.fai, hits_ours, world.paths, 0.7)

    # reference iterates write_segs/path_segs sets (PYTHONHASHSEED-dependent
    # order): compare SEGs as multisets; JUNC order is list-preserved
    ref_lines = read(out_ref).splitlines()
    ours_lines = read(out_ours).splitlines()
    assert sorted(l for l in ref_lines if l.startswith("SEG")) == \
        sorted(l for l in ours_lines if l.startswith("SEG")), "filter_graph SEGs"
    assert [l for l in ref_lines if l.startswith("JUNC")] == \
        [l for l in ours_lines if l.startswith("JUNC")], "filter_graph JUNCs"
    assert_same_lineset(hits_ref, hits_ours, "filter_graph all_hit_segs")


def test_filter_result(world, tmp_path):
    fa_ref = tmp_path / "ref_filtered.fasta"
    fa_ours = tmp_path / "ours_filtered.fasta"
    cyc_ref = tmp_path / "ref_cycle.txt"
    cyc_ours = tmp_path / "ours_cycle.txt"
    run_ref("filter_result.py",
            [world.fasta, world.all_result, fa_ref, world.blast, 0.75,
             world.genes, world.scores, cyc_ref], tmp_path)

    from palace_tpu.filters.result_filter import filter_result
    filter_result(world.fasta, world.all_result, fa_ours, world.blast, 0.75,
                  world.genes, world.scores, cyc_ours)
    assert_same_fasta(fa_ref, fa_ours, "filter_result fasta")
    # cycle file: reference iterates a set (D4) — compare as multiset
    assert_same_lineset(cyc_ref, cyc_ours, "filter_result cycle")


def test_generate_second_with_blast(world, tmp_path):
    # 14-col blast (qaccver saccver pident qlen slen length ...)
    blast14 = tmp_path / "filtered.fasta.blast"
    rng = world.rng
    rows = []
    for name in world.names:
        qlen = int(name.split("_")[3])
        for ref in rng.sample(world.ref_names, rng.randint(0, 2)):
            aln = rng.randint(50, qlen)
            rows.append(f"{name}\t{ref}\t{round(rng.uniform(70,100),2)}\t{qlen}"
                        f"\t{rng.randint(9000,30000)}\t{aln}\t1\t0\t1\t{aln}"
                        f"\t1\t{aln}\t0.0\t{rng.randint(100,500)}")
    blast14.write_text("\n".join(rows) + ("\n" if rows else ""))
    out_ref = tmp_path / "ref_need.txt"
    out_ours = tmp_path / "ours_need.txt"
    run_ref("generate_second_with_blast.py", [blast14, out_ref], tmp_path)

    from palace_tpu.filters.second_pass import generate_second_with_blast
    generate_second_with_blast(blast14, out_ours)
    assert_same(out_ref, out_ours, "generate_second_with_blast")


def test_make_fa_from_path(world, tmp_path):
    for mode in (0, 1):
        out_ref = tmp_path / f"ref_m{mode}.fasta"
        out_ours = tmp_path / f"ours_m{mode}.fasta"
        run_ref("make_fa_from_path.py",
                [world.fasta, world.all_result, out_ref, mode], tmp_path)

        from palace_tpu.assembly.path_fa import make_fa_from_path
        make_fa_from_path(world.fasta, world.all_result, out_ours, mode)
        assert_same(out_ref, out_ours, f"make_fa_from_path mode={mode}")


def _mk_agp(world, tmp_path, n_scaffolds=2):
    """RagTag-style AGP over concatenated-token 'contigs'."""
    rng = world.rng
    agp = tmp_path / "ragtag.scaffold.agp"
    rows = ["## agp-version 2.1", "# AGP created by RagTag"]
    for s in range(n_scaffolds):
        ref = f"scaffold_{s}_RagTag"
        pos = 1
        part = 1
        for w in range(rng.randint(1, 3)):
            members = rng.sample(world.names, rng.randint(1, 3))
            token = "".join(f"{m}{rng.choice('+-')}" for m in members)
            length = sum(int(m.split("_")[3]) for m in members)
            rows.append(f"{ref}\t{pos}\t{pos+length-1}\t{part}\tW\t{token}"
                        f"\t1\t{length}\t{rng.choice('+-')}")
            pos += length
            part += 1
            rows.append(f"{ref}\t{pos}\t{pos+99}\t{part}\tU\t100\tscaffold\tyes\talign_genus")
            pos += 100
            part += 1
    agp.write_text("\n".join(rows) + "\n")
    return agp


def test_filter_ragtag(world, tmp_path):
    agp = _mk_agp(world, tmp_path)
    for is_remain in (0, 1):
        out_ref = tmp_path / f"ref_r{is_remain}.txt"
        out_ours = tmp_path / f"ours_r{is_remain}.txt"
        run_ref("filter_ragtag.py", [agp, out_ref, is_remain], tmp_path)

        from palace_tpu.filters.second_pass import filter_ragtag
        filter_ragtag(agp, out_ours, bool(is_remain))
        assert_same(out_ref, out_ours, f"filter_ragtag is_remain={is_remain}")


def test_get_main_path(world, tmp_path):
    # graph with ref-order column appended (the .second format: SEG ... order)
    rng = world.rng
    second = tmp_path / "sub.second"
    lines = []
    for name in world.names:
        order = rng.choice([-1, rng.randint(0, 20)])
        lines.append(f"SEG {name} {round(rng.uniform(2,40),3)} "
                     f"{rng.randint(1,3)} 0 0.5 1 {order}")
    second.write_text("\n".join(lines) + "\n")
    out_ref = tmp_path / "ref_main.txt"
    out_ours = tmp_path / "ours_main.txt"
    # NOTE: a bare marker line ("iter"/"self") ZeroDivides the reference
    # (get_main_path.py:32); its real input is `-b --aggressive` solver
    # output, so feed the marker-free linear file
    run_ref("get_main_path.py", [second, world.linear, out_ref], tmp_path)

    from palace_tpu.filters.second_pass import get_main_path
    get_main_path(second, world.linear, out_ours)
    assert_same(out_ref, out_ours, "get_main_path")


def test_parse_remain(world, tmp_path):
    rng = world.rng
    # remain graph: SEG name depth copy gene score blast
    remain_graph = tmp_path / "remain.second"
    lines = []
    for name in world.names:
        gene = rng.choice(["0", str(rng.randint(1, 9))])
        score = rng.choice(["0.000", f"{rng.uniform(0,1):.3f}"])
        blast = rng.choice(["0", "1"])
        lines.append(f"SEG {name} {round(rng.uniform(2,40),3)} "
                     f"{rng.randint(1,3)} {gene} {score} {blast}")
    remain_graph.write_text("\n".join(lines) + "\n")
    rag = tmp_path / "remain.rag.txt"
    rag.write_text(
        "\n".join("\t".join(f"{m}{rng.choice('+-')}"
                            for m in rng.sample(world.names, rng.randint(2, 6)))
                  for _ in range(3)) + "\n")
    bc_ref = tmp_path / "ref_bc.txt"
    bc_ours = tmp_path / "ours_bc.txt"
    out_ref = tmp_path / "ref_res.txt"
    out_ours = tmp_path / "ours_res.txt"
    run_ref("parse_remain.py",
            [remain_graph, rag, out_ref, 0.6, 10000, bc_ref, world.genes],
            tmp_path)

    from palace_tpu.filters.second_pass import parse_remain
    parse_remain(remain_graph, rag, out_ours, 0.6, 10000, bc_ours, world.genes)
    assert_same(out_ref, out_ours, "parse_remain result")
    assert_same(bc_ref, bc_ours, "parse_remain before_cut")


def test_filter_cycle_gene_score(world, tmp_path):
    # input: result lines, some tagged (cycle/score/self/gene/ref prefixes)
    rng = world.rng
    tagged = tmp_path / "final_tmp.txt"
    rows = []
    for _ in range(6):
        members = rng.sample(world.names, rng.randint(1, 4))
        line = "\t".join(f"{m}{rng.choice('+-')}" for m in members)
        tag = rng.choice(["", "cycle", "score", "self", "gene", "cyclegene"])
        rows.append(tag + line)
    tagged.write_text("\n".join(rows) + "\n")
    out_ref = tmp_path / "ref_out.txt"
    out_ours = tmp_path / "ours_out.txt"
    run_ref("filter_cycle_gene_score.py",
            [tagged, 0, world.genes, world.scores, out_ref], tmp_path)

    from palace_tpu.filters.cycle_filter import filter_cycle_gene_score
    filter_cycle_gene_score(tagged, 0, world.genes, world.scores, out_ours)
    # reference iterates a set (parse_input_file res) — D4-class ordering
    assert_same_lineset(out_ref, out_ours, "filter_cycle_gene_score")


def test_find_most_common_result(world, tmp_path):
    rng = world.rng
    d = tmp_path / "second_match"
    d.mkdir()
    refs = [rn.replace("|", "_") for rn in world.ref_names]
    # several refs share identical (or reverse-flipped) scaffold content
    base_members = rng.sample(world.names, 3)
    base = "".join(f"{m}+" for m in base_members)
    flipped = "".join(f"{m}-" for m in reversed(base_members))
    for i, ref in enumerate(refs):
        content = [base, flipped, "".join(
            f"{m}{rng.choice('+-')}" for m in rng.sample(world.names, 2))][i % 3]
        (d / f"{ref}_ragtag_scaffold_part.txt").write_text(content + "\n")
    similar = tmp_path / "similar_ref.txt"
    similar.write_text(",".join(world.ref_names) + "\n")
    out_ref = tmp_path / "ref_final.txt"
    out_ours = tmp_path / "ours_final.txt"
    out_ref.write_text("existing\n")   # script appends
    out_ours.write_text("existing\n")
    run_ref("find_most_common_result.py", [d, similar, out_ref], tmp_path)

    from palace_tpu.filters.common_result import find_most_common_result
    find_most_common_result(d, similar, out_ours)
    assert_same(out_ref, out_ours, "find_most_common_result")


def test_filter_cycle(world, tmp_path):
    # the reference skips "iter"/"loop" marker lines but IndexErrors on a
    # bare "self" marker (filter_cycle.py:16) — feed iter markers only
    cyc = tmp_path / "cycle_iter_only.txt"
    cyc.write_text("iter 3\n" + read(world.linear))
    out_ref_stdout = run_ref("filter_cycle.py", [cyc, 0], tmp_path)

    from palace_tpu.filters.cycle_filter import filter_cycle
    ours = filter_cycle(cyc, 0)
    # reference iterates a set — compare as multisets
    assert sorted(l for l in out_ref_stdout.splitlines() if l.strip()) == \
        sorted(l for l in ours if l.strip()), "filter_cycle"


def test_filter_remain_result(world, tmp_path):
    rng = world.rng
    file_b = tmp_path / "b.txt"
    file_b.write_text(
        "\n".join("\t".join(f"{m}{rng.choice('+-')}"
                            for m in rng.sample(world.names, 2))
                  for _ in range(2)) + "\n")
    out_ref = tmp_path / "ref.txt"
    out_ours = tmp_path / "ours.txt"
    run_ref("filter_remain_result.py", [world.all_result, file_b, out_ref], tmp_path)

    from palace_tpu.filters.cycle_filter import filter_remain_result
    filter_remain_result(world.all_result, file_b, out_ours)
    assert_same(out_ref, out_ours, "filter_remain_result")


def test_get_ref_by_index(world, tmp_path):
    rng = world.rng
    # eref stdout capture: ref_index <idx> <frag#> <covered> <len> <ratio>
    ref_names_txt = tmp_path / "ref_names.txt"
    rows = ["some preamble line"]
    for j in range(1, world.n_refs + 1):
        if rng.random() < 0.8:
            rows.append(f"ref_index {j} {rng.randint(1, 9)} "
                        f"{rng.randint(5000, 20000)} {rng.randint(8000, 30000)} "
                        f"{round(rng.uniform(0.75, 1.0), 4)}")
    ref_names_txt.write_text("\n".join(rows) + "\n")
    fa_ref = tmp_path / "ref_refs.fasta"
    fa_ours = tmp_path / "ours_refs.fasta"
    pct_ref = tmp_path / "ref_pct.txt"
    pct_ours = tmp_path / "ours_pct.txt"
    run_ref("get_ref_by_index.py",
            [world.phagedb, str(world.phagedb) + ".fai", ref_names_txt,
             fa_ref, pct_ref], tmp_path)

    from palace_tpu.search.refs import extract_reference_sequences
    extract_reference_sequences(world.phagedb, ref_names_txt, fa_ours, pct_ours)
    assert_same_fasta(fa_ref, fa_ours, "get_ref_by_index fasta")
    assert_same(pct_ref, pct_ours, "get_ref_by_index percent")


def test_make_final_fa(world, tmp_path):
    rng = world.rng
    final_txt = tmp_path / "final.txt"
    rows = []
    for _ in range(4):
        members = rng.sample(world.names, rng.randint(1, 4))
        rows.append("\t".join(f"{m}{rng.choice('+-')}" for m in members))
    final_txt.write_text("\n".join(rows) + "\n")
    out_ref = tmp_path / "ref_final.fasta"
    out_ours = tmp_path / "ours_final.fasta"
    run_ref("make_final_fa.py",
            [final_txt, world.graph, world.fasta, out_ref, "SAMP"], tmp_path)

    from palace_tpu.filters.final_fa import make_final_fa
    make_final_fa(final_txt, world.graph, world.fasta, out_ours, "SAMP")
    assert_same(out_ref, out_ours, "make_final_fa")


def test_filter_by_blast(world, tmp_path):
    rng = world.rng
    # scaffolded paths blasted against one ref: 14-col custom outfmt;
    # queries are concatenated-token path names as produced by the sed
    # rename at palace:788 (first_line of the scaffold_part file)
    ref = world.ref_names[0]
    ref_len = rng.randint(20000, 40000)
    queries = []
    for _ in range(3):
        members = rng.sample(world.names, rng.randint(2, 4))
        queries.append("".join(f"{m}{rng.choice('+-')}" for m in members))
    blast14 = tmp_path / "scaffold.blast"
    rows = []
    for q in queries:
        qlen = sum(int(m) for m in re.findall(r"EDGE_\d+_length_(\d+)_cov_[\d.]+", q)) or 5000
        for _ in range(rng.randint(1, 4)):
            aln = rng.randint(500, 8000)
            ss = rng.randint(1, ref_len - aln)
            qs = rng.randint(1, max(2, qlen - aln))
            rows.append(f"{q}\t{ref}\t{round(rng.uniform(80,100),2)}\t{qlen}"
                        f"\t{ref_len}\t{aln}\t{rng.randint(0,20)}\t{rng.randint(0,4)}"
                        f"\t{qs}\t{qs+aln-1}\t{ss}\t{ss+aln-1}\t0.0\t{rng.randint(200,900)}")
    blast14.write_text("\n".join(rows) + "\n")

    before_cut = tmp_path / "before_cut.txt"
    before_cut.write_text("")
    sm_ref = tmp_path / "ref_sm.txt"
    sm_ours = tmp_path / "ours_sm.txt"
    stdout_ref = run_ref(
        "filter_by_blast.py",
        [blast14, world.cycle, world.fai, sm_ref, 0, 0.7, 2000,
         "-s", ref, "--before_cut", before_cut,
         "--gene_hit", world.genes, "--score", world.scores], tmp_path)

    from palace_tpu.filters.blast_filter import filter_by_blast
    ours_lines = filter_by_blast(blast14, world.cycle, world.fai, sm_ours,
                                 "0", 0.7, 2000, single_ref=ref,
                                 gene_hit=world.genes, score=world.scores,
                                 before_cut=before_cut)
    ref_lines = [l for l in stdout_ref.splitlines() if l.strip()]
    assert ref_lines == [l for l in ours_lines if l.strip()], (
        f"filter_by_blast stdout\nref: {ref_lines}\nours: {ours_lines}")
    assert_same(sm_ref, sm_ours, "filter_by_blast second_match")


def test_create_sub_graph(world, tmp_path):
    rng = world.rng
    # need_second_match.txt rows: "<concat-query-tokens>\t<ref>"; several
    # lines sharing the query string form a similar-ref group
    match = tmp_path / "need_second_match.txt"
    qs = []
    for _ in range(2):
        members = rng.sample(world.names, rng.randint(2, 4))
        qs.append("".join(f"{m}{rng.choice('+-')}" for m in members))
    rows = []
    group_refs = rng.sample(world.ref_names, min(3, world.n_refs))
    for ref in group_refs:
        rows.append(f"{qs[0]}\t{ref}")
    solo_ref = rng.choice(world.ref_names)
    rows.append(f"{qs[1]}\t{solo_ref}")
    match.write_text("\n".join(rows) + "\n")

    refpct = tmp_path / "ref_percent.txt"
    refpct.write_text("".join(
        f"{rn}\t{round(rng.uniform(0.7, 1.0), 4)}\n" for rn in world.ref_names))

    simref_ref = tmp_path / "ref_similar.txt"
    simref_ours = tmp_path / "ours_similar.txt"
    ref_dir = tmp_path / "refout"
    ours_dir = tmp_path / "oursout"
    ref_dir.mkdir()
    ours_dir.mkdir()
    run_ref("create_sub_graph.py",
            [world.filtered_graph, ref_dir / "SAMP", match, "samtools",
             world.depth_gz, world.blast, simref_ref, refpct], tmp_path)

    from palace_tpu.filters.subgraph import create_sub_graphs
    create_sub_graphs(world.filtered_graph, ours_dir / "SAMP", match,
                      world.depth_store, world.blast, simref_ours, refpct)

    assert_same(simref_ref, simref_ours, "create_sub_graph similar_ref")
    ref_files = sorted(p.name for p in ref_dir.iterdir())
    ours_files = sorted(p.name for p in ours_dir.iterdir())
    assert ref_files == ours_files, (
        f"create_sub_graph filenames\nref: {ref_files}\nours: {ours_files}")
    for name in ref_files:
        assert_same(ref_dir / name, ours_dir / name, f"create_sub_graph {name}")


@pytest.fixture(scope="module")
def fake_samtools(tmp_path_factory) -> Path:
    """samtools shim: `samtools depth -r CONTIG FILE` over a (gzip) depth
    TSV — what corrected_dup.py:168 shells out to."""
    d = tmp_path_factory.mktemp("fakebin")
    exe = d / "samtools"
    exe.write_text(
        "#!/bin/sh\n"
        '[ "$1" = depth ] && [ "$2" = -r ] || exit 1\n'
        'zcat -f "$4" | awk -v c="$3" -F"\\t" \'$1==c\'\n')
    exe.chmod(0o755)
    return d


def test_corrected_dup(world, tmp_path, fake_samtools):
    rng = world.rng

    def tok(m):
        return f"{m}{rng.choice('+-')}"

    # cycle file with consecutive repeats (the copy-count machinery)
    cyc_rows = []
    for _ in range(2):
        a, b, c = rng.sample(world.names, 3)
        unit = [tok(a), tok(b)]
        cyc_rows.append("\t".join(unit * rng.randint(2, 3) + [tok(c)]))
    cyc_rows.append("\t".join(tok(m) for m in rng.sample(world.names, 2)))
    cycle_f = tmp_path / "filtered_cycle_res_tmp.txt"
    cycle_f.write_text("\n".join(cyc_rows) + "\n")

    # final file: the cycle rows (as the driver cats them first) + extras
    fin_rows = list(cyc_rows)
    for _ in range(3):
        fin_rows.append("\t".join(tok(m) for m in rng.sample(world.names, rng.randint(1, 5))))
    final_f = tmp_path / "filtered_final_tmp.txt"
    final_f.write_text("\n".join(fin_rows) + "\n")

    before_cut = tmp_path / "all_before_cut.txt"
    bc_rows = []
    if rng.random() < 0.7:
        cut = "\t".join(fin_rows[-1].split("\t")[:-1]) or fin_rows[-1]
        bc_rows.append(f"{cut}:{fin_rows[-1]}")
    before_cut.write_text("\n".join(bc_rows) + ("\n" if bc_rows else ""))

    out_dir_ref = tmp_path / "ref_final"
    out_dir_ref.mkdir()
    run_ref("corrected_dup.py",
            [out_dir_ref, "SAMP", cycle_f, final_f, "SAMP_final.txt",
             "SAMP_final.fasta", world.fasta, "SAMP_cycle_nodup.txt",
             world.depth_gz, before_cut, 10000],
            tmp_path, extra_bin=fake_samtools)

    from palace_tpu.filters.dedup import corrected_dup
    ours_out = tmp_path / "ours_final.txt"
    corrected_dup(cycle_f, final_f, ours_out, str(world.fasta) + ".fai",
                  world.depth_store, before_cut, 10000)
    assert_same(out_dir_ref / "SAMP_final.txt", ours_out, "corrected_dup")


def _mk_fake_blast_bin(tmp_path: Path, canned: Path) -> Path:
    """makeblastdb/tblastn shims: makeblastdb touches the db path;
    tblastn copies `<canned>/<query-basename>.hits` to -out.  The canned
    dir is separate from the protein dir because the reference queries
    EVERY file in proteins_dir (find_phage_gene_matches.py:142)."""
    d = tmp_path / "fakeblast"
    d.mkdir(exist_ok=True)
    mb = d / "makeblastdb"
    mb.write_text("#!/bin/sh\nwhile [ $# -gt 0 ]; do\n"
                  '  [ "$1" = -out ] && touch "$2".faux\n  shift\ndone\nexit 0\n')
    mb.chmod(0o755)
    tb = d / "tblastn"
    tb.write_text("#!/bin/sh\nq=; o=\nwhile [ $# -gt 0 ]; do\n"
                  '  [ "$1" = -query ] && q="$2"\n'
                  '  [ "$1" = -out ] && o="$2"\n  shift\ndone\n'
                  f'cp "{canned}/$(basename "$q").hits" "$o"\n')
    tb.chmod(0o755)
    return d


def test_find_phage_gene_matches(world, tmp_path):
    rng = world.rng
    pdir = tmp_path / "protein_db"
    pdir.mkdir()
    canned = tmp_path / "canned"
    canned.mkdir()
    fake_blast_bin = _mk_fake_blast_bin(tmp_path, canned)
    for i in range(2):
        pf = pdir / f"prot{i}.fasta"
        pf.write_text(f">prot{i}\nMKV\n")
        # canned tblastn outfmt "6 qseqid sseqid length pident qlen slen evalue"
        rows = []
        for name in rng.sample(world.names, rng.randint(2, 5)):
            genelen = rng.randint(80, 200)
            matchlen = rng.randint(int(genelen * 0.5), genelen)
            pident = round(rng.uniform(60.0, 100.0), 2)
            rows.append(f"prot{i}\t{name}\t{matchlen}\t{pident}\t{genelen}"
                        f"\t{int(name.split('_')[3])}\t1e-30")
        (canned / f"prot{i}.fasta.hits").write_text("\n".join(rows) + "\n")

    ref_out = tmp_path / "ref_search"
    ours_out = tmp_path / "ours_search"
    run_ref("find_phage_gene_matches.py",
            ["-f", world.fasta, "-n", 1, "-o", ref_out, "-p", pdir,
             "--bin_path", fake_blast_bin], tmp_path, extra_bin=fake_blast_bin)

    from palace_tpu.filters.gene_matches import find_phage_gene_matches
    find_phage_gene_matches(world.fasta, pdir, ours_out, threads=1,
                            bin_path=str(fake_blast_bin))
    # reference writes dict-of-os.listdir order; ours sorts file names —
    # compare as line multisets
    assert_same_lineset(ref_out / "hit_seqs.out", ours_out / "hit_seqs.out",
                        "find_phage_gene_matches hit_seqs")


def test_empty_evidence_world(tmp_path):
    """Degenerate inputs: EMPTY gene/blast files and no-hit scores — the
    seed-selection scripts must agree on the nothing-qualifies path."""
    import random

    world = World(tmp_path / "w", random.Random(99))
    empty_genes = tmp_path / "empty_genes.txt"
    empty_genes.write_text("")
    empty_blast = tmp_path / "empty.blast"
    empty_blast.write_text("")
    low_scores = tmp_path / "low_scores.txt"
    low_scores.write_text("".join(f"{n}\t0.010000\n" for n in world.names))

    fastg_fai = tmp_path / "assembly.fastg.fai"
    with open(fastg_fai, "w") as fh:
        for name in world.names:
            fh.write(f"{name};\t{len(world.seqs[name])}\t0\t80\t81\n")

    out_ref = tmp_path / "ref_filtered.txt"
    out_ours = tmp_path / "ours_filtered.txt"
    hits_ref = tmp_path / "ref_hits.txt"
    hits_ours = tmp_path / "ours_hits.txt"
    run_ref("filter_graph.py",
            [fastg_fai, world.graph, out_ref, 30, 0, empty_genes, low_scores,
             empty_blast, 0.7, world.fai, hits_ref, world.paths, 0.7],
            tmp_path)

    from palace_tpu.graph.filter import filter_graph
    filter_graph(fastg_fai, world.graph, out_ours, empty_genes, low_scores,
                 empty_blast, 0.7, world.fai, hits_ours, world.paths, 0.7)
    assert sorted(read(out_ref).splitlines()) == \
        sorted(read(out_ours).splitlines()), "empty-evidence filter_graph"
    assert_same_lineset(hits_ref, hits_ours, "empty-evidence hit_segs")

    # filter_result on the same nothing-qualifies evidence
    fa_ref = tmp_path / "ref_f.fasta"
    fa_ours = tmp_path / "ours_f.fasta"
    cyc_ref = tmp_path / "ref_c.txt"
    cyc_ours = tmp_path / "ours_c.txt"
    run_ref("filter_result.py",
            [world.fasta, world.linear, fa_ref, empty_blast, 0.75,
             empty_genes, low_scores, cyc_ref], tmp_path)
    from palace_tpu.filters.result_filter import filter_result
    filter_result(world.fasta, world.linear, fa_ours, empty_blast, 0.75,
                  empty_genes, low_scores, cyc_ours)
    assert_same_fasta(fa_ref, fa_ours, "empty-evidence filter_result")
    assert_same_lineset(cyc_ref, cyc_ours, "empty-evidence cycle")

    # filter_cycle_gene_score with empty gene evidence
    out2_ref = tmp_path / "ref_fc.txt"
    out2_ours = tmp_path / "ours_fc.txt"
    run_ref("filter_cycle_gene_score.py",
            [world.linear, 0, empty_genes, low_scores, out2_ref], tmp_path)
    from palace_tpu.filters.cycle_filter import filter_cycle_gene_score
    filter_cycle_gene_score(world.linear, 0, empty_genes, low_scores, out2_ours)
    assert_same_lineset(out2_ref, out2_ours, "empty-evidence fcgs")
