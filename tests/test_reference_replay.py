"""North-star composition differential (VERDICT r4 missing #2): run the
demo world through steps 4-6 TWICE —

  arm A: our pipeline driver (palace_tpu.pipeline.driver)
  arm B: the REFERENCE's own scripts chained exactly as `palace` chains
         them (filter_graph → uniq → matching → remove_cycle_dup →
         filter_result → generate_second_with_blast → create_sub_graph
         → per-subgraph matching/make_fa_from_path/get_main_path/
         filter_by_blast → filter_cycle_gene_score ×2 →
         find_most_common_result → corrected_dup → make_final_fa),
         with OUR solver standing in for the absent `bin/matching`
         binary and the D10 fabricated blast standing in for blastn
         (identical fabrication on both arms)

— and the final FASTAs must agree.  This pins the COMPOSITION of the
ports (file handoffs, cat orders, naming), which the per-script
differentials cannot see.

The assembly blast and filtered blast are prestaged (full-coverage
14-col rows) so the per-reference second-match arm actually runs;
RagTag is absent in this environment, so both arms exercise the
documented get_main_path fallback (palace:773-781).
"""
from __future__ import annotations

import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

REF = Path("/root/reference/share/palace/scripts")
SHIM = Path(__file__).parent / "refshim"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not REF.exists(), reason="reference tree unavailable"),
]


def run_ref(script, args, cwd, extra_bin=None, stdout_to=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(SHIM)
    env["PYTHONHASHSEED"] = "0"
    if extra_bin is not None:
        env["PATH"] = f"{extra_bin}:{env.get('PATH', '')}"
    proc = subprocess.run(
        [sys.executable, str(REF / script), *[str(a) for a in args]],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, (
        f"reference {script} rc={proc.returncode}\n{proc.stderr[-4000:]}")
    if stdout_to is not None:
        Path(stdout_to).write_text(proc.stdout)
    return proc.stdout


def _mk_fake_samtools(d: Path) -> Path:
    d.mkdir(exist_ok=True)
    exe = d / "samtools"
    exe.write_text(
        "#!/bin/sh\n"
        '[ "$1" = depth ] && [ "$2" = -r ] || exit 1\n'
        'zcat -f "$4" | awk -v c="$3" -F"\\t" \'$1==c\'\n')
    exe.chmod(0o755)
    return d


def _fabricate_assembly_blast(out_dir: Path):
    """Full-coverage 14-col rows mapping each demo phage contig onto its
    planted genome with true coordinates (what blastn would report)."""
    # contig layout from scripts/make_demo.build
    rows = []
    layout = {
        "phageP": [("EDGE_1_length_8000_cov_10.0", 1, 8000),
                   ("EDGE_2_length_7000_cov_10.0", 8001, 15000),
                   ("EDGE_3_length_5000_cov_10.0", 15001, 20000)],
        "phageQ": [("EDGE_5_length_8000_cov_10.0", 1, 8000),
                   ("EDGE_6_length_6000_cov_10.0", 8001, 14000)],
    }
    slen = {"phageP": 20000, "phageQ": 14000}
    for ref, contigs in layout.items():
        for name, ss, se in contigs:
            qlen = int(name.split("_")[3])
            rows.append(
                f"{name}\t{ref}\t99.5\t{qlen}\t0\t0\t1\t{qlen}\t{ss}\t{se}"
                f"\t0.0\t{qlen}\t{qlen}\t{slen[ref]}")
    blast = out_dir / "02-assembly" / "assembly_graph.fasta.blast"
    blast.write_text("\n".join(rows) + "\n")


def _fabricate_filtered_blast(filtered_fasta: Path, out: Path):
    """Rows for each filtered record vs the genome its first EDGE
    belongs to — full query coverage so need_second_match selects it."""
    from palace_tpu.io.fasta import iter_fasta

    ref_of = {"1": "phageP", "2": "phageP", "3": "phageP",
              "5": "phageQ", "6": "phageQ"}
    slen = {"phageP": 20000, "phageQ": 14000}
    rows = []
    for name, seq in iter_fasta(filtered_fasta):
        num = name.split("_")[1]
        ref = ref_of.get(num)
        if ref is None:
            continue
        qlen = len(seq)
        aln = min(qlen, slen[ref])
        rows.append(f"{name}\t{ref}\t99.5\t{qlen}\t{slen[ref]}\t{aln}\t0\t0"
                    f"\t1\t{aln}\t1\t{aln}\t0.0\t{qlen}")
    out.write_text("\n".join(rows) + ("\n" if rows else ""))


@pytest.fixture(scope="module")
def demo_pair(tmp_path_factory):
    """(our final fasta, replay final fasta, out dirs)."""
    import make_demo

    from palace_tpu.config import PalaceConfig
    from palace_tpu.pipeline.driver import run_pipeline

    base = tmp_path_factory.mktemp("replay")

    import numpy as np

    # pass 1: discover the filtered.fasta record names for prestaging.
    # make_demo draws from a MODULE-level RNG stream — reset per build
    # so probe and arm-A worlds are identical regardless of test order
    probe_root = base / "probe"
    make_demo.RNG = np.random.default_rng(123)
    cfg_path = make_demo.build(probe_root)
    _fabricate_assembly_blast(probe_root / "output")
    run_pipeline(PalaceConfig.from_file(cfg_path))
    probe_filtered = probe_root / "output" / "04-match" / "demo_filtered.fasta"

    # pass 2 (arm A): fresh world, both blasts prestaged, our driver
    ours_root = base / "ours"
    make_demo.RNG = np.random.default_rng(123)
    cfg_path = make_demo.build(ours_root)
    _fabricate_assembly_blast(ours_root / "output")
    match_dir = ours_root / "output" / "04-match"
    match_dir.mkdir(parents=True, exist_ok=True)
    _fabricate_filtered_blast(probe_filtered,
                              match_dir / "demo_filtered.fasta.blast")
    final_ours = run_pipeline(PalaceConfig.from_file(cfg_path))

    # arm B: copy arm A's world, erase steps 4-6, replay with the
    # reference scripts
    replay_root = base / "replay"
    shutil.copytree(ours_root, replay_root)
    out = replay_root / "output"
    for sub in ("04-match", "05-furth", "final_result"):
        shutil.rmtree(out / sub, ignore_errors=True)
    final_replay = _replay_steps_4_6(
        out, probe_filtered, base / "fakebin")
    return final_ours, final_replay, ours_root, replay_root


def _replay_steps_4_6(out: Path, probe_filtered, fakebin_dir: Path) -> Path:
    from palace_tpu.graph.depth import DepthStore
    from palace_tpu.graph.native import build_graph, compute_depth_file
    from palace_tpu.io.fasta import FastaStore, build_fai
    from palace_tpu.matching.solver import MatchingOptions, solve_graph_file
    from palace_tpu.pipeline.driver import PalacePipeline

    fake = _mk_fake_samtools(fakebin_dir)
    prefix = "demo"
    asm = out / "02-assembly"
    fasta = asm / "assembly_graph.fasta"
    fastg_fai = asm / "assembly_graph.fastg.fai"
    paths = asm / "contigs.paths"
    blast = Path(str(fasta) + ".blast")
    hit_out = out / "03-search" / "hit_seqs.out"
    scores = out / "03-search" / "node_scores.out"
    phage_refs = out / "03-search" / "phage_refs.fasta"
    ref_pct = out / "03-search" / f"{prefix}_ref_percent.txt"
    depth = asm / f"{prefix}_reads_pe_primary.sort.bam.depth"

    match = out / "04-match"
    match.mkdir(parents=True)
    graph = match / f"{prefix}_graph.txt"
    # step 4.3-4.4: depth + graph are the native layer (shared by both
    # arms — the C++ builder differential covers them separately)
    bam = asm / f"{prefix}_reads_pe_primary.sort.bam"
    compute_depth_file(bam, depth)
    first_depth = DepthStore.read_text(depth).global_average()
    build_graph(bam, fastg_fai, graph, first_depth)

    pre = match / f"{prefix}_filtered_graph_pre.txt"
    filtered = match / f"{prefix}_filtered_graph.txt"
    run_ref("filter_graph.py",
            [fastg_fai, graph, pre, 30, 0, hit_out, scores, blast, 0.7,
             str(fasta) + ".fai", match / "all_hit_segs.txt", paths, 0.7], out)
    subprocess.run(f"uniq {pre} > {filtered}", shell=True, check=True)

    linear = match / f"{prefix}_linear.txt"
    cycle = match / f"{prefix}_cycle.txt"
    solve_graph_file(filtered, linear, cycle,
                     MatchingOptions(iterations=10, single_graph=True,
                                     hints_path=str(paths)))
    nodup = match / f"{prefix}_cycle_nodup.txt"
    run_ref("remove_cycle_dup.py", [cycle, nodup], out)
    all_result = match / f"{prefix}_all_result.txt"
    all_result.write_text(linear.read_text() + nodup.read_text())

    filtered_fasta = match / f"{prefix}_filtered.fasta"
    filtered_cycle = match / f"{prefix}_filtered_cycle.txt"
    run_ref("filter_result.py",
            [fasta, all_result, filtered_fasta, blast, 0.75, hit_out,
             scores, filtered_cycle], out)
    if probe_filtered is not None:
        _fabricate_filtered_blast(probe_filtered,
                                  match / f"{prefix}_filtered.fasta.blast")
    else:  # hostile world: blast boundary degrades to empty, both arms
        (match / f"{prefix}_filtered.fasta.blast").touch()

    # ---- step 5 ----
    furth = out / "05-furth"
    sm = furth / "second_match"
    sm.mkdir(parents=True)
    need = furth / "need_second_match.txt"
    run_ref("generate_second_with_blast.py",
            [match / f"{prefix}_filtered.fasta.blast", need], out)
    run_ref("create_sub_graph.py",
            [filtered, sm / prefix, need, "samtools", depth, blast,
             furth / "similar_ref.txt", ref_pct], out, extra_bin=fake)

    build_fai(fasta)
    for fullname in sorted(sm.glob("*.second")):
        second = str(fullname)[: -len(".second")]
        refname = Path(second).name
        refname = refname[refname.find("_ref") + 4:]
        if refname.endswith("ref"):
            refname = refname[:-3]
        lin = Path(f"{second}_linear.txt")
        cyc = Path(f"{second}_cycle.txt")
        solve_graph_file(fullname, lin, cyc,
                         MatchingOptions(iterations=10, subgraph=True,
                                         aggressive=True,
                                         hints_path=str(paths)))
        result_cycle = Path(f"{second}_result_cycle.txt")
        if cyc.exists() and cyc.stat().st_size > 0:
            nd = Path(f"{second}_cycle_nodup.txt")
            run_ref("remove_cycle_dup.py", [cyc, nd], out)
            result_cycle.write_text(lin.read_text() + nd.read_text())
        else:
            shutil.copy(lin, result_cycle)
        unfiltered = Path(f"{second}_unfiltered.fasta")
        run_ref("make_fa_from_path.py", [fasta, result_cycle, unfiltered, 1], out)

        if refname == "remain":
            # no scaffolds.fasta in the demo world → palace:726-730 copies
            shutil.copy(result_cycle, sm / f"{refname}.result.txt")
            shutil.copy(result_cycle, Path(f"{second}_all_result_before_cut.txt"))
            continue

        safe_ref = refname.replace("|", "_")
        ref_fasta = sm / f"{safe_ref}.fasta"
        store = FastaStore(phage_refs)
        if refname in store:
            ref_fasta.write_text(f">{refname}\n{store.fetch(refname)}\n")
        store.close()
        part_txt = sm / f"{safe_ref}_ragtag_scaffold_part.txt"
        scaffold_fa = sm / f"{safe_ref}_ragtag_scaffold.fasta"
        # RagTag absent → palace:773-781 fallback.  The reference
        # get_main_path.py ZeroDivides on bare "iter"/"self" marker
        # lines (PARITY crash-modes note) — in the reference's conda
        # env RagTag is a declared dependency so this path never sees
        # them; strip markers for the subprocess (our port skips them
        # natively, so both arms compute on the same effective input)
        nomark = Path(f"{second}_result_cycle_nomark.txt")
        nomark.write_text("".join(
            l for l in open(result_cycle)
            if not l.startswith(("iter", "self"))))
        run_ref("get_main_path.py", [fullname, nomark, part_txt], out)
        run_ref("make_fa_from_path.py", [fasta, part_txt, scaffold_fa, 1], out)
        first_line = part_txt.read_text().splitlines()[0] if \
            part_txt.read_text().splitlines() else ""
        scaffold_fa.write_text(
            scaffold_fa.read_text().replace(f"{refname}_RagTag", first_line))
        scaffold_blast = Path(str(scaffold_fa) + ".blast")
        PalacePipeline._fallback_scaffold_blast(
            None, scaffold_fa, ref_fasta, refname, scaffold_blast)
        run_ref("filter_by_blast.py",
                [scaffold_blast, nodup, str(fasta) + ".fai",
                 Path(f"{second}_tmp.txt"), 0, 0.7, 2000, "-s", refname,
                 "--before_cut", Path(f"{second}_all_result_before_cut.txt"),
                 "--gene_hit", hit_out, "--score", scores], out,
                stdout_to=Path(f"{second}_all_result.txt"))

    # ---- step 6 ----
    final_dir = out / "final_result"
    final_dir.mkdir()
    cycle_tmp = final_dir / "filtered_cycle_res_tmp.txt"
    cycle_tmp.touch()
    run_ref("filter_cycle_gene_score.py",
            [filtered_cycle, 0, hit_out, scores, cycle_tmp], out)
    final_tmp = final_dir / f"{prefix}_final_tmp.txt"
    final_tmp.write_text(cycle_tmp.read_text() if cycle_tmp.exists() else "")
    if list(sm.glob("*_ragtag_scaffold_part.txt")):
        run_ref("find_most_common_result.py",
                [sm, furth / "similar_ref.txt", final_tmp], out)
    remain_result = sm / "remain.result.txt"
    if remain_result.exists():
        with open(final_tmp, "a") as fh:
            fh.write(remain_result.read_text())
    before_cut = final_dir / f"{prefix}_all_before_cut.txt"
    with open(before_cut, "w") as fh:
        for c in sorted(sm.glob("*_all_result_before_cut.txt")):
            for line in c.read_text().splitlines(keepends=True):
                # the remain fallback (palace:728-729, no scaffolds.fasta)
                # copies PLAIN path lines into before_cut; the reference
                # corrected_dup.py:614 ValueErrors on any line without
                # ':' — unreachable upstream (SPAdes always leaves
                # scaffolds.fasta, so parse_remain/filter_by_blast write
                # the cut:orig format).  Our parser skips such lines;
                # strip them for the subprocess so both arms see the
                # same effective map (PARITY crash-modes note).
                if ":" in line:
                    fh.write(line)
    filtered_final_tmp = final_dir / f"{prefix}_filtered_final_tmp.txt"
    run_ref("filter_cycle_gene_score.py",
            [final_tmp, 0, hit_out, scores, filtered_final_tmp], out)
    run_ref("corrected_dup.py",
            [final_dir, prefix, cycle_tmp, filtered_final_tmp,
             f"{prefix}_final.txt", f"{prefix}_final.fasta", fasta,
             f"{prefix}_cycle_nodup.txt", depth, before_cut, 10000],
            out, extra_bin=fake)
    run_ref("make_final_fa.py",
            [final_dir / f"{prefix}_final.txt", filtered, fasta,
             final_dir / f"{prefix}_final.fasta", prefix], out)
    return final_dir / f"{prefix}_final.fasta"


def test_final_fasta_matches_reference_composition(demo_pair):
    from palace_tpu.io.fasta import iter_fasta

    final_ours, final_replay, *_ = demo_pair
    ours = dict(iter_fasta(final_ours))
    replay = dict(iter_fasta(final_replay))
    # sequences must agree as multisets; record names carry an index
    # that depends on the (ledgered D4) set-iteration order upstream
    assert sorted(ours.values()) == sorted(replay.values()), (
        f"final FASTA sequences diverge\nours: { {k: len(v) for k, v in ours.items()} }"
        f"\nreplay: { {k: len(v) for k, v in replay.items()} }")
    # cycle/linear tags must agree per sequence
    tags_ours = sorted((v, k.rsplit('_', 1)[1]) for k, v in ours.items())
    tags_replay = sorted((v, k.rsplit('_', 1)[1]) for k, v in replay.items())
    assert tags_ours == tags_replay


def test_per_ref_arm_engaged(demo_pair):
    """The prestaged blasts must drive BOTH arms through the
    per-reference second-match path — otherwise the composition test
    only covers the remain fallback."""
    _, _, ours_root, replay_root = demo_pair
    for root in (ours_root, replay_root):
        out = root / "output"
        assert (out / "05-furth" / "need_second_match.txt").stat().st_size > 0
        sm = out / "05-furth" / "second_match"
        per_ref = [p for p in sm.glob("*.second")
                   if "refremain" not in p.name]
        assert per_ref, f"no per-ref subgraphs in {sm}"
        assert list(sm.glob("*_ragtag_scaffold_part.txt")), (
            "per-ref scaffold parts missing — find_most_common_result "
            "had nothing to vote on")


def test_intermediate_artifacts_agree(demo_pair):
    """Spot-check the big intermediate handoffs, not just the end."""
    _, _, ours_root, replay_root = demo_pair
    for rel, mode in (
        ("output/04-match/demo_filtered_graph.txt", "lineset"),
        ("output/04-match/demo_all_result.txt", "lineset"),
        ("output/05-furth/need_second_match.txt", "exact"),
        ("output/final_result/demo_final.txt", "lineset"),
    ):
        a = (ours_root / rel).read_text()
        b = (replay_root / rel).read_text()
        if mode == "exact":
            assert a == b, f"{rel} differs\nours:\n{a}\nreplay:\n{b}"
        else:
            assert sorted(filter(None, a.splitlines())) == \
                sorted(filter(None, b.splitlines())), f"{rel} differs"


@pytest.fixture(scope="module")
def hostile_pair(tmp_path_factory):
    """The adversarial demo (shared copy-2 repeat, sub-MIN_COUNT chimera
    junction, decoy score/reference) through the same composition
    differential — no prestaged blasts, so both arms ride the
    remain-fallback path with the repeat/copy-number machinery hot."""
    import make_demo

    from palace_tpu.config import PalaceConfig
    from palace_tpu.pipeline.driver import run_pipeline

    base = tmp_path_factory.mktemp("hostile_replay")
    ours_root = base / "ours"
    cfg_path = make_demo.build_hostile(ours_root)
    final_ours = run_pipeline(PalaceConfig.from_file(cfg_path))

    replay_root = base / "replay"
    shutil.copytree(ours_root, replay_root)
    out = replay_root / "output"
    for sub in ("04-match", "05-furth", "final_result"):
        shutil.rmtree(out / sub, ignore_errors=True)
    # build_hostile uses the same prefix/filenames as build (prefix=demo)
    final_replay = _replay_steps_4_6(out, None, base / "fakebin")
    return final_ours, final_replay


def test_hostile_final_fasta_matches(hostile_pair):
    from palace_tpu.io.fasta import iter_fasta

    final_ours, final_replay = hostile_pair
    ours = dict(iter_fasta(final_ours))
    replay = dict(iter_fasta(final_replay))
    assert sorted(ours.values()) == sorted(replay.values()), (
        f"hostile final FASTA diverges\nours: { {k: len(v) for k, v in ours.items()} }"
        f"\nreplay: { {k: len(v) for k, v in replay.items()} }")
