"""Build a synthetic demo dataset + config for the pipeline CLI.

Creates a 20 kb circular phage (three contigs) and a 14 kb linear
phage (two contigs), tiled reads,
a BAM with junction evidence, a phage reference DB with decoys, and
pre-staged artifacts for the external-tool stages (QC/assembly/
mapping), then writes ``config.txt``.  Run the pipeline with:

    python scripts/make_demo.py /tmp/palace_demo
    python -m palace_tpu.pipeline.driver --config /tmp/palace_demo/config.txt

(The GCN checkpoint is absent, so contig scoring uses pre-staged
scores; with a real ``gcn_model`` the on-device scorer runs instead.)
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from palace_tpu.io.bam import BamFile, BamRecord, write_bam
from palace_tpu.io.fasta import write_fasta

RNG = np.random.default_rng(123)


def _seq(n):
    return "".join(RNG.choice(list("ACGT"), size=n))


def _write_fastq(path, reads):
    with open(path, "w") as fh:
        for i, r in enumerate(reads):
            fh.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")


def _tile(seq, read_len=100, step=10, offsets=(0, 3, 7)):
    return [
        seq[i : i + read_len]
        for off in offsets
        for i in range(off, len(seq) - read_len + 1, step)
    ]


def build(root: Path) -> Path:
    out_dir = root / "output"
    # phage 1: 20 kb circular, three contigs with a closing junction
    phage = _seq(20000)
    c_lens = [8000, 7000, 5000]
    names = [f"EDGE_{i+1}_length_{L}_cov_10.0" for i, L in enumerate(c_lens)]
    # phage 2: 14 kb LINEAR, two contigs, no closing junction
    phage2 = _seq(14000)
    lin_lens = [8000, 6000]
    lin_names = [f"EDGE_{i+5}_length_{L}_cov_10.0" for i, L in enumerate(lin_lens)]
    bact = "EDGE_4_length_12000_cov_10.0"
    contigs = {
        names[0]: phage[:8000],
        names[1]: phage[8000:15000],
        names[2]: phage[15000:],
        lin_names[0]: phage2[:8000],
        lin_names[1]: phage2[8000:],
        bact: _seq(12000),
    }
    tid_of = {n: i for i, n in enumerate(contigs)}

    qc = out_dir / "01-qc"
    qc.mkdir(parents=True, exist_ok=True)
    reads = _tile(phage + phage[:100]) + _tile(phage2)
    _write_fastq(qc / "demo_1_filter.fastq", reads)
    _write_fastq(qc / "demo_2_filter.fastq", reads)

    asm = out_dir / "02-assembly"
    asm.mkdir(parents=True, exist_ok=True)
    (asm / "contigs.fasta").write_text("".join(f">{n}\n{s}\n" for n, s in contigs.items()))
    write_fasta(asm / "assembly_graph.fasta", list(contigs.items()))
    with open(asm / "assembly_graph.fastg", "w") as fh:
        fh.write(f">{names[0]}:{names[1]};\n{contigs[names[0]]}\n")
        fh.write(f">{names[1]}:{names[2]};\n{contigs[names[1]]}\n")
        fh.write(f">{names[2]}:{names[0]};\n{contigs[names[2]]}\n")
        fh.write(f">{lin_names[0]}:{lin_names[1]};\n{contigs[lin_names[0]]}\n")
        fh.write(f">{lin_names[1]};\n{contigs[lin_names[1]]}\n")
        fh.write(f">{bact};\n{contigs[bact]}\n")
    (asm / "contigs.paths").write_text(
        "NODE_1_length_20000_cov_10\n1+,2+,3+;\n"
        "NODE_2_length_14000_cov_10\n5+,6+;\n"
    )

    records = []
    junctions = [
        (names[0], names[1]), (names[1], names[2]), (names[2], names[0]),
        (lin_names[0], lin_names[1]),
    ]
    for an, bn in junctions:
        a = tid_of[an]
        for i in range(6):
            records.append(
                BamRecord(
                    name=f"sr_{a}_{tid_of[bn]}_{i}", flag=0, tid=a,
                    pos=len(contigs[an]) - 50,
                    mapq=60, cigar=[(50, "M"), (50, "S")], mtid=-1, mpos=-1,
                    tlen=0, seq_len=100,
                    tags={"NM": 0, "SA": f"{bn},1,+,50S50M,60,0;"},
                )
            )
    for tid, name in enumerate(contigs):
        L = len(contigs[name])
        for rep in range(2):
            for pos in range(0, L - 100, 50):
                records.append(
                    BamRecord(
                        name=f"cov_{tid}_{rep}_{pos}", flag=0, tid=tid, pos=pos,
                        mapq=60, cigar=[(100, "M")], mtid=-1, mpos=-1, tlen=0,
                        seq_len=100, tags={"NM": 0},
                    )
                )
    write_bam(
        asm / "demo_reads_pe_primary.sort.bam",
        BamFile(references=[(n, len(s)) for n, s in contigs.items()], records=records),
    )

    search = out_dir / "03-search"
    search.mkdir(parents=True, exist_ok=True)
    with open(search / "hit_seqs.out", "w") as fh:
        for n in names + lin_names:
            fh.write(f"{n}\t8\n")
    with open(search / "node_scores.out", "w") as fh:
        for n in contigs:
            fh.write(f"{n}\t{0.95 if n != bact else 0.05}\n")

    db = root / "phagedb.fasta"
    write_fasta(db, [("phageP", phage), ("phageQ", phage2),
                     ("decoy1", _seq(15000)), ("decoy2", _seq(15000))])
    protein_dir = root / "protein_db"
    protein_dir.mkdir(exist_ok=True)
    (protein_dir / "proteins.fasta").write_text(">prot1\nMAAAKKK\n")

    cfg = root / "config.txt"
    cfg.write_text(
        f"fastq1={qc/'demo_1_filter.fastq'}\n"
        f"fastq2={qc/'demo_2_filter.fastq'}\n"
        f"phagedb={db}\n"
        f"protein_db={protein_dir}\n"
        f"gcn_model={db}\n"  # placeholder file (scores are pre-staged)
        f"out_dir={out_dir}\n"
        "prefix=demo\n"
        "threads=2\n"
        "MIN_LEN=10000\n"
        "kmer_k=16\n"
        "kmer_window=200\n"
        "dev_fabricate_blast=1\n"  # demo runs have no blastn (PARITY.md D10)
    )
    print(f"demo ready: {cfg}")
    return cfg


def build_hostile(root: Path) -> Path:
    """Adversarial demo exercising the failure modes the friendly demo
    avoids (VERDICT r1 weak #8):

    * a 3 kb repeat contig R SHARED by two circular phages → copy
      number 2; the matching solver must traverse it twice and pair
      the right flanks (SPAdes path hints disambiguate the tie);
    * a spurious junction between the two phages with support 3 <
      MIN_COUNT=5 (generate_graph.cpp:1059-1061) → must vanish from
      the graph, else a chimera;
    * a decoy contig scored 0.69 — just under filter_graph.py:20's
      0.7 gate — with no gene/blast evidence → must stay out;
    * a decoy *reference* sharing 60% of phage A (< the 75% window-
      coverage gate, extract_ref.cpp:615-617) → eref must not report it.
    """
    rng = np.random.default_rng(321)

    def seq(n):
        return "".join(rng.choice(list("ACGT"), size=n))

    out_dir = root / "output"
    repeat = seq(3000)
    a1, a2 = seq(7000), seq(8000)
    b1, b2 = seq(6000), seq(6000)
    phage_a = a1 + repeat + a2          # 18 kb circular
    phage_b = b1 + repeat + b2          # 15 kb circular
    names = {
        "A1": "EDGE_1_length_7000_cov_10.0",
        "A2": "EDGE_2_length_8000_cov_10.0",
        "R": "EDGE_7_length_3000_cov_20.0",
        "B1": "EDGE_5_length_6000_cov_10.0",
        "B2": "EDGE_6_length_6000_cov_10.0",
        "BACT": "EDGE_4_length_12000_cov_10.0",
        "DECOY": "EDGE_9_length_5000_cov_10.0",
    }
    contigs = {
        names["A1"]: a1, names["A2"]: a2, names["R"]: repeat,
        names["B1"]: b1, names["B2"]: b2,
        names["BACT"]: seq(12000), names["DECOY"]: seq(5000),
    }
    tid_of = {n: i for i, n in enumerate(contigs)}

    qc = out_dir / "01-qc"
    qc.mkdir(parents=True, exist_ok=True)
    reads = _tile(phage_a + phage_a[:100]) + _tile(phage_b + phage_b[:100])
    _write_fastq(qc / "demo_1_filter.fastq", reads)
    _write_fastq(qc / "demo_2_filter.fastq", reads)

    asm = out_dir / "02-assembly"
    asm.mkdir(parents=True, exist_ok=True)
    (asm / "contigs.fasta").write_text(
        "".join(f">{n}\n{s}\n" for n, s in contigs.items()))
    write_fasta(asm / "assembly_graph.fasta", list(contigs.items()))
    with open(asm / "assembly_graph.fastg", "w") as fh:
        fh.write(f">{names['A1']}:{names['R']};\n{a1}\n")
        fh.write(f">{names['R']}:{names['A2']},{names['B2']};\n{repeat}\n")
        fh.write(f">{names['A2']}:{names['A1']};\n{a2}\n")
        fh.write(f">{names['B1']}:{names['R']};\n{b1}\n")
        fh.write(f">{names['B2']}:{names['B1']};\n{b2}\n")
        fh.write(f">{names['BACT']};\n{contigs[names['BACT']]}\n")
        fh.write(f">{names['DECOY']};\n{contigs[names['DECOY']]}\n")
    # SPAdes path hints break the R-flank tie (A1-R-A2 vs A1-R-B2)
    (asm / "contigs.paths").write_text(
        "NODE_1_length_18000_cov_10\n1+,7+,2+;\n"
        "NODE_2_length_15000_cov_10\n5+,7+,6+;\n"
    )

    records = []

    def split_reads(an, bn, count):
        a = tid_of[an]
        for i in range(count):
            records.append(BamRecord(
                name=f"sr_{a}_{tid_of[bn]}_{i}", flag=0, tid=a,
                pos=len(contigs[an]) - 50, mapq=60,
                cigar=[(50, "M"), (50, "S")], mtid=-1, mpos=-1,
                tlen=0, seq_len=100,
                tags={"NM": 0, "SA": f"{bn},1,+,50S50M,60,0;"},
            ))

    for an, bn in [
        (names["A1"], names["R"]), (names["R"], names["A2"]),
        (names["A2"], names["A1"]),
        (names["B1"], names["R"]), (names["R"], names["B2"]),
        (names["B2"], names["B1"]),
    ]:
        split_reads(an, bn, 6)
    # chimera bait: support 3 < MIN_COUNT → the graph must drop it
    split_reads(names["A2"], names["B1"], 3)

    for tid, name in enumerate(contigs):
        L = len(contigs[name])
        passes = 4 if name == names["R"] else 2  # R: 2× depth → copy 2
        for rep in range(passes):
            for pos in range(0, L - 100, 50):
                records.append(BamRecord(
                    name=f"cov_{tid}_{rep}_{pos}", flag=0, tid=tid, pos=pos,
                    mapq=60, cigar=[(100, "M")], mtid=-1, mpos=-1, tlen=0,
                    seq_len=100, tags={"NM": 0},
                ))
    write_bam(
        asm / "demo_reads_pe_primary.sort.bam",
        BamFile(references=[(n, len(s)) for n, s in contigs.items()],
                records=records),
    )

    search = out_dir / "03-search"
    search.mkdir(parents=True, exist_ok=True)
    phage_names = [names[k] for k in ("A1", "A2", "R", "B1", "B2")]
    with open(search / "hit_seqs.out", "w") as fh:
        for n in phage_names:
            fh.write(f"{n}\t8\n")
    with open(search / "node_scores.out", "w") as fh:
        for n in contigs:
            s = 0.95 if n in phage_names else (
                0.69 if n == names["DECOY"] else 0.05)
            fh.write(f"{n}\t{s}\n")

    db = root / "phagedb.fasta"
    # decoy ref: 60% of phage A + 40% novel → below the 75% cover gate
    write_fasta(db, [
        ("phageA", phage_a), ("phageB", phage_b),
        ("decoyShared", phage_a[:9000] + seq(6000)),
        ("decoyRand", seq(15000)),
    ])
    protein_dir = root / "protein_db"
    protein_dir.mkdir(exist_ok=True)
    (protein_dir / "proteins.fasta").write_text(">prot1\nMAAAKKK\n")

    cfg = root / "config.txt"
    cfg.write_text(
        f"fastq1={qc/'demo_1_filter.fastq'}\n"
        f"fastq2={qc/'demo_2_filter.fastq'}\n"
        f"phagedb={db}\n"
        f"protein_db={protein_dir}\n"
        f"gcn_model={db}\n"
        f"out_dir={out_dir}\n"
        "prefix=demo\n"
        "threads=2\n"
        "MIN_LEN=10000\n"
        "kmer_k=16\n"
        "kmer_window=200\n"
        "dev_fabricate_blast=1\n"  # demo runs have no blastn (PARITY.md D10)
    )
    print(f"hostile demo ready: {cfg}")
    return cfg


if __name__ == "__main__":
    root = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/palace_demo")
    root.mkdir(parents=True, exist_ok=True)
    if len(sys.argv) > 2 and sys.argv[2] == "hostile":
        build_hostile(root)
    else:
        build(root)


def build_random(root: Path, seed: int):
    """Randomized world for the composition differential
    (tests/test_random_world_replay.py): 2-3 planted phages with random
    contig decompositions (circular or linear), 0-2 bacterial decoy
    contigs, clean junction evidence — returns (config_path, expected)
    where expected = [(genome_seq, is_circular), ...].

    Structure is randomized; EVIDENCE is clean (junction support 6 ≥
    MIN_COUNT, scores 0.95 vs decoy 0.05) so every planted genome must
    reconstruct — giving the replay vs-driver comparison a ground truth
    beyond mere agreement.
    """
    rng = np.random.default_rng(seed)

    def seq(n):
        return "".join(rng.choice(list("ACGT"), size=int(n)))

    out_dir = root / "output"
    contigs: dict = {}
    junctions = []
    fastg_next: dict = {}
    paths_lines = []
    phagedb = []
    expected = []
    next_edge = 1

    cov_passes: dict = {}
    phage_members: list = []
    node_no = 1

    def add_chain(names_i, circular):
        for a, b in zip(names_i, names_i[1:]):
            junctions.append((a, b))
            fastg_next.setdefault(a, []).append(b)
        if circular:
            junctions.append((names_i[-1], names_i[0]))
            fastg_next.setdefault(names_i[-1], []).append(names_i[0])

    def add_path_hint(names_i, total):
        nonlocal node_no
        paths_lines.append(f"NODE_{node_no}_length_{int(total)}_cov_10")
        paths_lines.append(
            ",".join(f"{n.split('_')[1]}+" for n in names_i) + ";")
        node_no += 1

    # adversarial option 1 (p=0.6): a pair of circular phages sharing a
    # copy-2 repeat contig (the hostile-demo shape, here with random
    # flank sizes) — the solver must traverse R twice and the SPAdes
    # hints must break the flank tie
    if rng.random() < 0.6:
        r_len = int(rng.integers(2500, 4000))
        repeat = seq(r_len)
        flanks = [int(x) for x in rng.integers(4500, 9000, 4)]
        a1s, a2s, b1s, b2s = (seq(L) for L in flanks)
        rn = f"EDGE_{next_edge}_length_{r_len}_cov_20.0"
        next_edge += 1
        fl_names = []
        for s_, L in zip((a1s, a2s, b1s, b2s), flanks):
            nm = f"EDGE_{next_edge}_length_{L}_cov_10.0"
            next_edge += 1
            contigs[nm] = s_
            fl_names.append(nm)
        contigs[rn] = repeat
        cov_passes[rn] = 4
        a1n, a2n, b1n, b2n = fl_names
        genome_a = a1s + repeat + a2s
        genome_b = b1s + repeat + b2s
        add_chain([a1n, rn, a2n], circular=True)
        add_chain([b1n, rn, b2n], circular=True)
        add_path_hint([a1n, rn, a2n], len(genome_a))
        add_path_hint([b1n, rn, b2n], len(genome_b))
        phagedb.append((f"phage{len(expected)}", genome_a))
        expected.append((genome_a, True))
        phage_members.append([a1n, rn, a2n])
        phagedb.append((f"phage{len(expected)}", genome_b))
        expected.append((genome_b, True))
        phage_members.append([b1n, rn, b2n])
        n_phage = int(rng.integers(0, 2))
    else:
        n_phage = int(rng.integers(2, 4))

    for _ in range(n_phage):
        n_parts = int(rng.integers(2, 5))
        lens = rng.integers(2500, 9000, n_parts)
        while lens.sum() < 10500:
            lens[0] += 5000
        genome = seq(lens.sum())
        circular = bool(rng.random() < 0.6)
        names_i = []
        off = 0
        for L in lens:
            nm = f"EDGE_{next_edge}_length_{int(L)}_cov_10.0"
            next_edge += 1
            contigs[nm] = genome[off:off + int(L)]
            off += int(L)
            names_i.append(nm)
        add_chain(names_i, circular)
        add_path_hint(names_i, lens.sum())
        phagedb.append((f"phage{len(expected)}", genome))
        expected.append((genome, circular))
        phage_members.append(names_i)

    decoys = []
    for _ in range(int(rng.integers(0, 3))):
        L = int(rng.integers(5000, 15000))
        nm = f"EDGE_{next_edge}_length_{L}_cov_10.0"
        next_edge += 1
        contigs[nm] = seq(L)
        decoys.append(nm)

    tid_of = {n: i for i, n in enumerate(contigs)}

    qc = out_dir / "01-qc"
    qc.mkdir(parents=True, exist_ok=True)
    reads = []
    for genome, circular in expected:
        reads += _tile(genome + (genome[:100] if circular else ""))
    _write_fastq(qc / "demo_1_filter.fastq", reads)
    _write_fastq(qc / "demo_2_filter.fastq", reads)

    asm = out_dir / "02-assembly"
    asm.mkdir(parents=True, exist_ok=True)
    (asm / "contigs.fasta").write_text(
        "".join(f">{n}\n{s}\n" for n, s in contigs.items()))
    write_fasta(asm / "assembly_graph.fasta", list(contigs.items()))
    with open(asm / "assembly_graph.fastg", "w") as fh:
        for n, s in contigs.items():
            nbrs = fastg_next.get(n)
            head = f">{n}:{','.join(nbrs)};" if nbrs else f">{n};"
            fh.write(f"{head}\n{s}\n")
    (asm / "contigs.paths").write_text("\n".join(paths_lines) + "\n")

    records = []
    # adversarial option 2 (p=0.6): a chimera-bait junction between two
    # different phages with support 3 < MIN_COUNT=5 — must vanish
    if len(phage_members) >= 2 and rng.random() < 0.6:
        pa, pb = rng.choice(len(phage_members), 2, replace=False)
        an = phage_members[int(pa)][0]
        bn = phage_members[int(pb)][-1]
        junctions.append((an, bn, 3))
    for j in junctions:
        an, bn = j[0], j[1]
        count = j[2] if len(j) > 2 else 6
        a = tid_of[an]
        for i in range(count):
            records.append(BamRecord(
                name=f"sr_{a}_{tid_of[bn]}_{i}", flag=0, tid=a,
                pos=len(contigs[an]) - 50, mapq=60,
                cigar=[(50, "M"), (50, "S")], mtid=-1, mpos=-1,
                tlen=0, seq_len=100,
                tags={"NM": 0, "SA": f"{bn},1,+,50S50M,60,0;"}))
    for tid, name in enumerate(contigs):
        L = len(contigs[name])
        for rep in range(cov_passes.get(name, 2)):
            for pos in range(0, L - 100, 50):
                records.append(BamRecord(
                    name=f"cov_{tid}_{rep}_{pos}", flag=0, tid=tid,
                    pos=pos, mapq=60, cigar=[(100, "M")], mtid=-1,
                    mpos=-1, tlen=0, seq_len=100, tags={"NM": 0}))
    write_bam(
        asm / "demo_reads_pe_primary.sort.bam",
        BamFile(references=[(n, len(s)) for n, s in contigs.items()],
                records=records))

    search = out_dir / "03-search"
    search.mkdir(parents=True, exist_ok=True)
    with open(search / "hit_seqs.out", "w") as fh:
        for n in contigs:
            if n not in decoys:
                fh.write(f"{n}\t8\n")
    with open(search / "node_scores.out", "w") as fh:
        for n in contigs:
            if n in decoys:
                # adversarial option 3: sometimes score a decoy 0.69 —
                # just under filter_graph's 0.7 gate
                s = 0.69 if rng.random() < 0.5 else 0.05
            else:
                s = 0.95
            fh.write(f"{n}\t{s}\n")

    db = root / "phagedb.fasta"
    write_fasta(db, phagedb + [("decoyref", seq(15000))])
    protein_dir = root / "protein_db"
    protein_dir.mkdir(exist_ok=True)
    (protein_dir / "proteins.fasta").write_text(">prot1\nMAAAKKK\n")

    cfg = root / "config.txt"
    cfg.write_text(
        f"fastq1={qc / 'demo_1_filter.fastq'}\n"
        f"fastq2={qc / 'demo_2_filter.fastq'}\n"
        f"phagedb={db}\n"
        f"protein_db={protein_dir}\n"
        f"gcn_model={db}\n"
        f"out_dir={out_dir}\n"
        "prefix=demo\n"
        "threads=2\n"
        "MIN_LEN=10000\n"
        "kmer_k=16\n"
        "kmer_window=200\n"
        "dev_fabricate_blast=1\n"
    )
    return cfg, expected
