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
    )
    print(f"demo ready: {cfg}")
    return cfg


if __name__ == "__main__":
    root = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/palace_demo")
    root.mkdir(parents=True, exist_ok=True)
    build(root)
