"""Stage-level command-line tools — the standalone-CLI surface of the
reference's per-script entry points, multiplexed under one module:

    python -m palace_tpu.cli score   <contigs.fasta> <out> [--model PT]
    python -m palace_tpu.cli eref    <fq1> <fq2> <phagedb> <out> [...]
    python -m palace_tpu.cli graph   <bam> <fastg.fai> <out> [--avg-depth D]
    python -m palace_tpu.cli depth   <bam> <out>
    python -m palace_tpu.cli fastg2fa <in.fastg> <out.fasta>
    python -m palace_tpu.cli matching -g G -r LIN -c CYC [...]
    python -m palace_tpu.cli makefa  <fasta> <paths> <out> [--mode 0|1]

Reference equivalents: phage_scoring.py, bin/eref, bin/generateGraph,
samtools depth, split_fastg.py, bin/matching, make_fa_from_path.py.
"""
from __future__ import annotations

import argparse
import sys
from typing import Optional, Sequence


def _cmd_score(args) -> int:
    from palace_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from palace_tpu.models.gcn import DEFAULT_CONFIG, init_params, load_torch_state_dict
    from palace_tpu.models.scoring import resolve_dtype, score_fasta

    if args.model:
        params = load_torch_state_dict(args.model)
    elif args.allow_random_weights:
        params = init_params(jax.random.PRNGKey(0), DEFAULT_CONFIG)
        print("warning: no --model; scoring with RANDOM weights", file=sys.stderr)
    else:
        print("error: no --model given; random-weight scores are garbage. "
              "Pass --model GCN_model_retrained.pt or opt in with "
              "--allow-random-weights.", file=sys.stderr)
        return 2
    score_fasta(params, args.fasta, args.out, batch_size=args.batch,
                dtype=resolve_dtype(args.dtype))
    return 0


def _cmd_eref(args) -> int:
    from palace_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from palace_tpu.config import KmerParams
    from palace_tpu.search.eref import run_search
    from palace_tpu.search.index import load_or_build_index

    params = KmerParams(
        k=args.k, hit_ratio=args.hit_ratio,
        perfect_hit_ratio=args.perfect_hit_ratio,
    )
    index = load_or_build_index(args.phagedb, k=args.k)
    hits = run_search(args.fq1, args.fq2, index, params, args.out)
    for h in hits:
        print(h.line())
    return 0


def _cmd_graph(args) -> int:
    from palace_tpu.graph.native import build_graph

    build_graph(args.bam, args.fastg_fai, args.out, args.avg_depth)
    return 0


def _cmd_depth(args) -> int:
    from palace_tpu.graph.native import compute_depth_file

    compute_depth_file(args.bam, args.out)
    return 0


def _cmd_fastg2fa(args) -> int:
    from palace_tpu.io.fastg import fastg_to_node_fasta

    n = fastg_to_node_fasta(args.fastg, args.out)
    print(f"{n} nodes", file=sys.stderr)
    return 0


def _cmd_makefa(args) -> int:
    from palace_tpu.assembly.path_fa import make_fa_from_path

    make_fa_from_path(args.fasta, args.paths, args.out, args.mode)
    return 0


def main(argv: Optional[Sequence[str]] = None) -> int:
    # NOTE: the compilation cache is enabled inside the jax-using
    # subcommands (score, eref) — host-only commands (matching, makefa,
    # fastg2fa, depth, graph) must not pay a multi-second jax import.
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "matching":
        from palace_tpu.matching.solver import main as matching_main

        return matching_main(argv[1:])

    ap = argparse.ArgumentParser(prog="palace-tools", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("score", help="GCN contig scoring (phage_scoring.py)")
    p.add_argument("fasta")
    p.add_argument("out")
    p.add_argument("--model", default="")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--dtype", default="float32",
                   help="device compute dtype: float32 (default) or bfloat16")
    p.add_argument("--allow-random-weights", action="store_true",
                   help="score without a checkpoint (garbage probabilities; "
                        "tests/dev only)")
    p.set_defaults(fn=_cmd_score)

    p = sub.add_parser("eref", help="k-mer reference search (bin/eref)")
    p.add_argument("fq1")
    p.add_argument("fq2")
    p.add_argument("phagedb")
    p.add_argument("out")
    p.add_argument("--k", type=int, default=32)
    p.add_argument("--hit-ratio", type=float, default=0.9)
    p.add_argument("--perfect-hit-ratio", type=float, default=0.85)
    p.set_defaults(fn=_cmd_eref)

    p = sub.add_parser("graph", help="junction graph from BAM (bin/generateGraph)")
    p.add_argument("bam")
    p.add_argument("fastg_fai")
    p.add_argument("out")
    p.add_argument("--avg-depth", type=float, default=0.0)
    p.set_defaults(fn=_cmd_graph)

    p = sub.add_parser("depth", help="per-base depth (samtools depth equivalent)")
    p.add_argument("bam")
    p.add_argument("out")
    p.set_defaults(fn=_cmd_depth)

    p = sub.add_parser("fastg2fa", help="FASTG → node FASTA (split_fastg.py)")
    p.add_argument("fastg")
    p.add_argument("out")
    p.set_defaults(fn=_cmd_fastg2fa)

    p = sub.add_parser("makefa", help="path file → FASTA (make_fa_from_path.py)")
    p.add_argument("fasta")
    p.add_argument("paths")
    p.add_argument("out")
    p.add_argument("--mode", type=int, default=0, choices=(0, 1))
    p.set_defaults(fn=_cmd_makefa)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
