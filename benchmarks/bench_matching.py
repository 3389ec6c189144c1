"""Conjugate-graph matching wall-time benchmark (BASELINE.json metric #2).

The reference solver is a missing binary (`bin/matching`, seqGraph —
SURVEY.md §2.3), so there is no upstream number to compare against;
this records OUR solver's wall-time scaling so regressions are visible
across rounds.

Synthetic workload: a copy-number-weighted conjugate graph shaped like
real PALACE graphs — a few long cycles threaded through shared repeat
segments plus noise junctions — at several sizes.  Prints one JSON line
per size.

Usage:  python benchmarks/bench_matching.py [--sizes 100,1000,5000]
"""
from __future__ import annotations

import argparse
import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from palace_tpu.io.graph_io import Graph, JuncRecord, SegRecord
from palace_tpu.matching.solver import MatchingOptions, solve_matching


def synth_graph(n_segs: int, rng: random.Random) -> Graph:
    g = Graph()
    names = [
        f"EDGE_{i}_length_{rng.randint(1000, 40000)}_cov_{rng.uniform(5, 80):.2f}"
        for i in range(n_segs)
    ]
    for name in names:
        copy = 1 if rng.random() < 0.85 else rng.randint(2, 4)
        g.add_seg(SegRecord(name=name, depth=rng.uniform(5, 200), copy_number=copy))
    # a handful of planted cycles covering ~70% of segments
    pool = names[:]
    rng.shuffle(pool)
    used = 0
    while used < int(0.7 * n_segs):
        k = min(rng.randint(3, 12), len(pool) - used)
        cyc = pool[used : used + k]
        used += k
        # one orientation per segment makes the walk closable: junction
        # (a, oa, b, ob) chains a-traversed-oa into b-traversed-ob
        orient = {name: rng.choice("+-") for name in cyc}
        for a, b in zip(cyc, cyc[1:] + cyc[:1]):
            g.add_junc(
                JuncRecord(a, orient[a], b, orient[b],
                           support=rng.randint(5, 60))
            )
    # noise junctions (cross-links, ~0.5 per segment)
    for _ in range(n_segs // 2):
        a, b = rng.sample(names, 2)
        g.add_junc(
            JuncRecord(a, rng.choice("+-"), b, rng.choice("+-"),
                       support=rng.randint(5, 15))
        )
    return g


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="100,1000,5000")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    for size in (int(s) for s in args.sizes.split(",")):
        rng = random.Random(size)
        g = synth_graph(size, rng)
        n_juncs = len(g.juncs)
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            res = solve_matching(g, MatchingOptions(iterations=10, single_graph=True))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "metric": "matching_wall_time",
            "segs": size,
            "juncs": n_juncs,
            "value": round(best, 4),
            "unit": "s",
            "cycles": len(res.cycles),
            "linear": len(res.linear),
        }))


if __name__ == "__main__":
    main()
