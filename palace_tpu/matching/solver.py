"""Conjugate-graph decomposition ("matching") solver.

The reference ships only a missing binary (``bin/matching``, the
seqGraph_phage project — SURVEY.md §2.3); its *interface* is known from
the call sites (palace:587-590, :684-688, :734-739):

    matching -g graph -r linear_out -c cycle_out [-s] -i N [-b]
             -l contigs.paths [--aggressive]

and its *output contract* from the consumers: a linear file of
tab-separated oriented-token lines and a cycle file of
(marker, path) line pairs with ``iter``/``self`` markers
(remove_cycle_dup.py:9-27, filter_result.py:125-171).

This is a from-scratch solver on the conjugate graph:

* each segment contributes ``copy`` placement slots; every physical
  copy has a HEAD and a TAIL end usable at most once;
* an oriented junction (A,oA,B,oB) joins A's (oA=='+' ? TAIL : HEAD)
  to B's (oB=='+' ? HEAD : TAIL) and is identical to its conjugate
  (B,~oB) → (A,~oA);
* iterative greedy maximum-weight matching: junction weight = read
  support, boosted when the pair is adjacent in a SPAdes path hint
  (-l) and, in subgraph mode (-b/--aggressive), when the segments are
  consecutive in reference order (the extra SEG column written by
  create_sub_graph.py:74-77);
* matched junction instances are threaded into walks; closed walks go
  to the cycle file (``iter``-marked; single-node cycles ``self``-
  marked), open walks and unplaced segments to the linear file.

Budgets (copy numbers) and junction multiplicities are hard
constraints — properties the tests assert.
"""
from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Set, Tuple

from palace_tpu.io.graph_io import Graph, JuncRecord, SegRecord, parse_graph_file
from palace_tpu.io.paths_io import spades_path_number_lines

HEAD, TAIL = 0, 1
_FLIP = {"+": "-", "-": "+"}


@dataclass
class MatchingOptions:
    iterations: int = 10          # -i
    single_graph: bool = False    # -s (global graph mode)
    subgraph: bool = False        # -b (per-reference subgraph mode)
    aggressive: bool = False      # --aggressive
    hints_path: Optional[str] = None  # -l contigs.paths
    hint_bonus: float = 5.0
    ref_order_bonus: float = 10.0


@dataclass(frozen=True)
class Link:
    """Canonical oriented junction: the lexicographically smaller of
    the junction and its conjugate."""

    left: str
    lo: str
    right: str
    ro: str

    @staticmethod
    def canonical(left: str, lo: str, right: str, ro: str) -> "Link":
        a = (left, lo, right, ro)
        b = (right, _FLIP[ro], left, _FLIP[lo])
        return Link(*min(a, b))

    def conjugate_tuple(self) -> Tuple[str, str, str, str]:
        return (self.right, _FLIP[self.ro], self.left, _FLIP[self.lo])

    def left_end(self) -> Tuple[str, int]:
        return (self.left, TAIL if self.lo == "+" else HEAD)

    def right_end(self) -> Tuple[str, int]:
        return (self.right, HEAD if self.ro == "+" else TAIL)


def _node_out_end(seg: str, orient: str) -> Tuple[str, int]:
    """End consumed when leaving oriented node seg^orient."""
    return (seg, TAIL if orient == "+" else HEAD)


def _node_in_end(seg: str, orient: str) -> Tuple[str, int]:
    """End consumed when entering oriented node seg^orient."""
    return (seg, HEAD if orient == "+" else TAIL)


def _segment_number(name: str) -> Optional[str]:
    """SPAdes node number from ``EDGE_<n>_length_..`` names."""
    parts = name.split("_")
    return parts[1] if len(parts) > 1 else None


def _load_hint_pairs(hints_path: str, segs: Dict[str, SegRecord]) -> Set[Tuple[str, str, str, str]]:
    """Oriented (name, o, name, o) pairs adjacent in SPAdes paths."""
    num_to_name = {}
    for name in segs:
        num = _segment_number(name)
        if num is not None:
            num_to_name[num] = name
    pairs: Set[Tuple[str, str, str, str]] = set()
    try:
        rows = list(spades_path_number_lines(hints_path))
    except OSError:
        return pairs
    for row in rows:
        toks = [(num_to_name.get(t[:-1]), t[-1]) for t in row if t]
        for (n1, o1), (n2, o2) in zip(toks, toks[1:]):
            if n1 and n2:
                pairs.add((n1, o1, n2, o2))
                pairs.add((n2, _FLIP[o2], n1, _FLIP[o1]))
    return pairs


@dataclass
class _Walk:
    nodes: List[Tuple[str, str]]  # (seg, orient)
    closed: bool = False

    def tokens(self) -> List[str]:
        return [f"{seg}{o}" for seg, o in self.nodes]


@dataclass
class MatchingResult:
    linear: List[_Walk] = field(default_factory=list)
    cycles: List[_Walk] = field(default_factory=list)

    def write(self, linear_path: str | Path, cycle_path: str | Path) -> None:
        with open(linear_path, "w") as fh:
            for w in self.linear:
                fh.write("\t".join(w.tokens()) + "\n")
        with open(cycle_path, "w") as fh:
            for i, w in enumerate(self.cycles):
                marker = "self" if len(w.nodes) == 1 else f"iter {i + 1}"
                fh.write(marker + "\n")
                fh.write("\t".join(w.tokens()) + "\n")


class _Solver:
    def __init__(self, graph: Graph, opts: MatchingOptions):
        self.graph = graph
        self.opts = opts
        self.copies: Dict[str, int] = {
            name: max(1, seg.copy_number) for name, seg in graph.segs.items()
        }
        # remaining end slots per (seg, end)
        self.end_free: Dict[Tuple[str, int], int] = {}
        for name, c in self.copies.items():
            self.end_free[(name, HEAD)] = c
            self.end_free[(name, TAIL)] = c
        self.visits_free: Dict[str, int] = dict(self.copies)

        hints = (
            _load_hint_pairs(opts.hints_path, graph.segs) if opts.hints_path else set()
        )
        ref_order: Dict[str, int] = {}
        if opts.subgraph or opts.aggressive:
            for name, seg in graph.segs.items():
                if seg.ref_order is not None:
                    try:
                        ref_order[name] = int(float(seg.ref_order))
                    except ValueError:
                        pass

        # canonical link weights (conjugates merge)
        self.weights: Dict[Link, float] = {}
        self.budget: Dict[Link, int] = {}
        for j in graph.juncs:
            if j.left not in graph.segs or j.right not in graph.segs:
                continue
            link = Link.canonical(j.left, j.left_orient, j.right, j.right_orient)
            w = float(j.support + j.span_no_fastg)
            if (j.left, j.left_orient, j.right, j.right_orient) in hints or (
                link.left, link.lo, link.right, link.ro
            ) in hints:
                w += opts.hint_bonus
            oa = ref_order.get(j.left)
            ob = ref_order.get(j.right)
            if oa is not None and ob is not None and oa >= 0 and abs(ob - oa) == 1:
                w += opts.ref_order_bonus
            if link in self.weights:
                self.weights[link] = max(self.weights[link], w)
            else:
                self.weights[link] = w
            cap = min(self.copies.get(j.left, 1), self.copies.get(j.right, 1))
            self.budget[link] = max(self.budget.get(link, 0), cap)

        # adjacency: oriented node -> [(link, forward?)], pre-sorted by
        # descending weight so _next_from never re-sorts
        self.adj: Dict[Tuple[str, str], List[Tuple[Link, bool]]] = {}
        for link in self.weights:
            self.adj.setdefault((link.left, link.lo), []).append((link, True))
            conj = link.conjugate_tuple()
            self.adj.setdefault((conj[0], conj[1]), []).append((link, False))
        for lst in self.adj.values():
            lst.sort(key=lambda lf: (-self.weights[lf[0]], lf[0].left, lf[0].lo,
                                     lf[0].right, lf[0].ro))

        # start-link priority heap.  Budgets, end slots and visit counts
        # only ever DECREASE, so once a link fails the start criteria it
        # fails forever — lazy deletion from a heap is exact, turning the
        # per-walk full rescan into amortised O(log n).
        self._start_heap: List[Tuple[float, str, str, str, str]] = [
            (-w, link.left, link.lo, link.right, link.ro)
            for link, w in self.weights.items()
        ]
        heapq.heapify(self._start_heap)
        self._heap_links: Dict[Tuple[float, str, str, str, str], Link] = {
            (-w, link.left, link.lo, link.right, link.ro): link
            for link, w in self.weights.items()
        }

    # ------------------------------------------------------------------
    def _use_link(self, link: Link) -> None:
        self.budget[link] -= 1
        self.end_free[link.left_end()] -= 1
        self.end_free[link.right_end()] -= 1

    def _link_usable(self, link: Link) -> bool:
        if self.budget.get(link, 0) <= 0:
            return False
        le, re = link.left_end(), link.right_end()
        if le == re:  # e.g. A+→A−: the same physical end twice
            return self.end_free[le] >= 2
        return self.end_free[le] > 0 and self.end_free[re] > 0

    def _next_from(self, node: Tuple[str, str]) -> Optional[Tuple[Link, Tuple[str, str]]]:
        """Best usable outgoing link from an oriented node (the target
        must still have a free visit)."""
        best = None
        for link, fwd in self.adj.get(node, []):
            if not self._link_usable(link):
                continue
            if fwd:
                target = (link.right, link.ro)
            else:
                conj = link.conjugate_tuple()
                target = (conj[2], conj[3])
            if self.visits_free.get(target[0], 0) <= 0:
                continue
            best = (link, target)
            break
        return best

    def _start_usable(self, link: Link) -> bool:
        if not self._link_usable(link):
            return False
        if link.left == link.right and link.lo != link.ro:
            # inverted self-repeat places two copies of the segment
            return self.visits_free.get(link.left, 0) >= 2
        return (
            self.visits_free.get(link.left, 0) > 0
            and self.visits_free.get(link.right, 0) > 0
        )

    def _start_link(self) -> Optional[Link]:
        heap = self._start_heap
        while heap:
            link = self._heap_links[heap[0]]
            if self._start_usable(link):
                # leave it on the heap: with budget > 1 it may start
                # another walk; it's popped once it turns unusable
                return link
            heapq.heappop(heap)
        return None

    # ------------------------------------------------------------------
    def solve(self) -> MatchingResult:
        result = MatchingResult()
        max_walks = max(1, self.opts.iterations) * (len(self.graph.segs) + 1) * 4

        for _ in range(max_walks):
            start = self._start_link()
            if start is None:
                break

            if start.left == start.right and start.lo == start.ro:
                # self-circularisation: one copy closing on itself
                self._use_link(start)
                self.visits_free[start.left] -= 1
                result.cycles.append(_Walk([(start.left, start.lo)], closed=True))
                continue

            self._use_link(start)
            nodes = [(start.left, start.lo), (start.right, start.ro)]
            self.visits_free[start.left] -= 1
            self.visits_free[start.right] -= 1

            # extend forward
            while True:
                nxt = self._next_from(nodes[-1])
                if nxt is None:
                    break
                link, target = nxt
                self._use_link(link)
                self.visits_free[target[0]] -= 1
                nodes.append(target)
            # extend backward: predecessors of nodes[0] are successors of
            # its conjugate, reversed and flipped back
            while True:
                head = nodes[0]
                conj_head = (head[0], _FLIP[head[1]])
                nxt = self._next_from(conj_head)
                if nxt is None:
                    break
                link, target = nxt
                self._use_link(link)
                self.visits_free[target[0]] -= 1
                nodes.insert(0, (target[0], _FLIP[target[1]]))

            # closing link tail → head?
            closed = False
            for link, fwd in self.adj.get(nodes[-1], []):
                target = (
                    (link.right, link.ro) if fwd else link.conjugate_tuple()[2:4]
                )
                if tuple(target) == nodes[0] and self._link_usable(link):
                    self._use_link(link)
                    closed = True
                    break

            walk = _Walk(nodes, closed=closed)
            (result.cycles if closed else result.linear).append(walk)

        # unplaced segments → singleton linear paths (deterministic order)
        for name in sorted(self.graph.segs):
            if self.visits_free.get(name, 0) >= self.copies[name] and self.copies[name] > 0:
                result.linear.append(_Walk([(name, "+")]))
                self.visits_free[name] -= 1
        return result


def solve_matching(graph: Graph, opts: Optional[MatchingOptions] = None) -> MatchingResult:
    return _Solver(graph, opts or MatchingOptions()).solve()


def solve_graph_file(
    graph_path: str | Path,
    linear_out: str | Path,
    cycle_out: str | Path,
    opts: Optional[MatchingOptions] = None,
) -> MatchingResult:
    """File-level entry point with the reference CLI's data contract."""
    graph = parse_graph_file(graph_path)
    result = solve_matching(graph, opts)
    result.write(linear_out, cycle_out)
    return result


def main(argv: Optional[Sequence[str]] = None) -> int:
    """CLI compatible with the reference call sites."""
    import argparse

    ap = argparse.ArgumentParser(prog="palace-matching")
    ap.add_argument("-g", required=True, dest="graph")
    ap.add_argument("-r", required=True, dest="linear")
    ap.add_argument("-c", required=True, dest="cycle")
    ap.add_argument("-s", action="store_true", dest="single")
    ap.add_argument("-b", action="store_true", dest="subgraph")
    ap.add_argument("-i", type=int, default=10, dest="iterations")
    ap.add_argument("-l", dest="hints", default=None)
    ap.add_argument("--aggressive", action="store_true")
    args = ap.parse_args(argv)
    opts = MatchingOptions(
        iterations=args.iterations,
        single_graph=args.single,
        subgraph=args.subgraph,
        aggressive=args.aggressive,
        hints_path=args.hints,
    )
    solve_graph_file(args.graph, args.linear, args.cycle, opts)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
