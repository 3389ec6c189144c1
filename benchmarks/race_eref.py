"""THE RACE: our TPU eref vs the reference C++ binary on identical
inputs (VERDICT r3 missing #1 — the one hot engine never raced).

Workload (apples-to-apples per the r3 prescription): ~200 k × 150 bp
paired reads over a multi-reference DB with uniform record lengths
(the binary's documented determinism quirk).  Reads are drawn from the
references (half revcomp) plus a random-background fraction, so both
Phase A (count) and Phase B (scan) do real work and both engines must
report the same hit lines.

The reference binary (/root/reference/bin/eref, extract_ref.cpp) runs
everything in one process; its phase split is decomposed with two
auxiliary runs (tiny-DB ⇒ Phase-A-dominated, tiny-reads ⇒ Phase-B-
dominated) sharing the constant ~20 GB allocation overhead.  Our side
reports its internal split directly.

Outputs one JSON object and writes benchmarks/race_eref.json.

Env knobs: PALACE_RACE_PAIRS (200000), PALACE_RACE_REFS (100),
PALACE_RACE_REFLEN (20000), PALACE_RACE_THREADS (8),
PALACE_RACE_DIR (cache the generated workload between runs),
PALACE_RACE_SKIP_BINARY=1 (our side only).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

EREF_BIN = Path("/root/reference/bin/eref")
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = np.array([3, 2, 1, 0], dtype=np.uint8)


def _codes_to_str(codes: np.ndarray) -> str:
    return BASES[codes].tobytes().decode()


def make_workload(data_dir: Path, n_pairs: int, n_refs: int, ref_len: int,
                  read_len: int = 150, bg_frac: float = 0.3) -> dict:
    """Deterministic synthetic workload; cached by a stamp file."""
    stamp = data_dir / f"stamp_{n_pairs}_{n_refs}_{ref_len}_{read_len}.json"
    if stamp.exists():
        return json.loads(stamp.read_text())
    rng = np.random.default_rng(20260821)
    refs = rng.integers(0, 4, (n_refs, ref_len), dtype=np.uint8)
    db = data_dir / "phagedb.fa"
    with open(db, "w") as fh:
        for i in range(n_refs):
            fh.write(f">phage{i + 1}\n")
            s = _codes_to_str(refs[i])
            for off in range(0, ref_len, 70):
                fh.write(s[off:off + 70] + "\n")

    # reads: first 60 % of refs are "present" (deep tiling), the rest
    # untouched; bg_frac of pairs are random background
    n_present = max(1, int(n_refs * 0.6))
    n_bg = int(n_pairs * bg_frac)
    n_ref_reads = n_pairs - n_bg
    which = rng.integers(0, n_present, n_ref_reads)
    starts = rng.integers(0, ref_len - 2 * read_len - 50, n_ref_reads)
    fq1, fq2 = data_dir / "r1.fq", data_dir / "r2.fq"
    qual = "I" * read_len
    with open(fq1, "w") as f1, open(fq2, "w") as f2:
        for i in range(n_ref_reads):
            r, s = int(which[i]), int(starts[i])
            a = refs[r, s:s + read_len]
            b = refs[r, s + read_len + 50:s + 2 * read_len + 50]
            b = COMP[b][::-1]  # mate on the opposite strand
            f1.write(f"@p{i}/1\n{_codes_to_str(a)}\n+\n{qual}\n")
            f2.write(f"@p{i}/2\n{_codes_to_str(b)}\n+\n{qual}\n")
        bg = rng.integers(0, 4, (2 * n_bg, read_len), dtype=np.uint8)
        for i in range(n_bg):
            f1.write(f"@b{i}/1\n{_codes_to_str(bg[2 * i])}\n+\n{qual}\n")
            f2.write(f"@b{i}/2\n{_codes_to_str(bg[2 * i + 1])}\n+\n{qual}\n")

    # tiny arms for the binary's phase decomposition
    tinydb = data_dir / "tinydb.fa"
    with open(tinydb, "w") as fh:
        for i in range(2):
            fh.write(f">t{i + 1}\n")
            s = _codes_to_str(refs[i][:5000])
            for off in range(0, 5000, 70):
                fh.write(s[off:off + 70] + "\n")
    tiny1, tiny2 = data_dir / "tiny1.fq", data_dir / "tiny2.fq"
    for p in (tiny1, tiny2):
        with open(p, "w") as fh:
            fh.write(f"@t0\n{_codes_to_str(refs[0][:read_len])}\n+\n{qual}\n")

    meta = dict(
        db=str(db), fq1=str(fq1), fq2=str(fq2), tinydb=str(tinydb),
        tiny1=str(tiny1), tiny2=str(tiny2), n_pairs=n_pairs,
        n_refs=n_refs, ref_len=ref_len, read_len=read_len,
        total_bp=2 * n_pairs * read_len,
    )
    stamp.write_text(json.dumps(meta))
    return meta


def run_binary(fq1: str, fq2: str, db: str, tmp: Path, threads: int) -> dict:
    t0 = time.perf_counter()
    res = subprocess.run(
        [str(EREF_BIN), fq1, fq2, db, str(tmp / "iv.txt"),
         "0.9", "0.85", str(threads)],
        capture_output=True, text=True, timeout=3600,
    )
    wall = time.perf_counter() - t0
    assert res.returncode == 0, res.stderr[-2000:]
    lines = [l for l in res.stdout.splitlines() if l.startswith("ref_index")]
    return {"wall_s": round(wall, 2), "hits": lines}


def run_ours(meta: dict) -> dict:
    from palace_tpu.config import KmerParams
    from palace_tpu.ops.kmer import pack_codes_mask
    from palace_tpu.search.eref import (
        ROW_LEN, count_reads_into_table, read_batch_size, read_code_batches,
        search_references,
    )
    from palace_tpu.search.index import build_index, perm_from_reference_index

    params = KmerParams()
    perm = perm_from_reference_index(meta["db"] + ".k32.index.dat")
    t0 = time.perf_counter()
    index = build_index(meta["db"], k=32, save=True, perm=perm)
    t_index = time.perf_counter() - t0

    # attribution arm 1: host-only parse+pack wall (same iterator the
    # production loop drives; measures IO + native decode + packing)
    maxlen = max(ROW_LEN, params.k)
    maxlen += (-maxlen) % 8
    batch = read_batch_size()
    t0 = time.perf_counter()
    n_reads = 0
    prepacked = []
    for fq in (meta["fq1"], meta["fq2"]):
        for codes in read_code_batches(fq, batch, maxlen, 100, params.k):
            n_reads += codes.shape[0]
            if codes.shape[0] < batch:
                codes = np.pad(codes, ((0, batch - codes.shape[0]),
                                       (0, 0)), constant_values=4)
            prepacked.append(pack_codes_mask(codes))
    t_host = time.perf_counter() - t0

    # production Phase A + Phase B, REPEATED and interleaved: the relay
    # weather swings the same code 5 s ↔ 173 s across a half hour
    # (recorded in log3 of the r4 build) — only interleaved medians
    # describe the engine rather than the tunnel's mood.
    import statistics

    del prepacked
    reps = int(os.environ.get("PALACE_RACE_REPS", "3"))
    a_ts, b_cold_ts, b_warm_ts = [], [], []
    hits = None
    for rep in range(reps):
        t0 = time.perf_counter()
        table = count_reads_into_table(
            [meta["fq1"], meta["fq2"]], index, params)
        np.asarray(table.table[:1, :1])
        a_ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        hits = search_references(table, index, params)
        (b_cold_ts if rep == 0 else b_warm_ts).append(
            time.perf_counter() - t0)
        if rep == 0:  # warm-vs-cold split: rep 0 pays the jit tracing
            t0 = time.perf_counter()
            hits = search_references(table, index, params)
            b_warm_ts.append(time.perf_counter() - t0)
        del table
    t_A = statistics.median(a_ts)
    t_B_warm = statistics.median(b_warm_ts)

    bp = meta["total_bp"]
    return {
        "index_build_s": round(t_index, 2),
        "host_parse_pack_s": round(t_host, 2),
        "phaseA_s": round(t_A, 2),
        "phaseA_spread_s": [round(min(a_ts), 2), round(max(a_ts), 2)],
        "phaseB_cold_s": round(b_cold_ts[0], 2),
        "phaseB_warm_s": round(t_B_warm, 2),
        "phaseB_spread_s": [round(min(b_warm_ts), 2),
                            round(max(b_warm_ts), 2)],
        "total_s": round(t_A + t_B_warm, 2),
        "n_reads": n_reads,
        "phaseA_reads_per_s": round(n_reads / t_A, 1),
        "phaseA_Mbp_per_s": round(bp / t_A / 1e6, 2),
        "hits": [h.line() for h in hits],
    }


def main() -> None:
    n_pairs = int(os.environ.get("PALACE_RACE_PAIRS", "200000"))
    n_refs = int(os.environ.get("PALACE_RACE_REFS", "100"))
    ref_len = int(os.environ.get("PALACE_RACE_REFLEN", "20000"))
    threads = int(os.environ.get("PALACE_RACE_THREADS", "8"))
    cache = os.environ.get("PALACE_RACE_DIR")
    data_dir = Path(cache) if cache else Path(tempfile.mkdtemp(prefix="race_"))
    data_dir.mkdir(parents=True, exist_ok=True)

    meta = make_workload(data_dir, n_pairs, n_refs, ref_len)

    out: dict = {
        "workload": {k: meta[k] for k in
                     ("n_pairs", "n_refs", "ref_len", "read_len", "total_bp")},
        "nproc": os.cpu_count(),
    }

    # ensure the binary-built index exists (also the source of the coder
    # permutation both engines share); excluded from the race clock on
    # both sides — the reference caches it too (extract_ref.cpp:1245-54)
    if not Path(meta["db"] + ".k32.index.dat").exists():
        run_binary(meta["tiny1"], meta["tiny2"], meta["db"],
                   data_dir, threads)

    hits_file = os.environ.get("PALACE_RACE_BINARY_HITS")
    prev = os.environ.get("PALACE_RACE_REUSE_BINARY")
    if prev and Path(prev).exists():
        # reuse a previous run's binary section (each binary arm costs
        # ~3 min of constant 20 GB-allocation overhead on this box)
        prev_json = json.loads(Path(prev).read_text())
        if "reference_binary" in prev_json:
            out["reference_binary"] = prev_json["reference_binary"]
            out["reference_binary"]["reused_from"] = prev
        if hits_file and Path(hits_file).exists():
            out["_binary_hits"] = Path(hits_file).read_text().splitlines()
    elif os.environ.get("PALACE_RACE_SKIP_BINARY") != "1":
        full = run_binary(meta["fq1"], meta["fq2"], meta["db"],
                          data_dir, threads)
        if not Path(meta["tinydb"] + ".k32.index.dat").exists():
            run_binary(meta["tiny1"], meta["tiny2"], meta["tinydb"],
                       data_dir, threads)
        reads_arm = run_binary(meta["fq1"], meta["fq2"], meta["tinydb"],
                               data_dir, threads)  # Phase A + overhead
        db_arm = run_binary(meta["tiny1"], meta["tiny2"], meta["db"],
                            data_dir, threads)     # Phase B + overhead
        overhead = max(0.0, reads_arm["wall_s"] + db_arm["wall_s"]
                       - full["wall_s"])
        out["reference_binary"] = {
            "threads": threads,
            "wall_s": full["wall_s"],
            "phaseA_est_s": round(full["wall_s"] - db_arm["wall_s"], 2),
            "phaseB_est_s": round(full["wall_s"] - reads_arm["wall_s"], 2),
            "const_overhead_est_s": round(overhead, 2),
            "n_hits": len(full["hits"]),
        }
        out["_binary_hits"] = full["hits"]

    ours = run_ours(meta)
    out["ours"] = {k: v for k, v in ours.items() if k != "hits"}
    out["_our_hits"] = ours["hits"]
    if "_binary_hits" in out:
        # the binary's threads interleave their stdout chunks, so line
        # order is thread-scheduling noise — compare as sorted sets
        out["hits_equal"] = (sorted(out.pop("_binary_hits"))
                             == sorted(out.pop("_our_hits")))
        ref_wall = out["reference_binary"]["wall_s"]
        out["speedup_total"] = round(ref_wall / ours["total_s"], 2)
    else:
        out.pop("_our_hits", None)
    out["recorded_unix"] = int(time.time())

    print(json.dumps(out, indent=1))
    (Path(__file__).parent / "race_eref.json").write_text(
        json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
