"""Distributed eref at realistic scale (VERDICT r3 item 8).

``run_search_distributed`` was proven correct at toy scale by
tests/test_distributed.py; this measures it on a ~1 M-read synthetic
set: 2 REAL processes (jax.distributed over a localhost coordinator,
gloo collectives) × 4 virtual CPU devices each, one global k=32
sharded count table, per-process FASTQ striping.  Catches the
serialisation cliffs a 38-read test cannot (BASELINE.json config 5
shape).  Records wall-clock + absolute Mkmers/s per process next to
scaling_cpu8.json, and checks the hit lines equal the single-process
``run_search`` on the same inputs.

Usage: python bench_distributed_eref.py          (driver)
Env: PALACE_DBENCH_READS (total reads, default 1000000),
     PALACE_DBENCH_K (32), PALACE_DBENCH_DIR (cache workload).
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

READ_LEN = 150
N_REFS = 20
REF_LEN = 20000


def _worker(port: str, pid: int, nprocs: int, outdir: Path, k: int) -> None:
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1,
                          file=open(outdir / f"stack_p{pid}.txt", "w"))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs, process_id=pid,
    )
    from jax.sharding import Mesh

    from palace_tpu.config import KmerParams
    from palace_tpu.search.eref import run_search_distributed
    from palace_tpu.search.index import build_index
    from palace_tpu.utils.timers import GLOBAL_METRICS

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    params = KmerParams(k=k)
    index = build_index(outdir / "refs.fasta", k=k, save=False)
    t0 = time.perf_counter()
    hits = run_search_distributed(
        [outdir / "reads_1.fastq", outdir / "reads_2.fastq"],
        index, params, outdir / "dist_ref_names.txt", mesh,
    )
    wall = time.perf_counter() - t0
    rec = GLOBAL_METRICS.stages.get("eref.count_reads")
    n_reads = rec.items if rec else 0
    # each read row yields (ROW_LEN - k + 1) * 3 coder hashes
    from palace_tpu.search.eref import ROW_LEN
    maxlen = max(ROW_LEN, k)
    maxlen += (-maxlen) % 8
    kmers = n_reads * (maxlen - k + 1) * 3
    (outdir / f"bench_p{pid}.json").write_text(json.dumps({
        "pid": pid,
        "wall_s": round(wall, 2),
        "phaseA_s": round(rec.seconds, 2) if rec else None,
        "local_reads": int(n_reads),
        "local_Mkmers_per_s": round(kmers / rec.seconds / 1e6, 2) if rec else 0,
        "hits": [h.line() for h in hits],
    }))
    jax.distributed.shutdown()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
                Path(sys.argv[5]), int(sys.argv[6]))
        return

    total_reads = int(os.environ.get("PALACE_DBENCH_READS", "1000000"))
    k = int(os.environ.get("PALACE_DBENCH_K", "32"))
    cache = os.environ.get("PALACE_DBENCH_DIR")
    outdir = Path(cache) if cache else Path(tempfile.mkdtemp(prefix="deref_"))
    outdir.mkdir(parents=True, exist_ok=True)

    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    stamp = outdir / f"stamp_{total_reads}_{k}.txt"
    if not stamp.exists():
        rng = np.random.default_rng(7)
        refs = rng.integers(0, 4, (N_REFS, REF_LEN), dtype=np.uint8)
        with open(outdir / "refs.fasta", "w") as fh:
            for i in range(N_REFS):
                fh.write(f">ref{i + 1}\n" + bytes(lut[refs[i]]).decode() + "\n")
        per_file = total_reads // 2
        present = N_REFS // 2
        for fi in (1, 2):
            which = rng.integers(0, present, per_file)
            starts = rng.integers(0, REF_LEN - READ_LEN, per_file)
            with open(outdir / f"reads_{fi}.fastq", "w") as fh:
                for i in range(per_file):
                    seq = bytes(
                        lut[refs[which[i], starts[i]:starts[i] + READ_LEN]]
                    ).decode()
                    fh.write(f"@r{fi}_{i}\n{seq}\n+\n{'I' * READ_LEN}\n")
        stamp.write_text("ok")

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", str(port), str(pid), "2",
             str(outdir), str(k)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=3000) for p in procs]
    dist_wall = time.perf_counter() - t0
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker {p.pid} failed:\n{out}\n{err[-3000:]}"
    per_proc = [json.loads((outdir / f"bench_p{pid}.json").read_text())
                for pid in range(2)]
    assert per_proc[0]["hits"] == per_proc[1]["hits"], "hit lines diverge"

    # single-process arm on the same inputs (correctness + comparison)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from palace_tpu.config import KmerParams
    from palace_tpu.search.eref import run_search
    from palace_tpu.search.index import build_index

    params = KmerParams(k=k)
    index = build_index(outdir / "refs.fasta", k=k, save=False)
    t0 = time.perf_counter()
    hits = run_search(outdir / "reads_1.fastq", outdir / "reads_2.fastq",
                      index, params, outdir / "single_ref_names.txt")
    single_wall = time.perf_counter() - t0

    result = {
        "total_reads": total_reads,
        "k": k,
        "n_refs": N_REFS,
        "processes": 2,
        "devices_per_process": 4,
        "dist_wall_s": round(dist_wall, 2),
        "per_process": [{kk: v for kk, v in d.items() if kk != "hits"}
                        for d in per_proc],
        "single_process_wall_s": round(single_wall, 2),
        "hits_equal_single": per_proc[0]["hits"] == [h.line() for h in hits],
        "n_hits": len(hits),
        "recorded_unix": int(time.time()),
    }
    print(json.dumps(result, indent=1))
    (Path(__file__).parent / "dist_eref_scale.json").write_text(
        json.dumps(result, indent=1) + "\n")


if __name__ == "__main__":
    main()
