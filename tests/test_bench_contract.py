"""bench.py must print exactly one JSON line with the driver-contract
keys, even without a healthy TPU (CPU-forced here to stay hermetic)."""
import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_bench_json_contract():
    env = dict(os.environ)
    env.update(
        PALACE_BENCH_FORCE_CPU="1",
        PALACE_BENCH_CONTIGS="8",
        PALACE_BENCH_BATCH="8",
        PALACE_BENCH_LEN="2000",
    )
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "contigs_scored_per_sec_per_chip"
    assert rec["unit"] == "contigs/s"
    assert rec["value"] > 0
    assert "vs_baseline" in rec
