"""bench.py must print exactly one JSON line with the driver-contract
keys, even without a healthy TPU (CPU-forced here to stay hermetic)."""
import json
import pytest
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
    # robust-headline keys (VERDICT r3 weak #4/#5): median-of-reps with
    # spread, and the MFU figure labeled as the estimate it is
    assert len(rec["reps_contigs_per_s"]) >= 1
    assert len(rec["spread_min_max"]) == 2
    assert "mfu_est" in rec and "mfu" not in rec


def test_wheel_smoke():
    """Build the wheel, install into a scratch --target site, and prove
    the native artifacts + stage CLI work OUTSIDE the repo checkout
    (VERDICT r2 #10; scripts/wheel_smoke.sh)."""
    import shutil
    import subprocess
    from pathlib import Path

    if shutil.which("make") is None or shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    script = Path(__file__).parent.parent / "scripts" / "wheel_smoke.sh"
    res = subprocess.run(["bash", str(script)], capture_output=True,
                         text=True, timeout=900)
    assert res.returncode == 0, f"{res.stdout}\n{res.stderr}"
    assert "WHEEL SMOKE TEST PASSED" in res.stdout
