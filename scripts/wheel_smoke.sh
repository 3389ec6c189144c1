#!/usr/bin/env bash
# Installed-wheel smoke test (VERDICT r2 #10): build the wheel, install
# it into a scratch venv (system site-packages for jax/numpy — the
# wheel itself installs --no-deps), and verify OUTSIDE the repo
# checkout that (a) the native runtime artifacts resolve from package
# data, (b) the stage CLI runs fastg2fa end-to-end, (c) the driver
# entry point answers --help.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

pip wheel "$REPO" -w "$WORK/dist" --no-deps --no-build-isolation -q
WHEEL="$(ls "$WORK"/dist/*.whl)"
# The environment's python is itself a venv (/opt/venv), so a child venv
# with --system-site-packages would NOT see jax/numpy (they live in the
# venv, not the base).  Install the wheel into a scratch --target dir
# instead and resolve it via PYTHONPATH from OUTSIDE the repo checkout —
# same isolation property: every palace_tpu import comes from the wheel.
pip install -q --no-deps --target "$WORK/site" "$WHEEL"
export PYTHONPATH="$WORK/site"

cd "$WORK"  # run OUTSIDE the repo so imports come from the wheel
python - << 'PY'
import palace_tpu, pathlib
p = pathlib.Path(palace_tpu.__file__).resolve()
assert "/site/" in str(p), f"imported from checkout, not wheel: {p}"
from palace_tpu._native import find_artifact
for name in ("palace_native", "libfastqcodec.so"):
    path, _ = find_artifact(name)
    assert path is not None and "/site/" in str(path), (name, path)
    print("native artifact ok:", path.name)
from palace_tpu.io.fastq_native import packer_lib
assert packer_lib() is not None, "libfastqcodec failed to load from wheel"
print("native .so loads from installed wheel")
PY

# fastg2fa end-to-end through the installed CLI
printf '>EDGE_1_length_8_cov_5:EDGE_2_length_4_cov_3;\nACGTACGT\n>EDGE_2_length_4_cov_3;\nTTGG\n' > g.fastg
python -m palace_tpu.cli fastg2fa g.fastg out.fa
grep -q "EDGE_1_length_8_cov_5" out.fa
grep -q "ACGTACGT" out.fa
echo "fastg2fa via installed wheel ok"

python -m palace_tpu.pipeline.driver --help > /dev/null
PYTHONPATH="$WORK/site" python "$WORK/site/bin/palace-tpu-stage" --help > /dev/null
echo "entry points ok"
echo "WHEEL SMOKE TEST PASSED"
