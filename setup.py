"""Build hook: compile the native host runtime (BGZF/BAM graph builder
and FASTQ code-batch loader — reference bin/generate_graph.cpp and the
pthread FASTQ splitting of bin/extract_ref.cpp:1267-1329) during an
sdist/wheel build and ship the artifacts as package data in
``palace_tpu/_native/`` so installed wheels resolve them via
palace_tpu._native.find_artifact.  Pure-Python oracles keep the package
working when the toolchain is absent, so failure here is a warning, not
an error."""
import shutil
import subprocess
import sys
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py

NATIVE_ARTIFACTS = ("palace_native", "libfastqcodec.so")


class BuildWithNative(build_py):
    def run(self):
        native = Path(__file__).parent / "native"
        built = []
        if (native / "Makefile").exists():
            try:
                subprocess.run(["make", "-C", str(native)], check=True)
                built = [native / a for a in NATIVE_ARTIFACTS
                         if (native / a).exists()]
            except Exception as exc:  # toolchain absent: fall back to Python paths
                print(f"warning: native build skipped ({exc})", file=sys.stderr)
        super().run()
        # place binaries inside the built package so they install as data
        if built:
            dest = Path(self.build_lib) / "palace_tpu" / "_native"
            dest.mkdir(parents=True, exist_ok=True)
            for artifact in built:
                shutil.copy2(artifact, dest / artifact.name)


setup(cmdclass={"build_py": BuildWithNative})
