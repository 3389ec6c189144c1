"""Build hook: compile the native host runtime (BGZF/BAM graph builder
and FASTQ code-batch loader — reference bin/generate_graph.cpp and the
pthread FASTQ splitting of bin/extract_ref.cpp:1267-1329) during an
sdist/wheel build.  Pure-Python oracles keep the package working when
the toolchain is absent, so failure here is a warning, not an error."""
import subprocess
import sys
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        native = Path(__file__).parent / "native"
        if (native / "Makefile").exists():
            try:
                subprocess.run(["make", "-C", str(native)], check=True)
            except Exception as exc:  # toolchain absent: fall back to Python paths
                print(f"warning: native build skipped ({exc})", file=sys.stderr)
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
