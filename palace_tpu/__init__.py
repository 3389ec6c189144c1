"""palace_tpu — a TPU-native phage-genome assembly engine.

A from-scratch rebuild of the capabilities of deepomicslab/PALACE
(reference mounted at /root/reference) designed for JAX/XLA/Pallas on
TPU device meshes rather than the reference's CPU/CUDA stack:

* ``palace_tpu.io``       — the pipeline's data contracts (FASTA/FASTQ/FAI,
  FASTG, SEG/JUNC conjugate graphs, path/result files, BLAST outfmt-6,
  depth stores).  Mirrors the file formats catalogued in SURVEY.md §1.
* ``palace_tpu.ops``      — device compute: k-mer coders & canonical
  hashing, sharded count tables, sliding-window scans, and the 3-mer
  transition-matrix encoder, with Pallas kernels for the hot loops.
* ``palace_tpu.models``   — the GCN phage scorer (reference
  share/palace/scripts/phage_scoring.py) as pure-JAX dense compute,
  plus a training step the reference never had.
* ``palace_tpu.search``   — the k-mer reference search engine
  (reference bin/extract_ref.cpp) on sharded device arrays.
* ``palace_tpu.graph``    — junction-graph construction
  (reference bin/generate_graph.cpp) and graph filtering.
* ``palace_tpu.matching`` — the conjugate-graph decomposer (the
  reference ships only a missing binary ``bin/matching``).
* ``palace_tpu.filters``  — the second-pass / final filter stages
  (reference share/palace/scripts/*.py semantics, re-implemented).
* ``palace_tpu.pipeline`` — config, stage runner with artifact
  checkpointing, and the end-to-end driver (reference ``palace`` bash).
* ``palace_tpu.parallel`` — mesh/sharding helpers (no analogue in the
  reference, which parallelises only with pthreads/process pools).
"""

__version__ = "0.1.0"


def _enable_persistent_jit_cache() -> None:
    """Persistent XLA compilation cache, on by default for every
    import of the package (production default, not just the CLI).

    The engine's jit set is stable across runs (fixed shapes by
    design: READ_BATCH batches, {2^n, 1.5·2^n} Phase-B buckets), so a
    disk cache turns every run after the first into a warm start —
    first-compile on the tunneled TPU costs tens of seconds per kernel
    and would otherwise recur per process.  Opt out / relocate via
    PALACE_NO_COMPILE_CACHE / PALACE_COMPILE_CACHE_DIR."""
    try:
        from palace_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:  # jax absent or too old for the knobs — run cold
        pass


_enable_persistent_jit_cache()
