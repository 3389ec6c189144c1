"""Persistent XLA compilation cache.

The reference pipeline caches its expensive precompute on disk (the
``.k32.index.dat`` k-mer index, extract_ref.cpp:1245-1254) so reruns
skip it; the TPU-native analogue of that cost is XLA compilation
(20-120 s per program on a TPU backend).  Enabling JAX's persistent
compilation cache gives every driver/CLI/bench invocation the same
skip-if-done semantics the reference gets from its artifact files.

Opt out with PALACE_NO_COMPILE_CACHE=1; override the location with
PALACE_COMPILE_CACHE_DIR.
"""
from __future__ import annotations

import os
from pathlib import Path

_DONE = False


def enable_compilation_cache() -> str | None:
    """Idempotently point JAX at an on-disk compilation cache.

    Returns the cache directory, or None when disabled/unavailable.
    Must run before the first compilation to benefit that program, but
    is safe to call at any time.
    """
    global _DONE
    if os.environ.get("PALACE_NO_COMPILE_CACHE"):
        return None
    cache_dir = os.environ.get(
        "PALACE_COMPILE_CACHE_DIR",
        str(Path.home() / ".cache" / "palace_tpu" / "xla_cache"),
    )
    if _DONE:
        return cache_dir
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        import jax

        # An embedding application (or JAX_COMPILATION_CACHE_DIR) may
        # already have configured a cache dir — respect it rather than
        # clobbering on import (ADVICE r4).  Our CLIs call this before
        # any user code could have set one, so they still get the
        # package default.
        existing = jax.config.jax_compilation_cache_dir
        if existing:
            _DONE = True
            return existing
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:  # very old jax or read-only home: run uncached
        return None
    # Cache everything: tiny entries are still ~seconds of tracing+
    # compile on a TPU backend, and the demo pipeline is made of many
    # small programs.  These knobs are optional — the cache dir above is
    # already active, so a missing flag (older jax) must not report the
    # cache as disabled.
    for flag, value in (
        ("jax_persistent_cache_min_compile_time_secs", 0.0),
        ("jax_persistent_cache_min_entry_size_bytes", 0),
    ):
        try:
            jax.config.update(flag, value)
        except Exception:
            pass
    _DONE = True
    return cache_dir
