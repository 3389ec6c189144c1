"""Shared benchmark plumbing (one copy of the axon-relay workarounds).

* :func:`force_cpu_if_requested` — honor ``PALACE_BENCH_FORCE_CPU=1``
  BEFORE jax picks a backend: the axon sitecustomize registers the TPU
  at interpreter start, so both the env var and jax.config are needed.
* :func:`fetch` — force real completion of queued device work.  Under
  the axon TPU relay ``block_until_ready`` acks dispatch without
  waiting; the device executes in-order, so one device-to-host copy of
  the LAST queued output waits for everything before it.
"""
from __future__ import annotations

import os

import numpy as np


def force_cpu_if_requested():
    """Returns the imported jax module, on CPU when requested."""
    if os.environ.get("PALACE_BENCH_FORCE_CPU"):
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax
    return jax


def fetch(x) -> None:
    import jax

    leaf = jax.tree_util.tree_leaves(x)[-1]
    np.asarray(jax.device_get(leaf)).ravel()[:1]
