"""Multi-host (pod-slice) runtime: process initialisation and per-host
input sharding.

The reference has no distributed backend at all (SURVEY.md §2.5) — its
parallelism is pthreads over byte ranges of one file.  The TPU-native
equivalent splits work at two levels:

* **across hosts (DCN)** — each process reads its own subset of the
  FASTQ/contig inputs (round-robin over files, or record-striped within
  a file via the deterministic read index) and contributes device-local
  shards of globally-sharded arrays;
* **across chips (ICI)** — jax.sharding over the global mesh; the
  count-table psum/all_gather collectives come from sharding
  annotations (ops/count_table.py).

Single-process runs (tests, the one-chip bench) use the same code
paths: ``initialize()`` is a no-op without coordinator env, and the
global mesh is just the local mesh.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import numpy as np

from palace_tpu.utils.logging import get_logger

logger = get_logger("palace")


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up jax.distributed for a multi-host slice.

    On Cloud TPU pods all three arguments are discovered from the
    metadata/env automatically; passing none of them outside a pod is a
    no-op so single-host code runs unchanged.
    """
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi_worker = len([w for w in workers.split(",") if w]) > 1 or bool(
        os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not explicit and not multi_worker:
        logger.info("single-process run (no coordinator); skipping jax.distributed")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "jax.distributed up: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def shard_inputs_for_process(
    paths: Sequence[str],
    process_id: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[str]:
    """Round-robin file assignment: host i reads files i, i+P, i+2P …
    Deterministic and independent of listing order differences."""
    pid = jax.process_index() if process_id is None else process_id
    pcount = jax.process_count() if process_count is None else process_count
    ordered = sorted(paths)
    return [p for j, p in enumerate(ordered) if j % pcount == pid]


def keep_record_for_process(
    record_idx: int,
    process_id: Optional[int] = None,
    process_count: Optional[int] = None,
) -> bool:
    """Record-striping within a shared file: host i keeps records
    ``idx % P == i``.  Composes with eref's deterministic down-sampling
    (both are functions of the read index only)."""
    pid = jax.process_index() if process_id is None else process_id
    pcount = jax.process_count() if process_count is None else process_count
    return record_idx % pcount == pid


def global_array_from_local(local: np.ndarray, mesh, pspec) -> jax.Array:
    """Assemble a globally-sharded jax.Array from each process's local
    shard (DCN boundary: no host ever materialises the global array)."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, pspec)
    return jax.make_array_from_process_local_data(sharding, local)
