"""Device-mesh and sharding helpers.

The reference has no distributed backend (SURVEY.md §2.5) — its
concurrency is pthreads byte-range splits and process pools.  The
TPU-native equivalent is a ``jax.sharding.Mesh`` with named axes:

* ``data``  — batch/data parallelism (contigs, reads, references)
* ``model`` — tensor parallelism for the GCN's large dense layers and
  shard-parallelism for the k-mer count table

XLA inserts the psum/all_gather collectives implied by the sharding
annotations; shardings are chosen so those collectives ride ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def best_mesh_shape(n_devices: int, model_parallel: int = 1) -> Tuple[int, int]:
    """(data, model) factorisation of ``n_devices``; shrink model axis
    until it divides."""
    mp = max(1, min(model_parallel, n_devices))
    while n_devices % mp != 0:
        mp -= 1
    return n_devices // mp, mp


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    dp, mp = best_mesh_shape(len(devices), model_parallel)
    dev_array = np.asarray(devices).reshape(dp, mp)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard leading dim over the data axis, replicate the rest."""
    spec = [axis] + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


#: GCN parameter partition specs for tensor parallelism over "model":
#: the two giant matmuls shard their output/input contraction dims;
#: everything else is replicated.  XLA turns the sharded contractions
#: into reduce_scatter/all_gather over the model axis.
_GCN_PARAM_SPECS = {
    "pnode_d.w": P(None, "model"),
    "pnode_d.b": P("model"),
    "d1.w": P("model", None),
    "fnode_d.w": P(),
}


def shard_params_for_gcn(params, mesh: Mesh):
    """Apply tensor-parallel shardings to GCN params on ``mesh``.

    A dim that doesn't divide the mesh axis falls back to replication
    (e.g. d1's 4075·64 rows under a 3-way model axis)."""
    out = {}
    for name, value in params.items():
        spec = _GCN_PARAM_SPECS.get(name, P())
        fits = all(
            axis is None or value.shape[dim] % mesh.shape[axis] == 0
            for dim, axis in enumerate(spec)
        )
        if not fits:
            spec = P()
        out[name] = jax.device_put(value, NamedSharding(mesh, spec))
    return out
