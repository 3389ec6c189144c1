"""Multi-host helpers (single-process semantics + global-array assembly
on the 8-virtual-device mesh)."""
import numpy as np

import jax
from jax.sharding import PartitionSpec as P

from palace_tpu.parallel.distributed import (
    global_array_from_local,
    initialize,
    keep_record_for_process,
    shard_inputs_for_process,
)
from palace_tpu.parallel.mesh import make_mesh


def test_initialize_noop_single_process():
    initialize()  # must not raise or start a coordinator
    assert jax.process_count() == 1


def test_shard_inputs_round_robin():
    paths = [f"f{i}.fq" for i in range(7)]
    got = [shard_inputs_for_process(paths, pid, 3) for pid in range(3)]
    assert sorted(sum(got, [])) == sorted(paths)  # exact partition
    assert got[0] == ["f0.fq", "f3.fq", "f6.fq"]
    # deterministic under input reordering
    assert shard_inputs_for_process(paths[::-1], 0, 3) == got[0]


def test_record_striping_partitions():
    P_ = 4
    owners = [[i for i in range(100) if keep_record_for_process(i, p, P_)]
              for p in range(P_)]
    assert sorted(sum(owners, [])) == list(range(100))


def test_global_array_from_local(eight_devices):
    mesh = make_mesh(8, model_parallel=1)
    local = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    arr = global_array_from_local(local, mesh, P("data", None))
    assert arr.shape == (16, 4)  # single process: local == global
    np.testing.assert_array_equal(np.asarray(arr), local)
    assert len(arr.sharding.device_set) == 8
