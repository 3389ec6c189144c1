"""Training loop + orbax checkpoint/resume on the 8-virtual-device mesh."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # orbax checkpoint round-trips

import jax

from palace_tpu.models.gcn import GCNConfig
from palace_tpu.models.train import fit
from palace_tpu.models.checkpoint import latest_step, restore_train_state
from palace_tpu.parallel.mesh import make_mesh

CFG = GCNConfig(fnode_num=8, gcn_dim=16, cnn_dim=8, fc_dim=10, drop_rate=0.0)
RNG = np.random.default_rng(0)


def _toy_data(n=32):
    """Two linearly separable feature clusters."""
    feats = RNG.normal(0, 1, (n, CFG.hidden_dim * CFG.pnode_num)).astype(np.float32)
    labels = (np.arange(n) % 2).astype(np.int32)
    feats[labels == 1, :20] += 3.0
    return feats, labels


def test_fit_learns_and_checkpoints(tmp_path):
    feats, labels = _toy_data()
    ckpt = tmp_path / "ckpt"
    state, losses = fit(
        feats, labels, CFG, epochs=3, batch_size=16, learning_rate=1e-3,
        ckpt_dir=ckpt, ckpt_every=0,
    )
    assert losses[-1] < losses[0]
    saved = latest_step(ckpt)
    assert saved == int(jax.device_get(state.step)) == 6  # 2 steps × 3 epochs

    restored = restore_train_state(ckpt, state)
    assert int(jax.device_get(restored.step)) == 6
    for name in state.params:
        np.testing.assert_array_equal(
            np.asarray(state.params[name]), np.asarray(restored.params[name])
        )


def test_fit_resumes_from_checkpoint(tmp_path):
    feats, labels = _toy_data()
    ckpt = tmp_path / "ckpt"
    fit(feats, labels, CFG, epochs=1, batch_size=16, learning_rate=1e-3,
        ckpt_dir=ckpt)
    assert latest_step(ckpt) == 2
    # second call restores step=2 and continues to 4
    state, _ = fit(feats, labels, CFG, epochs=1, batch_size=16,
                   learning_rate=1e-3, ckpt_dir=ckpt)
    assert int(jax.device_get(state.step)) == 4


def test_fit_on_mesh(eight_devices, tmp_path):
    feats, labels = _toy_data(n=64)
    mesh = make_mesh(8, model_parallel=2)
    state, losses = fit(
        feats, labels, CFG, epochs=2, batch_size=32, learning_rate=1e-3,
        mesh=mesh,
    )
    assert losses[-1] < losses[0]
    assert int(jax.device_get(state.step)) == 4
