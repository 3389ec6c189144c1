"""Pallas kernel parity vs the XLA reference paths (interpret mode on
the CPU test mesh; compiled on real TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from palace_tpu.ops.encoder import _transition_counts
from palace_tpu.ops.pallas_kernels import good_windows_pallas, transition_counts_pallas
from palace_tpu.ops.window import good_windows, window_thresholds

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("B,L,tile", [(2, 1000, 256), (3, 5000, 2048), (1, 100, 2048)])
def test_transition_counts_parity(B, L, tile):
    locs = RNG.integers(0, 64, (B, L), dtype=np.int32)
    n_locs = RNG.integers(max(1, L // 2), L + 1, (B,), dtype=np.int32)
    want = np.asarray(_transition_counts(jnp.asarray(locs), jnp.asarray(n_locs)))
    got = np.asarray(
        transition_counts_pallas(jnp.asarray(locs), jnp.asarray(n_locs), tile=tile)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_transition_counts_crosses_tile_edges():
    """Pairs spanning a tile boundary must be counted exactly once."""
    L, tile = 600, 256
    locs = RNG.integers(0, 64, (1, L), dtype=np.int32)
    n_locs = np.array([L], np.int32)
    want = np.asarray(_transition_counts(jnp.asarray(locs), jnp.asarray(n_locs)))
    got = np.asarray(
        transition_counts_pallas(jnp.asarray(locs), jnp.asarray(n_locs), tile=tile)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.sum() > 0


@pytest.mark.parametrize("L,window,tile", [(3000, 50, 512), (10000, 500, 4096), (700, 100, 256)])
def test_good_windows_parity(L, window, tile):
    counts = RNG.integers(0, 4, (L, 3)).astype(np.uint8)
    hashes = RNG.integers(0, 50, (L, 3)).astype(np.uint32)
    one_min, three_min = window_thresholds(window, 0.5, 0.2)
    want = np.asarray(
        good_windows(jnp.asarray(counts), jnp.asarray(hashes), window, one_min, three_min)
    )
    got = np.asarray(
        good_windows_pallas(
            jnp.asarray(counts), jnp.asarray(hashes), window, one_min, three_min, tile=tile
        )
    )
    np.testing.assert_array_equal(got, want)


def test_gcn_sage_pallas_parity():
    """The fused SAGE-rounds kernel (opt-in, PALACE_GCN_SAGE=pallas)
    must match the XLA rounds (interpret mode off-TPU)."""
    from palace_tpu.models.gcn import (
        DEFAULT_CONFIG, _layer_norm, _sage, init_params,
    )
    from palace_tpu.ops.pallas_kernels import gcn_sage_pallas

    cfg = DEFAULT_CONFIG
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, f = 2, cfg.fnode_num
    xp = jnp.asarray(rng.normal(0, 1, (B, cfg.pnode_num, 3)), jnp.float32)
    xf = jnp.asarray(rng.normal(0, 1, (B, f, 3)), jnp.float32)

    x_p, x_f = xp, xf
    for i in range(cfg.num_layers):
        lifted = (x_f @ params[f"convs_1.{i}.lin_l.w"]
                  + params[f"convs_1.{i}.lin_l.b"])
        x_p = jax.nn.relu(jnp.repeat(lifted, f, axis=1)
                          + x_p @ params[f"convs_1.{i}.lin_r.w"])
        agg_f = x_p.reshape(B, f, f, -1).mean(axis=1)
        x_f = jax.nn.relu(_sage(agg_f, x_f, params, f"convs_2.{i}"))
        if i < cfg.num_layers - 1:
            x_p = _layer_norm(x_p, params["ln.scale"], params["ln.bias"])
            x_f = _layer_norm(x_f, params["ln.scale"], params["ln.bias"])

    got = np.asarray(gcn_sage_pallas(params, xp, xf, cfg))
    want = np.asarray(x_p)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
