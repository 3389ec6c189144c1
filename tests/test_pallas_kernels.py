"""Pallas kernel parity vs the XLA reference paths (interpret mode on
the CPU test mesh; compiled on real TPU)."""
import numpy as np
import pytest

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
