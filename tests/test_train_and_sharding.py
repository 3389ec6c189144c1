"""Training-step and multi-device sharding tests on the 8-device
virtual CPU mesh (SURVEY.md §4 "multi-host without a cluster")."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # training steps over the virtual mesh
from jax.sharding import NamedSharding, PartitionSpec as P

from palace_tpu.models.gcn import GCNConfig, init_params
from palace_tpu.models.train import init_train_state, train_step
from palace_tpu.models.scoring import read_scores, score_fasta, write_scores
from palace_tpu.parallel.mesh import best_mesh_shape, data_sharding, make_mesh, shard_params_for_gcn

CFG = GCNConfig(fnode_num=8)  # small arch: pnode=64


def _batch(rng, b):
    x_p = rng.normal(0, 1, (b, CFG.pnode_num, CFG.hidden_dim)).astype(np.float32)
    x_f = rng.normal(0, 1, (b, CFG.fnode_num, 1)).astype(np.float32)
    y = rng.integers(0, 2, (b,)).astype(np.int32)
    return x_p, x_f, y


def test_best_mesh_shape():
    assert best_mesh_shape(8, 1) == (8, 1)
    assert best_mesh_shape(8, 4) == (2, 4)
    assert best_mesh_shape(8, 3) == (4, 2)
    assert best_mesh_shape(1, 4) == (1, 1)


def test_train_step_reduces_loss(eight_devices):
    rng = np.random.default_rng(0)
    params = init_params(jax.random.PRNGKey(0), CFG)
    state = init_train_state(params, learning_rate=1e-3)
    x_p, x_f, y = _batch(rng, 8)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(8):
        state, loss = train_step(state, x_p, x_f, y, jax.random.fold_in(key, i), CFG, 1e-3)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_sharded_train_step_matches_single_device(eight_devices):
    """dp×tp sharded step computes the same loss as unsharded."""
    rng = np.random.default_rng(1)
    x_p, x_f, y = _batch(rng, 8)
    key = jax.random.PRNGKey(0)

    # train_step donates its state, so build params freshly per state
    state0 = init_train_state(init_params(jax.random.PRNGKey(2), CFG), 1e-3)
    _, loss_single = train_step(state0, x_p, x_f, y, key, CFG, 1e-3)

    mesh = make_mesh(8, model_parallel=2)
    sharded_params = shard_params_for_gcn(init_params(jax.random.PRNGKey(2), CFG), mesh)
    state1 = init_train_state(sharded_params, 1e-3)
    ds = data_sharding(mesh, 3)
    x_p_s = jax.device_put(x_p, ds)
    x_f_s = jax.device_put(x_f, ds)
    y_s = jax.device_put(y, data_sharding(mesh, 1))
    new_state, loss_sharded = train_step(state1, x_p_s, x_f_s, y_s, key, CFG, 1e-3)
    np.testing.assert_allclose(float(loss_single), float(loss_sharded), rtol=1e-5)
    # params stay sharded after update
    pd = new_state.params["pnode_d.w"]
    assert not pd.sharding.is_fully_replicated


def test_score_fasta_stage(tmp_path, eight_devices):
    """End-to-end scoring stage on the small arch with a real mesh."""
    from palace_tpu.io.fasta import write_fasta

    fasta = tmp_path / "contigs.fasta"
    rng = np.random.default_rng(3)
    seqs = [
        (f"EDGE_{i}_length_400_cov_3.0", "".join(rng.choice(list("ACGT"), size=400)))
        for i in range(5)
    ]
    write_fasta(fasta, seqs)

    params = init_params(jax.random.PRNGKey(4), CFG)
    mesh = make_mesh(8, model_parallel=1)
    out = tmp_path / "node_scores.out"

    def tiny_encoder(batch):
        # deterministic stand-in with the small arch's feature width
        feats = np.zeros((len(batch), CFG.hidden_dim * CFG.pnode_num), np.float32)
        for i, s in enumerate(batch):
            h = np.frombuffer(s.encode()[: feats.shape[1]], dtype=np.uint8)
            feats[i, : h.size] = h / 100.0
        return jnp.asarray(feats)

    n = score_fasta(params, fasta, out, CFG, batch_size=4, mesh=mesh, encode_fn=tiny_encoder)
    assert n == 5
    scores = read_scores(out)
    assert len(scores) == 5
    assert all(0.0 <= v <= 1.0 for v in scores.values())


def test_bf16_scoring_parity():
    """bf16 inference (the HBM-traffic lever, benchmarks/ANALYSIS.md)
    stays close enough to f32 that the 0.7/0.9 pipeline gates are
    stable away from the thresholds."""
    from palace_tpu.models.scoring import resolve_dtype, score_sequences

    assert resolve_dtype("float32") is None
    assert resolve_dtype(None) is None
    assert resolve_dtype("bf16") == jnp.bfloat16
    with pytest.raises(ValueError):
        resolve_dtype("int8")

    rng = np.random.default_rng(5)
    params = init_params(jax.random.PRNGKey(6), CFG)
    named = [
        (f"c{i}", "".join(rng.choice(list("ACGT"), size=300))) for i in range(9)
    ]

    def tiny_encoder(batch):
        feats = np.zeros((len(batch), CFG.hidden_dim * CFG.pnode_num), np.float32)
        for i, s in enumerate(batch):
            h = np.frombuffer(s.encode()[: feats.shape[1]], dtype=np.uint8)
            feats[i, : h.size] = h / 100.0
        return jnp.asarray(feats)

    f32 = dict(score_sequences(params, named, CFG, batch_size=4, encode_fn=tiny_encoder))
    bf16 = dict(
        score_sequences(params, named, CFG, batch_size=4, encode_fn=tiny_encoder,
                        dtype=jnp.bfloat16)
    )
    assert f32.keys() == bf16.keys()
    for k in f32:
        assert abs(f32[k] - bf16[k]) < 0.05, (k, f32[k], bf16[k])


def test_write_read_scores_roundtrip(tmp_path):
    p = tmp_path / "s.out"
    write_scores(p, [("a", 0.25), ("b", 1e-9)])
    got = read_scores(p)
    assert got["a"] == pytest.approx(0.25)
    assert got["b"] == pytest.approx(1e-9, rel=1e-3)
