"""Parity tests for the encoder and GCN scorer.

The oracle below replays the *reference* computation literally:
the Cython encoder loop (encode.pyx:41-55) and the PyG SAGEConv
message passing over the explicit edge template
(phage_scoring.py:88-134), using torch-layout weights.  The JAX
implementation must match to float tolerance.
"""
import numpy as np
import pytest

from palace_tpu.models.gcn import (
    GCNConfig,
    forward,
    init_params,
    model_inputs_from_features,
    params_from_numpy_state,
    phage_probabilities,
)
from palace_tpu.ops.encoder import (
    encode_batch,
    reference_matrix_encoding,
    seq_to_kmer_locs,
)

RNG = np.random.default_rng(0)


def _random_seq(n, with_junk=False):
    alphabet = "ACGT" if not with_junk else "ACGTNacgtn"
    return "".join(RNG.choice(list(alphabet), size=n))


# ---------------------------------------------------------------------------
# encoder parity
# ---------------------------------------------------------------------------

def test_encoder_matches_reference_loop():
    seqs = [
        _random_seq(200),
        _random_seq(500, with_junk=True),
        "ACGT",       # shorter than K+gap windows
        "AC",         # shorter than K
        _random_seq(64),
    ]
    got = np.asarray(encode_batch(seqs))
    for i, s in enumerate(seqs):
        want = reference_matrix_encoding(s)
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-6)


def test_kmer_locs_drop_non_acgt():
    locs, n = seq_to_kmer_locs("AnCGT")  # 'n' dropped → ACGT → 2 locs
    assert n == 5
    assert locs.tolist() == [0 * 16 + 1 * 4 + 2, 1 * 16 + 2 * 4 + 3]


def test_packed_fused_path_matches_reference_loop():
    """The 2-bit-packed single-dispatch encode path (pack_codes →
    unpack_codes → locs_from_codes on device) must reproduce the
    reference Cython loop exactly, junk characters included."""
    import jax.numpy as jnp

    from palace_tpu.ops.encoder import (
        features_from_packed,
        pack_codes,
        seqs_to_code_batch,
    )

    seqs = [
        _random_seq(300, with_junk=True),
        _random_seq(77),
        "AC",  # shorter than K
        _random_seq(513),  # crosses the 512 pad boundary
    ]
    codes, n_codes, lens = seqs_to_code_batch(seqs)
    got = np.asarray(
        features_from_packed(jnp.asarray(pack_codes(codes)),
                             jnp.asarray(n_codes), jnp.asarray(lens))
    )
    for i, s in enumerate(seqs):
        want = reference_matrix_encoding(s)
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-6)


def test_score_codes_matches_feature_path():
    """Fused packed scorer == encode_batch + phage_probabilities."""
    from palace_tpu.models.scoring import score_codes

    cfg = GCNConfig()
    import jax

    params = init_params(jax.random.PRNGKey(3), cfg)
    seqs = [_random_seq(150, with_junk=True) for _ in range(4)]
    want = np.asarray(phage_probabilities(params, encode_batch(seqs), cfg))
    got = np.asarray(score_codes(params, seqs, cfg))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_score_sequences_fuse_k_matches_unfused():
    """fuse_k=2 grouped dispatch == per-batch dispatch, including a
    ragged tail group and batches whose packed widths differ (the
    grouped path zero-pads to the group max)."""
    import jax

    from palace_tpu.models.scoring import score_sequences

    cfg = GCNConfig()
    params = init_params(jax.random.PRNGKey(7), cfg)
    # 5 batches of 2 at batch_size=2 → two K=2 groups + a 1-batch tail;
    # lengths vary so packed widths differ across batches
    named = [(f"c{i}", _random_seq(80 + 40 * (i % 3))) for i in range(10)]
    base = score_sequences(params, named, cfg, batch_size=2)
    fused = score_sequences(params, named, cfg, batch_size=2, fuse_k=2)
    assert [n for n, _ in base] == [n for n, _ in fused]
    np.testing.assert_allclose([p for _, p in base], [p for _, p in fused],
                               rtol=1e-5, atol=1e-6)


def test_score_codes_k_matches_per_batch():
    """K-fused dispatch (lax.map over a leading K dim) == per-batch
    fused scorer, batch by batch."""
    import jax
    import jax.numpy as jnp

    from palace_tpu.models.scoring import _score_codes, _score_codes_k, pack_batch

    cfg = GCNConfig()
    params = init_params(jax.random.PRNGKey(5), cfg)
    # equal clean lengths so the packed widths stack across batches
    K, B = 3, 2
    batches = [[_random_seq(120) for _ in range(B)] for k in range(K)]
    packs = [pack_batch(c) for c in batches]
    stacked = tuple(jnp.asarray(np.stack([p[i] for p in packs]))
                    for i in range(3))
    got = np.asarray(_score_codes_k(params, *stacked, cfg))
    assert got.shape == (K, B)
    for k, (pk, nc, ln) in enumerate(packs):
        want = np.asarray(_score_codes(params, jnp.asarray(pk),
                                       jnp.asarray(nc), jnp.asarray(ln), cfg))
        np.testing.assert_allclose(got[k], want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# model oracle (PyG SAGEConv semantics on the explicit edge template)
# ---------------------------------------------------------------------------

def make_edge(pnode_num, fnode_num):
    """phage_scoring.py:130-134."""
    edge = []
    for i in range(pnode_num):
        edge.append([i // fnode_num, i])
        edge.append([i % fnode_num, i])
    return np.array(edge).T  # (2, 2*pnode)


def sage_conv(x_src, x_dst, edge_index, w_l, b_l, w_r):
    """PyG SAGEConv forward: mean-aggregate x_src over incoming edges,
    lin_l on the aggregate (with bias), lin_r on x_dst (no bias).
    Weights in torch layout (out, in)."""
    n_dst = x_dst.shape[0]
    agg = np.zeros((n_dst, x_src.shape[1]))
    cnt = np.zeros(n_dst)
    for s, d in edge_index.T:
        agg[d] += x_src[s]
        cnt[d] += 1
    cnt = np.maximum(cnt, 1)
    agg = agg / cnt[:, None]
    return agg @ w_l.T + b_l + x_dst @ w_r.T


def layer_norm(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def conv1d(x, w, b):
    """x: (C_in, L); w: (C_out, C_in, K)."""
    c_out, c_in, k = w.shape
    L = x.shape[1] - k + 1
    out = np.zeros((c_out, L))
    for i in range(L):
        out[:, i] = np.einsum("oik,ik->o", w, x[:, i : i + k]) + b
    return out


def relu(x):
    return np.maximum(x, 0)


def torch_state_dict(cfg: GCNConfig, rng):
    """Random torch-layout state dict for the reference architecture."""
    d3, gd, f, pn = cfg.hidden_dim, cfg.gcn_dim, cfg.fnode_num, cfg.pnode_num
    sd = {}

    def lin(name, n_in, n_out, bias=True):
        sd[f"{name}.weight"] = rng.normal(0, 0.2, (n_out, n_in))
        if bias:
            sd[f"{name}.bias"] = rng.normal(0, 0.2, n_out)

    lin("pnode_d", pn * d3, pn * d3)
    lin("fnode_d", f, f * d3)
    dims_1 = [(d3, d3), (gd, gd)]
    dims_2 = [(gd, d3), (gd, gd)]
    for i in range(cfg.num_layers):
        for tag, (in_src, in_dst) in (("convs_1", dims_1[i]), ("convs_2", dims_2[i])):
            lin(f"{tag}.{i}.lin_l", in_src, gd)
            lin(f"{tag}.{i}.lin_r", in_dst, gd, bias=False)
    sd["lns.0.weight"] = rng.normal(1, 0.05, gd)
    sd["lns.0.bias"] = rng.normal(0, 0.05, gd)
    for i, (cin, cout) in enumerate(
        [(gd, cfg.cnn_dim), (cfg.cnn_dim, cfg.cnn_dim), (cfg.cnn_dim, cfg.cnn_dim)], 1
    ):
        sd[f"conv{i}.weight"] = rng.normal(0, 0.1, (cout, cin, cfg.conv_kernel))
        sd[f"conv{i}.bias"] = rng.normal(0, 0.1, cout)
    lin("d1", cfg.flat_dim, cfg.fc_dim)
    lin("d2", cfg.fc_dim, 2)
    return sd


def oracle_forward(sd, x_p, x_f, cfg: GCNConfig):
    """Reference GNN_Model.forward (phage_scoring.py:88-120) in numpy,
    eval mode, for a single graph."""
    d3, gd, f, pn = cfg.hidden_dim, cfg.gcn_dim, cfg.fnode_num, cfg.pnode_num
    edge = make_edge(pn, f)
    edge_fwd = edge[:, ::2]                      # f → p
    edge_bwd = edge[[1, 0], :][:, 1::2]          # p → f

    x_p = x_p.reshape(-1, pn * d3) @ sd["pnode_d.weight"].T + sd["pnode_d.bias"]
    x_p = x_p.reshape(-1, d3)
    x_f = x_f.reshape(-1, f) @ sd["fnode_d.weight"].T + sd["fnode_d.bias"]
    x_f = x_f.reshape(-1, d3)

    for i in range(cfg.num_layers):
        x_p = relu(
            sage_conv(x_f, x_p, edge_fwd,
                      sd[f"convs_1.{i}.lin_l.weight"], sd[f"convs_1.{i}.lin_l.bias"],
                      sd[f"convs_1.{i}.lin_r.weight"])
        )
        x_f = relu(
            sage_conv(x_p, x_f, edge_bwd,
                      sd[f"convs_2.{i}.lin_l.weight"], sd[f"convs_2.{i}.lin_l.bias"],
                      sd[f"convs_2.{i}.lin_r.weight"])
        )
        if i < cfg.num_layers - 1:
            x_p = layer_norm(x_p, sd["lns.0.weight"], sd["lns.0.bias"])
            x_f = layer_norm(x_f, sd["lns.0.weight"], sd["lns.0.bias"])

    x = x_p.reshape(-1, gd, pn)[0]
    x = relu(conv1d(x, sd["conv1.weight"], sd["conv1.bias"]))
    x = relu(conv1d(x, sd["conv2.weight"], sd["conv2.bias"]))
    x = relu(conv1d(x, sd["conv3.weight"], sd["conv3.bias"]))
    x = x.flatten()
    x = relu(x @ sd["d1.weight"].T + sd["d1.bias"])
    logits = x @ sd["d2.weight"].T + sd["d2.bias"]
    e = np.exp(logits - logits.max())
    return e / e.sum()


@pytest.mark.parametrize("fnode_num", [8])
def test_forward_matches_pyg_oracle(fnode_num):
    cfg = GCNConfig(fnode_num=fnode_num)
    rng = np.random.default_rng(7)
    sd = torch_state_dict(cfg, rng)
    params = params_from_numpy_state(sd, cfg)

    B = 3
    x_p = rng.normal(0, 1, (B, cfg.pnode_num, cfg.hidden_dim))
    x_f = rng.normal(0, 1, (B, cfg.fnode_num, 1))

    got = np.asarray(forward(params, x_p.astype(np.float32), x_f.astype(np.float32), cfg))
    for b in range(B):
        want = oracle_forward(sd, x_p[b : b + 1], x_f[b : b + 1], cfg)
        np.testing.assert_allclose(got[b], want, rtol=2e-4, atol=2e-5)


@pytest.mark.skipif(
    not __import__("os").environ.get("PALACE_FULL_TESTS"),
    reason="full-size model compile is slow on CPU; set PALACE_FULL_TESTS=1",
)
def test_full_size_forward_smoke():
    cfg = GCNConfig()
    params = init_params(__import__("jax").random.PRNGKey(0), cfg)
    feats = np.asarray(encode_batch(["ACGT" * 300, "GATTACA" * 100]))
    probs = np.asarray(phage_probabilities(params, feats, cfg))
    assert probs.shape == (2,)
    assert np.all((probs >= 0) & (probs <= 1))


def test_model_inputs_derivation():
    cfg = GCNConfig(fnode_num=8)
    B, d3, f, pn = 2, cfg.hidden_dim, cfg.fnode_num, cfg.pnode_num
    feats = np.arange(B * d3 * pn, dtype=np.float32).reshape(B, d3 * pn)
    x_p, x_f = model_inputs_from_features(feats, cfg)
    # phage_scoring.py:191-194 reference derivation
    pnode = np.moveaxis(feats.reshape(B, d3, pn), 1, 2)
    zero_layer = feats.reshape(B, d3, f, f)[:, 0, :, :]
    fnode = zero_layer.sum(axis=2).reshape(B, f, 1)
    np.testing.assert_array_equal(np.asarray(x_p), pnode)
    np.testing.assert_array_equal(np.asarray(x_f), fnode)


def test_torch_checkpoint_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    cfg = GCNConfig(fnode_num=8)
    sd = torch_state_dict(cfg, np.random.default_rng(3))
    tensor_sd = {k: torch.tensor(v) for k, v in sd.items()}
    path = tmp_path / "model.pt"
    torch.save(tensor_sd, path)

    from palace_tpu.models.gcn import load_torch_state_dict

    params = load_torch_state_dict(str(path), cfg)
    rng = np.random.default_rng(11)
    x_p = rng.normal(0, 1, (1, cfg.pnode_num, cfg.hidden_dim)).astype(np.float32)
    x_f = rng.normal(0, 1, (1, cfg.fnode_num, 1)).astype(np.float32)
    got = np.asarray(forward(params, x_p, x_f, cfg))[0]
    want = oracle_forward(sd, x_p, x_f, cfg)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
