"""Remaining lineage closure: plain encoders, MixGenerator, spectral GCN,
EdgeConvGNN, MPM graph matching (cross-checked vs the reference's hand-test
graph, model/graph_vae.py:211-245)."""
import jax
import jax.numpy as jnp
import numpy as np


def test_plain_encoders_and_mix_generator():
    from xggm_tpu.ggm.extras import (
        GinPlainEncoder, GCNPlainEncoder, MixGenerator)

    rng = np.random.RandomState(0)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jnp.asarray(rng.randn(2, 36, 32), jnp.float32)
    adj = jnp.asarray(rng.rand(2, 36, 36), jnp.float32)

    for cls in (GinPlainEncoder, GCNPlainEncoder):
        enc = cls(hidden_dim=32, n_layers=2)
        p = enc.init({"params": keys[0]}, x, adj, True)
        out = enc.apply(p, x, adj, True)
        assert out.shape == (2, 36, 32)

    pooled = jnp.asarray(rng.randn(2, 32), jnp.float32)
    mix = MixGenerator(hidden_dim=32, n_layers=2)
    p = mix.init({"params": keys[1]}, pooled, adj, x, keys[2], True)
    nodes, vae_loss = mix.apply(p, pooled, adj, x, keys[2], True)
    assert nodes.shape == (2, 36, 32)
    assert np.isfinite(float(vae_loss))


def test_spectral_gcn():
    from xggm_tpu.ggm.extras import SpectralGCN, normalize_adjacency

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 12, 8), jnp.float32)
    adj = jnp.asarray((rng.rand(2, 12, 12) > 0.5).astype(np.float32))
    adj = (adj + jnp.swapaxes(adj, -1, -2)) / 2
    flags = jnp.ones((2, 12))

    a_hat = normalize_adjacency(adj, flags)
    # self-loops present, spectral norm bounded
    assert float(jnp.min(jnp.diagonal(a_hat, axis1=-2, axis2=-1))) > 0

    gcn = SpectralGCN(feature_nums=(8, 16, 4))
    p = gcn.init({"params": jax.random.PRNGKey(0)}, x, adj, flags)
    out = gcn.apply(p, x, adj, flags)
    assert out.shape == (2, 12, 4)


def test_edge_conv_gnn():
    from xggm_tpu.ggm.graph_vae import EdgeConvGNN

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 10, 16), jnp.float32)
    adj = jnp.asarray(rng.rand(2, 10, 10), jnp.float32)
    gnn = EdgeConvGNN(hidden_dim=16, n_layers=2)
    p = gnn.init({"params": jax.random.PRNGKey(0)}, x, adj, True)
    xo, ao = gnn.apply(p, x, adj, True)
    assert xo.shape == (2, 10, 16) and ao.shape == (2, 10, 10)


def test_mpm_matching_reference_graph():
    """The reference's forward_test hand-case (model/graph_vae.py:211-245):
    two 4-node path/star graphs; MPM + Hungarian must produce a valid
    permutation that matches node degrees."""
    from xggm_tpu.ggm.graph_vae import match_graphs, permute_adj

    adj = np.array([[1, 1, 0, 0], [1, 1, 1, 0],
                    [0, 1, 1, 1], [0, 0, 1, 1]], np.float32)
    adj1 = np.array([[1, 1, 1, 0], [1, 1, 0, 1],
                     [1, 0, 1, 0], [0, 1, 0, 1]], np.float32)
    row, col = match_graphs(adj, adj1)
    assert sorted(row.tolist()) == [0, 1, 2, 3]
    assert sorted(col.tolist()) == [0, 1, 2, 3]
    permuted = permute_adj(adj, row, col)
    # degree multiset preserved under permutation
    assert sorted(permuted.sum(1).tolist()) == sorted(adj.sum(1).tolist())
    # matching aligns degrees: deg-3 nodes of adj map to deg-3 of adj1
    deg = adj.sum(1)
    deg1 = adj1.sum(1)
    assert all(deg[r] == deg1[c] for r, c in zip(row, col))


def test_mlp_vae_plain():
    from xggm_tpu.ggm.graph_vae import MlpVaePlain

    rng = np.random.RandomState(3)
    h = jnp.asarray(rng.randn(2, 16 * 16), jnp.float32)
    vae = MlpVaePlain(embedding_size=8, y_size=10)
    key = jax.random.PRNGKey(1)
    p = vae.init({"params": jax.random.PRNGKey(0)}, h, key, False)
    y, mu, lsgms = vae.apply(p, h, key, False)
    assert y.shape == (2, 10) and mu.shape == (2, 8)


def test_noise_lineage_helpers():
    """GSM-lineage graph utils: flagged gaussian noise, geometric corrupt-k,
    symmetric edge toggling, multi-sigma batch expansion (reference
    src/model/graph_utils.py:45-139)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xggm_tpu.ops.noise import (
        add_gaussian_noise, gen_list_of_data, get_corrupt_k, toggle_edges)

    rng = np.random.RandomState(0)
    B, N, F = 3, 6, 4
    adjs = jnp.asarray((rng.rand(B, N, N) > 0.5).astype(np.float32))
    adjs = jnp.triu(adjs, 1) + jnp.swapaxes(jnp.triu(adjs, 1), -1, -2)
    flags = jnp.asarray(np.stack([[1, 1, 1, 1, 0, 0]] * B), jnp.float32)
    x = jnp.asarray(rng.randn(B, N, F), jnp.float32)

    # flagged noise masks padded rows/cols of BOTH outputs; symmetric
    noisy, grad = add_gaussian_noise(jax.random.PRNGKey(0), adjs, 0.5,
                                     node_flags=flags)
    for t in (noisy, grad):
        t = np.asarray(t)
        assert np.all(t[:, 4:, :] == 0) and np.all(t[:, :, 4:] == 0)
        np.testing.assert_allclose(t, t.transpose(0, 2, 1), atol=1e-6)
    # diagonal noise is zero (triu-sampled): noisy diag == adjs diag
    np.testing.assert_allclose(
        np.diagonal(np.asarray(noisy), axis1=1, axis2=2)[:, :4],
        np.diagonal(np.asarray(adjs), axis1=1, axis2=2)[:, :4], atol=1e-6)

    # geometric draw respects bounds
    ks = [int(get_corrupt_k(jax.random.PRNGKey(i), min_k=1, max_k=3))
          for i in range(50)]
    assert min(ks) >= 1 and max(ks) <= 3 and len(set(ks)) > 1

    # toggling keeps 0/1 entries and symmetry
    a = np.asarray(adjs[0])
    t = np.asarray(toggle_edges(jax.random.PRNGKey(3), jnp.asarray(a), 3))
    assert set(np.unique(t)) <= {0.0, 1.0}
    np.testing.assert_array_equal(t, t.T)
    assert np.any(t != a)

    # multi-sigma expansion shapes + per-sigma grads
    xs, noisy_all, flags_all, grads = gen_list_of_data(
        jax.random.PRNGKey(4), x, adjs, flags, [0.5, 1.0])
    assert xs.shape == (2 * B, N, F)
    assert noisy_all.shape == (2 * B, N, N)
    assert flags_all.shape == (2 * B, N)
    assert len(grads) == 2 and grads[0].shape == (B, N, N)


def test_gsm_gin_lineage_pieces():
    """doubly_stochastic_norm + GraphAttentionLayer (reference
    model/gin.py:11-88)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xggm_tpu.ggm.extras import GraphAttentionLayer, doubly_stochastic_norm

    rng = np.random.RandomState(0)
    adjs = jnp.asarray(rng.rand(2, 5, 5) + 0.1, jnp.float32)
    e = doubly_stochastic_norm(adjs)
    assert e.shape == (2, 5, 5)
    # E = C C^T with C row-stochastic-ish: rows sum to ~1 and E symmetric
    np.testing.assert_allclose(np.asarray(e),
                               np.asarray(jnp.swapaxes(e, 1, 2)), rtol=1e-5)

    x = jnp.asarray(rng.randn(2, 5, 7), jnp.float32)
    adj = jnp.asarray((rng.rand(2, 5, 5) > 0.4).astype(np.float32))
    layer = GraphAttentionLayer(out_features=6)
    p = layer.init(jax.random.PRNGKey(0), x, adj)
    out = layer.apply(p, x, adj)
    assert out.shape == (2, 5, 6)
    assert np.all(np.isfinite(np.asarray(out)))
    out2 = GraphAttentionLayer(out_features=6, concat=False).apply(
        layer.init(jax.random.PRNGKey(1), x, adj), x, adj)
    assert out2.shape == (2, 5, 6)
