"""Lineage modules (SURVEY.md §2.7): score network + Langevin sampler,
GraphVAE, EdgeGNN, MI estimators, debias losses, UpDn blocks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def keys():
    return jax.random.split(jax.random.PRNGKey(0), 8)


def test_score_network_and_langevin(keys):
    from xggm_tpu.ggm.score_network import (
        EdgeDenseScoreNetwork, LangevinSampler, gen_init_sample,
        gen_multi_sigma_batches,
    )

    B, N, F = 2, 8, 16
    net = EdgeDenseScoreNetwork(feature_nums=(F, 16, 16), channel_out=4)
    x = jnp.asarray(np.random.RandomState(0).randn(B, N, F), jnp.float32)
    adjs, flags = gen_init_sample(keys[0], B, N)
    assert float(jnp.max(jnp.abs(adjs - jnp.swapaxes(adjs, -1, -2)))) == 0.0

    params = net.init({"params": keys[1]}, x, adjs, flags)
    score, x_o = net.apply(params, x, adjs, flags)
    assert score.shape == (B, N, N)
    # score symmetric with zero diagonal
    np.testing.assert_allclose(np.asarray(score),
                               np.asarray(jnp.swapaxes(score, -1, -2)),
                               rtol=1e-4, atol=1e-5)
    assert float(jnp.max(jnp.abs(jnp.diagonal(score, axis1=-2, axis2=-1)))) == 0.0

    sampler = LangevinSampler(eps=0.3, grad_step_size=0.1, step_num=5)
    out, out_flags = sampler.sample(
        keys[2], lambda a, f: net.apply(params, x, a, f), adjs, flags)
    assert out.shape == (B, N, N)
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}

    xs, noisy, grads = gen_multi_sigma_batches(keys[3], x, adjs,
                                              [0.5, 1.0])
    assert xs.shape == (2 * B, N, F)
    assert noisy.shape == (2 * B, N, N)


def test_graph_vae(keys):
    from xggm_tpu.ggm.graph_vae import GraphVAE, recover_adj

    B = 2
    x = jnp.asarray(np.random.RandomState(1).randn(B, 36, 64), jnp.float32)
    adj = jax.nn.sigmoid(jnp.asarray(
        np.random.RandomState(2).randn(B, 36, 36), jnp.float32))
    adj = (adj + jnp.swapaxes(adj, -1, -2)) / 2
    vae = GraphVAE(hidden_dim=32, input_dim=64)
    params = vae.init({"params": keys[0], "dropout": keys[1]},
                      x, adj, keys[2], deterministic=True)
    rec, kl, rec_loss = vae.apply(params, x, adj, keys[3],
                                  deterministic=True)
    assert rec.shape == (B, 36, 36)
    np.testing.assert_allclose(np.asarray(rec),
                               np.asarray(jnp.swapaxes(rec, -1, -2)),
                               rtol=1e-5)
    assert np.isfinite(float(kl)) and np.isfinite(float(rec_loss))

    vals = jnp.arange(630, dtype=jnp.float32)[None]
    a = recover_adj(vals)
    assert float(a[0, 0, 1]) == 0.0 and float(a[0, 1, 0]) == 0.0
    assert float(a[0, 0, 35]) == 34.0


def test_edge_gnn(keys):
    from xggm_tpu.ggm.graph_vae import EdgeGNN

    x = jnp.ones((2, 12, 16))
    adj = jnp.ones((2, 12, 12)) * 0.5
    gnn = EdgeGNN(hidden_dim=16, n_layers=2)
    params = gnn.init({"params": keys[0]}, x, adj, True)
    xo, ao = gnn.apply(params, x, adj, True)
    assert xo.shape == (2, 12, 16)
    assert ao.shape == (2, 12, 12)


def test_mi_estimators(keys):
    from xggm_tpu.ops.mi import (
        CLUB, CLUBSample, MINE, NWJ, VarUB, L1OutUB, InfoNCE, InfoNCEv2,
        club_v2_org, club_v2_sample, knn_kl_estimator, skl_divergence_knn,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 8), jnp.float32)
    y = jnp.asarray(rng.randn(16, 8), jnp.float32)

    club = CLUB(y_dim=8, hidden_size=16)
    p = club.init(keys[0], x, y)
    assert np.isfinite(float(club.apply(p, x, y)))

    cs = CLUBSample(y_dim=8, hidden_size=16)
    p = cs.init(keys[0], x, y, keys[1])
    assert np.isfinite(float(cs.apply(p, x, y, keys[1])))

    assert np.isfinite(float(club_v2_org(y)))
    assert np.isfinite(float(club_v2_sample(keys[1], y)))

    for cls, extra in [(MINE, True), (NWJ, False)]:
        m = cls(hidden_size=16)
        args = (x, y, keys[2]) if extra else (x, y)
        p = m.init(keys[0], *args)
        assert np.isfinite(float(m.apply(p, *args)))

    for cls in (VarUB, L1OutUB):
        m = cls(y_dim=8, hidden_size=16)
        p = m.init(keys[0], x, y)
        assert np.isfinite(float(m.apply(p, x, y)))

    for cls in (InfoNCE, InfoNCEv2):
        m = cls(hidden_size=16)
        p = m.init(keys[0], x, y, keys[3])
        assert np.isfinite(float(m.apply(p, x, y, keys[3])))

    # kNN KL of a distribution against itself-ish should be small-ish/finite
    kl = float(knn_kl_estimator(x, y))
    assert np.isfinite(kl)
    assert np.isfinite(float(skl_divergence_knn(x, y)))


def test_mi_composite_estimators(keys):
    """MIUpperBound + the composite estimators (reference mi.py:301-548)."""
    from xggm_tpu.ops.mi import (
        JointMIEstimator, MIEstimator, MIUpperBound, MVMIEstimator,
        mi_upper_bound_org, mi_upper_bound_sample,
    )

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(16, 8), jnp.float32)
    y = jnp.asarray(rng.randn(16, 8), jnp.float32)

    assert np.isfinite(float(mi_upper_bound_org(y)))
    assert np.isfinite(float(mi_upper_bound_sample(keys[1], y)))

    ub = MIUpperBound(variational=True, y_dim=8, hidden_size=16)
    p = ub.init(keys[0], x, y)
    assert np.isfinite(float(ub.apply(p, x, y)))
    assert np.isfinite(float(
        ub.apply(p, x, y, keys[2], mi_mode="sample")))

    mie = MIEstimator()
    p = mie.init(keys[0], x, y)
    grad, est = mie.apply(p, x, y)
    assert np.isfinite(float(grad)) and np.isfinite(float(est))

    H = 4
    z1 = jnp.asarray(rng.randn(16, 2 * H), jnp.float32)
    z2 = jnp.asarray(rng.randn(16, 2 * H), jnp.float32)
    mv = MVMIEstimator(hidden_size=H)
    p = mv.init(keys[0], z1, z2, keys[3])
    assert np.isfinite(float(mv.apply(p, z1, z2, keys[3])))

    zl = jnp.asarray(rng.randn(6, 20, 2 * H), jnp.float32)
    zv = jnp.asarray(rng.randn(6, 36, 2 * H), jnp.float32)
    jm = JointMIEstimator(hidden_size=H)
    p = jm.init(keys[0], zl, zv, keys[3])
    assert np.isfinite(float(jm.apply(p, zl, zv, keys[3])))


def test_debias_losses_against_torch(keys):
    """Cross-check the pure-function debias losses against inline torch
    computations of the reference formulas."""
    import torch
    import torch.nn.functional as TF

    from xggm_tpu.ops.debias_losses import (
        plain_loss, focal_loss, reweight_by_inv_bias, BiasProduct,
        LearnedMixin,
    )

    rng = np.random.RandomState(3)
    B, A, H = 6, 10, 12
    hidden = rng.randn(B, H).astype(np.float32)
    logits = rng.randn(B, A).astype(np.float32)
    bias = rng.rand(B, A).astype(np.float32)
    labels = (rng.rand(B, A) > 0.7).astype(np.float32)
    tl, tb, tt = map(torch.from_numpy, (logits, bias, labels))

    ours = float(plain_loss(hidden, logits, bias, labels))
    ref = float(TF.binary_cross_entropy_with_logits(tl, tt) * A)
    assert ours == pytest.approx(ref, rel=1e-5)

    ours = float(focal_loss(hidden, logits, bias, labels))
    fl = torch.log(TF.softmax(tl, 1) + 1e-5) * (1 - TF.softmax(tb, 1)) ** 2
    ref = float(TF.binary_cross_entropy_with_logits(fl, tt) * A)
    assert ours == pytest.approx(ref, rel=1e-4)

    ours = float(reweight_by_inv_bias(hidden, logits, bias, labels))
    log_p = TF.logsigmoid(tl)
    log_1mp = TF.logsigmoid(-tl)
    loss = -(log_p * tt + (1 - tt) * log_1mp) * (1 - tb)
    ref = float(loss.sum() / (1 - tb).sum())
    assert ours == pytest.approx(ref, rel=1e-5)

    bp = BiasProduct()
    p = bp.init(keys[0], hidden, logits, bias, labels)
    assert np.isfinite(float(bp.apply(p, hidden, logits, bias, labels)))

    lm = LearnedMixin(w=0.36, hidden_dim=H)
    p = lm.init(keys[0], hidden, logits, bias, labels)
    assert np.isfinite(float(lm.apply(p, hidden, logits, bias, labels)))


def test_updn_blocks(keys):
    from xggm_tpu.models.updn import (
        FCNet, Attention, NewAttention, SimpleClassifier, GaussianLayer,
        WordEmbedding, QuestionEmbedding, contrastive_loss,
    )

    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(4, 36, 32), jnp.float32)
    q = jnp.asarray(rng.randn(4, 24), jnp.float32)

    fc = FCNet((32, 16, 8))
    p = fc.init(keys[0], v)
    out = fc.apply(p, v)
    assert out.shape == (4, 36, 8)
    assert float(out.min()) >= 0.0  # trailing ReLU

    for att_cls in (Attention, NewAttention):
        att = att_cls(num_hid=16)
        p = att.init(keys[0], v, q)
        w = att.apply(p, v, q)
        assert w.shape == (4, 36, 1)
        np.testing.assert_allclose(np.asarray(w.sum(1)), 1.0, rtol=1e-5)

    clf = SimpleClassifier(hid_dim=16, out_dim=5)
    p = clf.init(keys[0], q)
    assert clf.apply(p, q).shape == (4, 5)

    gl = GaussianLayer(input_dim=24, n_classes=7)
    p = gl.init(keys[1], q)
    assert gl.apply(p, q).shape == (4, 7)

    we = WordEmbedding(ntoken=50, emb_dim=16)
    ids = jnp.asarray(rng.randint(0, 50, (4, 9)), jnp.int32)
    p = we.init(keys[0], ids)
    emb = we.apply(p, ids)
    assert emb.shape == (4, 9, 16)

    for bidirect, out_dim in [(False, 16), (True, 32)]:
        qe = QuestionEmbedding(num_hid=16, bidirect=bidirect)
        p = qe.init(keys[0], emb)
        h = qe.apply(p, emb)
        assert h.shape == (4, out_dim)

    loss = contrastive_loss(q, q)  # identical embeddings: zero violation...
    assert np.isfinite(float(loss))
