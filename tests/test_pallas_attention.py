"""Pallas fused attention: numerics + gradients vs the XLA einsum path
(interpret mode on the CPU test platform)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xggm_tpu.ops.pallas_attention import (
    fused_attention, mha_pallas, _reference_attention,
)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.RandomState(0)
    BH, Lq, Lk, D = 24, 20, 36, 64
    q = jnp.asarray(rng.randn(BH, Lq, D), jnp.float32)
    k = jnp.asarray(rng.randn(BH, Lk, D), jnp.float32)
    v = jnp.asarray(rng.randn(BH, Lk, D), jnp.float32)
    bias = jnp.where(jnp.asarray(rng.rand(BH, Lk)) > 0.3, 0.0, -10000.0)
    return q, k, v, bias.astype(jnp.float32)


def test_forward_matches_reference(qkv):
    q, k, v, bias = qkv
    out = fused_attention(q, k, v, bias)
    ref, _ = _reference_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_reference(qkv):
    q, k, v, bias = qkv

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, bias) ** 2)

    def loss_ref(q, k, v):
        out, _ = _reference_attention(q, k, v, bias)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_mha_wrapper_shapes(qkv):
    rng = np.random.RandomState(1)
    B, H, Lq, Lk, D = 4, 6, 20, 36, 64
    q = jnp.asarray(rng.randn(B, H, Lq, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, Lk, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, Lk, D), jnp.float32)
    mask = jnp.asarray(rng.rand(B, Lk) > 0.2, jnp.float32)
    attn_bias = ((1.0 - mask) * -10000.0)[:, None, None, :]
    out = mha_pallas(q, k, v, attn_bias)
    assert out.shape == (B, H, Lq, D)
    # fully-masked-out bias None path
    out2 = mha_pallas(q, k, v, None)
    assert out2.shape == (B, H, Lq, D)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.fixture(scope="module")
def qkv_blhd():
    rng = np.random.RandomState(2)
    B, Lq, Lk, H, D = 8, 20, 36, 6, 64
    q = jnp.asarray(rng.randn(B, Lq, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, Lk, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, Lk, H, D), jnp.float32)
    bias = jnp.where(jnp.asarray(rng.rand(B, Lk)) > 0.3, 0.0, -10000.0)
    return q, k, v, bias.astype(jnp.float32)


def test_blhd_forward_matches_reference(qkv_blhd):
    from xggm_tpu.ops.pallas_attention import (
        fused_attention_blhd, _reference_attention_blhd)

    q, k, v, bias = qkv_blhd
    out = fused_attention_blhd(q, k, v, bias)
    ref, _ = _reference_attention_blhd(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_blhd_matches_flattened_layout(qkv_blhd):
    """The BLHD kernel computes the same attention as the [BH, L, D] kernel
    modulo the layout permutation."""
    q, k, v, bias = qkv_blhd
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    from xggm_tpu.ops.pallas_attention import fused_attention_blhd

    out4 = fused_attention_blhd(q, k, v, bias)
    qf = q.transpose(0, 2, 1, 3).reshape(B * H, Lq, D)
    kf = k.transpose(0, 2, 1, 3).reshape(B * H, Lk, D)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, Lk, D)
    biasf = jnp.broadcast_to(bias[:, None, :], (B, H, Lk)).reshape(B * H, Lk)
    outf = fused_attention(qf, kf, vf, biasf)
    np.testing.assert_allclose(
        np.asarray(out4),
        np.asarray(outf.reshape(B, H, Lq, D).transpose(0, 2, 1, 3)),
        rtol=2e-5, atol=2e-5)


def test_blhd_gradients_match_reference(qkv_blhd):
    from xggm_tpu.ops.pallas_attention import (
        fused_attention_blhd, _reference_attention_blhd)

    q, k, v, bias = qkv_blhd

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention_blhd(q, k, v, bias) ** 2)

    def loss_ref(q, k, v):
        out, _ = _reference_attention_blhd(q, k, v, bias)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_blhd_wrapper_shapes(qkv_blhd):
    from xggm_tpu.ops.pallas_attention import mha_pallas_blhd

    q, k, v, bias = qkv_blhd
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    attn_bias = bias[:, None, None, :]
    out = mha_pallas_blhd(q, k, v, attn_bias)
    assert out.shape == (B, Lq, H, D)
    out2 = mha_pallas_blhd(q, k, v, None)
    assert out2.shape == (B, Lq, H, D)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.skipif(
    True, reason="pltpu.prng_seed has no CPU interpret lowering; the dropout "
                 "variant is validated on real TPU by tools/drive_pallas.py")
def test_dropout_variant(qkv):
    from xggm_tpu.ops.pallas_attention import fused_attention_dropout

    q, k, v, bias = qkv
    seed = jnp.int32(7)
    # rate ~ 0: matches the no-dropout kernel
    out0 = fused_attention_dropout(q, k, v, bias, seed, 1e-9)
    ref = fused_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    out = fused_attention_dropout(q, k, v, bias, seed, 0.5)
    out_same = fused_attention_dropout(q, k, v, bias, seed, 0.5)
    out_diff = fused_attention_dropout(q, k, v, bias, jnp.int32(8), 0.5)
    # deterministic per seed; different across seeds
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_same))
    assert float(jnp.max(jnp.abs(out - out_diff))) > 0
    assert np.all(np.isfinite(np.asarray(out)))

    # gradients flow and regenerate the same mask (finite, deterministic)
    def loss(q, k, v):
        return jnp.sum(fused_attention_dropout(q, k, v, bias, seed, 0.3) ** 2)

    g1 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert np.all(np.isfinite(np.asarray(a)))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
