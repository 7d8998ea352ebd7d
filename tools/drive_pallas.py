"""Real-TPU validation + timing of the Pallas attention kernels.

Run on a TPU host:  python tools/drive_pallas.py
Checks: no-dropout kernel == XLA path; dropout kernel determinism per seed,
rate->0 parity, gradient determinism; full-model fwd timing with/without.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from xggm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from xggm_tpu.ops.pallas_attention import (
        fused_attention, fused_attention_dropout, _reference_attention)

    rng = np.random.RandomState(0)
    BH, Lq, Lk, D = 96 * 12, 20, 36, 64
    q = jnp.asarray(rng.randn(BH, Lq, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(BH, Lk, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(BH, Lk, D), jnp.bfloat16)
    bias = jnp.where(jnp.asarray(rng.rand(BH, Lk)) > 0.3, 0.0,
                     -10000.0).astype(jnp.float32)

    ref, _ = jax.jit(_reference_attention)(q, k, v, bias)
    out = jax.jit(fused_attention)(q, k, v, bias)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"no-dropout max err vs XLA: {err:.6f}", flush=True)
    assert err < 1e-2

    f = jax.jit(fused_attention_dropout, static_argnums=(5,))
    o1 = np.asarray(f(q, k, v, bias, jnp.int32(7), 0.5))
    o2 = np.asarray(f(q, k, v, bias, jnp.int32(7), 0.5))
    o3 = np.asarray(f(q, k, v, bias, jnp.int32(8), 0.5))
    assert np.array_equal(o1, o2), "dropout not deterministic per seed"
    assert not np.array_equal(o1, o3), "dropout ignores seed"
    drop_frac = float(np.mean(o1 == 0.0))
    print(f"dropout deterministic; zero fraction {drop_frac:.3f}", flush=True)

    o0 = f(q, k, v, bias, jnp.int32(7), 1e-9)
    err0 = float(jnp.max(jnp.abs(o0.astype(jnp.float32)
                                 - out.astype(jnp.float32))))
    print(f"rate->0 max err vs no-dropout: {err0:.6f}", flush=True)
    assert err0 < 1e-2

    def loss(q, k, v):
        return jnp.sum(fused_attention_dropout(
            q, k, v, bias, jnp.int32(3), 0.3).astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    g1 = jax.tree.map(np.asarray, g(q, k, v))
    g2 = jax.tree.map(np.asarray, g(q, k, v))
    for a, b in zip(g1, g2):
        assert np.isfinite(a).all()
        assert np.array_equal(a, b), "bwd mask != fwd mask"
    print("gradients finite and VJP-mask-consistent", flush=True)

    # --- BLHD layout path (natural [B, L, H, D], squeezed-head blocks) ---
    from xggm_tpu.ops.pallas_attention import (
        fused_attention_blhd, fused_attention_dropout_blhd,
        _reference_attention_blhd)

    B, H = 96, 12
    q4 = q.reshape(B, H, Lq, D).transpose(0, 2, 1, 3)
    k4 = k.reshape(B, H, Lk, D).transpose(0, 2, 1, 3)
    v4 = v.reshape(B, H, Lk, D).transpose(0, 2, 1, 3)
    bias4 = bias.reshape(B, H, Lk)[:, 0, :]

    ref4, _ = jax.jit(_reference_attention_blhd)(q4, k4, v4, bias4)
    out4 = jax.jit(fused_attention_blhd)(q4, k4, v4, bias4)
    err4 = float(jnp.max(jnp.abs(out4.astype(jnp.float32)
                                 - ref4.astype(jnp.float32))))
    print(f"blhd no-dropout max err vs XLA: {err4:.6f}", flush=True)
    assert err4 < 1e-2

    fb = jax.jit(fused_attention_dropout_blhd, static_argnums=(5,))
    b1 = np.asarray(fb(q4, k4, v4, bias4, jnp.int32(7), 0.5))
    b2 = np.asarray(fb(q4, k4, v4, bias4, jnp.int32(7), 0.5))
    b3 = np.asarray(fb(q4, k4, v4, bias4, jnp.int32(8), 0.5))
    assert np.array_equal(b1, b2), "blhd dropout not deterministic per seed"
    assert not np.array_equal(b1, b3), "blhd dropout ignores seed"
    b0 = fb(q4, k4, v4, bias4, jnp.int32(7), 1e-9)
    errb0 = float(jnp.max(jnp.abs(b0.astype(jnp.float32)
                                  - out4.astype(jnp.float32))))
    print(f"blhd rate->0 max err vs no-dropout: {errb0:.6f}", flush=True)
    assert errb0 < 1e-2

    def loss4(q4, k4, v4):
        return jnp.sum(fused_attention_dropout_blhd(
            q4, k4, v4, bias4, jnp.int32(3), 0.3).astype(jnp.float32) ** 2)

    g4 = jax.jit(jax.grad(loss4, argnums=(0, 1, 2)))
    ga = jax.tree.map(np.asarray, g4(q4, k4, v4))
    gb = jax.tree.map(np.asarray, g4(q4, k4, v4))
    for a, b in zip(ga, gb):
        assert np.isfinite(a).all()
        assert np.array_equal(a, b), "blhd bwd mask != fwd mask"
    print("blhd gradients finite and VJP-mask-consistent", flush=True)

    # timing
    for name, fn, args in [
        ("pallas-dropout fwd", lambda: f(q, k, v, bias, jnp.int32(7), 0.1), ()),
        ("pallas fwd", lambda: jax.jit(fused_attention)(q, k, v, bias), ()),
        ("blhd-dropout fwd", lambda: fb(q4, k4, v4, bias4, jnp.int32(7), 0.1),
         ()),
        ("blhd fwd", lambda: jax.jit(fused_attention_blhd)(q4, k4, v4, bias4),
         ()),
    ]:
        r = fn()
        _ = np.asarray(r).ravel()[0]
        t0 = time.perf_counter()
        for _i in range(100):
            r = fn()
        _ = np.asarray(r).ravel()[0]
        print(f"{name}: {(time.perf_counter()-t0)/100*1e6:.1f} us", flush=True)
    print("PASS", flush=True)


if __name__ == "__main__":
    main()
