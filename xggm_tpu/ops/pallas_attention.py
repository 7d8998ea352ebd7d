"""Pallas fused attention for LXMERT's tiny-sequence regime.

At LXMERT shapes (Lq, Lk <= 56, D=64, H=12, large batch) attention is
bandwidth-bound, not FLOP-bound: XLA materializes the [B, H, Lq, Lk] score
and probability tensors in HBM between the three ops. This kernel performs
score -> +bias -> softmax -> @V in ONE pass over VMEM per (batch*head)
group - the probability tensor never touches HBM.

Layout: the caller flattens (B, H) into the leading axis. The grid tiles
that axis; each program holds G groups' q/k/v blocks in VMEM and runs a
G-batched dot_general (the G axis supplies MXU work that the tiny Lq/Lk
cannot).

Exposed as `fused_attention(q, k, v, bias)` with a custom VJP whose backward
recomputes probabilities in plain XLA (flash-attention-style rematerialize):
forward gets the fused win, gradients stay exact.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

Array = jax.Array


# ---------------------------------------------------------------------------
# SPMD partitioning: every kernel here is purely batch-parallel over the
# flattened (batch*head) leading axis, so under a multi-device mesh the
# pallas_call partitions trivially - each shard runs the same kernel on its
# local rows. custom_partitioning teaches GSPMD/Shardy exactly that (the
# reference carries its full model under nn.DataParallel the same way,
# src/lxrt/entry.py:103-104); without it a pallas custom-call inside a
# GSPMD-jitted step cannot be partitioned at all.
# ---------------------------------------------------------------------------


def _dim0_partition(lower_fn):
    """Partition rule: shard ONLY the leading axis (with whatever mesh axes
    operand 0 carries there), replicate every other dim, run the kernel
    per-shard on the local rows."""

    def partition(mesh, arg_infos, result_infos):
        spec = arg_infos[0].sharding.spec
        axes0 = spec[0] if len(spec) else None

        def sh(info):
            return NamedSharding(
                mesh, P(axes0, *([None] * (len(info.shape) - 1))))

        arg_shardings = tuple(sh(a) for a in arg_infos)
        if isinstance(result_infos, (list, tuple)):
            result_shardings = tuple(sh(r) for r in result_infos)
        else:
            result_shardings = sh(result_infos)
        return mesh, lower_fn, result_shardings, arg_shardings

    return partition


def _dim0_infer(n_results=1):
    """GSPMD-fallback sharding inference: results shard like operand 0's
    leading axis."""

    def infer(mesh, arg_infos, result_infos):
        spec = arg_infos[0].sharding.spec
        axes0 = spec[0] if len(spec) else None

        def sh(info):
            return NamedSharding(
                mesh, P(axes0, *([None] * (len(info.shape) - 1))))

        if isinstance(result_infos, (list, tuple)):
            return tuple(sh(r) for r in result_infos)
        return sh(result_infos)

    return infer

# Batch-group rows per program for the flattened [B*H, L, D] kernels.
# Swept on v5e at the flagship shapes (tools/perf_probe.py --pallas_group,
# full two-phase step): G=16 92.8 ms, G=32 90.8, G=64 90.6 - bigger groups
# amortize per-program overhead and give the MXU deeper batched dots; gains
# flatten past 32 and G=128 blows the 16 MB scoped-VMEM budget (27 MB on
# the Lq=Lk=36 dropout backward). _pick_group reduces G to a divisor of
# B*H for other batch sizes.
DEFAULT_GROUP = 64


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[:]                        # [G, Lq, D]
    k = k_ref[:]                        # [G, Lk, D]
    v = v_ref[:]                        # [G, Lk, D]
    bias = bias_ref[:]                  # [G, Lk] additive (0 / -10000)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [G, Lq, Lk]
    s = s * scale + bias[:, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [G, Lq, D]
    o_ref[:] = o.astype(o_ref.dtype)


def _fused_attention_fwd_impl(q: Array, k: Array, v: Array, bias: Array,
                              group: int | None = None) -> Array:
    """q [BH, Lq, D], k/v [BH, Lk, D], bias [BH, Lk] -> [BH, Lq, D]."""
    bh, lq, d = q.shape
    lk = k.shape[1]
    g = _pick_group(bh, group)
    grid = (bh // g,)

    return pl.pallas_call(
        functools.partial(_attention_kernel, scale=1.0 / (d ** 0.5)),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, lq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, lq, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(q, k, v, bias)


def _make_fwd_cp():
    fn = custom_partitioning(
        lambda q, k, v, bias: _fused_attention_fwd_impl(q, k, v, bias))
    fn.def_partition(
        partition=_dim0_partition(
            lambda q, k, v, bias: _fused_attention_fwd_impl(q, k, v, bias)),
        infer_sharding_from_operands=_dim0_infer(),
        sharding_rule="b lq d, b lk d, b lk d, b lk -> b lq d",
        # NB: must be sorted by first-appearance factor index
        need_replication_factors=("lq", "d", "lk"))
    return fn


_fused_attention_fwd_sharded = _make_fwd_cp()


def _reference_attention(q, k, v, bias):
    s = jnp.einsum("gqd,gkd->gqk", q, k, preferred_element_type=jnp.float32)
    s = s / (q.shape[-1] ** 0.5) + bias[:, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("gqk,gkd->gqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype), p


@jax.custom_vjp
def fused_attention(q: Array, k: Array, v: Array, bias: Array) -> Array:
    """Fused softmax attention over flattened (batch*head) groups. Partitions
    over the leading axis on multi-device meshes; the einsum backward shards
    natively in XLA."""
    return _fused_attention_fwd_sharded(q, k, v, bias)


def _fwd(q, k, v, bias):
    return _fused_attention_fwd_sharded(q, k, v, bias), (q, k, v, bias)


def _bwd(res, g_out):
    q, k, v, bias = res
    # rematerialize probabilities in plain XLA; gradients are exact
    _, p = _reference_attention(q, k, v, bias)
    g_out32 = g_out.astype(jnp.float32)
    p32 = p.astype(jnp.float32)
    dv = jnp.einsum("gqk,gqd->gkd", p32, g_out32)
    dp = jnp.einsum("gqd,gkd->gqk", g_out32, v.astype(jnp.float32))
    ds = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
    scale = 1.0 / (q.shape[-1] ** 0.5)
    dq = jnp.einsum("gqk,gkd->gqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("gqk,gqd->gkd", ds, q.astype(jnp.float32)) * scale
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(bias))


fused_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Training-path variant: in-kernel attention-prob dropout. The Bernoulli mask
# is generated INSIDE the kernel via the TPU PRNG and regenerated identically
# in the backward kernel - the [B,H,Lq,Lk] mask never exists in HBM in either
# pass. Each batch group is seeded from a PER-ROW seed vector (seed +
# global_row_index, built in mha_pallas_dropout): seeds stay globally unique
# under SPMD partitioning, where every shard's program_id restarts at 0.
# ---------------------------------------------------------------------------


def _dropout_keep(shape, rate):
    """uint32 threshold comparison -> {0, 1/(1-rate)} scale mask."""
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(int(rate * 0xFFFFFFFF))
    keep = (pltpu.bitcast(bits, jnp.uint32) >= threshold)
    return keep.astype(jnp.float32) / (1.0 - rate)


def _group_dropout_mask(seed_ref, shape, rate, interpret):
    """Seed from this group's first-row seed and draw the keep mask.

    TPU path: hardware PRNG (pltpu). Interpret path (CPU tests/meshes):
    threefry from the same seed - pltpu.prng_seed has no CPU lowering.
    Either way the backward kernel reruns this with the identical seed and
    regenerates the identical mask.
    """
    if interpret:
        key = jax.random.PRNGKey(seed_ref[0, 0].astype(jnp.uint32))
        keep = jax.random.uniform(key, shape) >= rate
        return keep.astype(jnp.float32) / (1.0 - rate)
    pltpu.prng_seed(seed_ref[0, 0])
    return _dropout_keep(shape, rate)


def _attn_probs(q, k, bias, scale):
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    s = s * scale + bias[:, None, :].astype(jnp.float32)
    return jax.nn.softmax(s, axis=-1)


def _attention_dropout_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref,
                                  o_ref, *, scale, rate, interpret):
    # seed_ref is this group's [g, 1] slice of the per-row seed vector; the
    # group's first row's seed is globally unique (rows are disjoint)
    p = _attn_probs(q_ref[:], k_ref[:], bias_ref[:], scale)
    m = _group_dropout_mask(seed_ref, p.shape, rate, interpret)
    o = jax.lax.dot_general(
        (p * m).astype(v_ref.dtype), v_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


def _attention_dropout_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref,
                                  g_ref, dq_ref, dk_ref, dv_ref,
                                  *, scale, rate, interpret):
    # regenerate the exact forward mask: same per-group seed, same bit order
    q, k, v = q_ref[:], k_ref[:], v_ref[:]
    p = _attn_probs(q, k, bias_ref[:], scale)
    m = _group_dropout_mask(seed_ref, p.shape, rate, interpret)
    g = g_ref[:].astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    pm = p * m
    # dv = (m*p)^T g
    dv = jax.lax.dot_general(
        pm, g, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    # dp = m * (g v^T); softmax backward
    dp = jax.lax.dot_general(
        g, v32, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * m
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(
        ds, k.astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        ds, q.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _dropout_specs(g, lq, lk, d):
    qspec = pl.BlockSpec((g, lq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((g, lk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((g, lk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    # [bh, 1] per-row seeds: (g, 1) blocks keep the last-two-dims block rule
    # (g 8-divisible, trailing dim full)
    sspec = pl.BlockSpec((g, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return qspec, kspec, bspec, sspec


def _pick_group(bh, group=None):
    group = group or DEFAULT_GROUP
    g = min(group, bh)
    while bh % g:
        g -= 1
    return g


def _fused_dropout_fwd_impl(seeds, q, k, v, bias, *, rate, group=None):
    """seeds [bh, 1] int32 per-row, q [bh, lq, d], k/v [bh, lk, d],
    bias [bh, lk] -> [bh, lq, d]."""
    bh, lq, d = q.shape
    lk = k.shape[1]
    g = _pick_group(bh, group)
    qspec, kspec, bspec, sspec = _dropout_specs(g, lq, lk, d)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_attention_dropout_fwd_kernel,
                          scale=1.0 / (d ** 0.5), rate=rate,
                          interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        grid=(bh // g,),
        in_specs=[sspec, qspec, kspec, kspec, bspec],
        out_specs=pl.BlockSpec((g, lq, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(seeds, q, k, v, bias)


def _fused_dropout_bwd_impl(seeds, q, k, v, bias, g_out, *, rate,
                            group=None):
    bh, lq, d = q.shape
    lk = k.shape[1]
    g = _pick_group(bh, group)
    qspec, kspec, bspec, sspec = _dropout_specs(g, lq, lk, d)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_attention_dropout_bwd_kernel,
                          scale=1.0 / (d ** 0.5), rate=rate,
                          interpret=interpret),
        out_shape=[jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, lk, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, lk, d), v.dtype)],
        grid=(bh // g,),
        in_specs=[sspec, qspec, kspec, kspec, bspec, qspec],
        out_specs=[
            pl.BlockSpec((g, lq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        interpret=jax.default_backend() != "tpu",
    )(seeds, q, k, v, bias, g_out)


_DROPOUT_RULE_IN = "b one, b lq d, b lk d, b lk d, b lk"
# sorted by first-appearance factor index (Shardy requires it)
_DROPOUT_REPL = ("one", "lq", "d", "lk")


@functools.lru_cache(maxsize=None)
def _dropout_fwd_sharded(rate: float):
    def impl(seeds, q, k, v, bias):
        return _fused_dropout_fwd_impl(seeds, q, k, v, bias, rate=rate)

    fn = custom_partitioning(impl)
    fn.def_partition(
        partition=_dim0_partition(impl),
        infer_sharding_from_operands=_dim0_infer(),
        sharding_rule=f"{_DROPOUT_RULE_IN} -> b lq d",
        need_replication_factors=_DROPOUT_REPL)
    return fn


@functools.lru_cache(maxsize=None)
def _dropout_bwd_sharded(rate: float):
    def impl(seeds, q, k, v, bias, g_out):
        return _fused_dropout_bwd_impl(seeds, q, k, v, bias, g_out,
                                       rate=rate)

    fn = custom_partitioning(impl)
    fn.def_partition(
        partition=_dim0_partition(impl),
        infer_sharding_from_operands=_dim0_infer(3),
        sharding_rule=f"{_DROPOUT_RULE_IN}, b lq d"
                      " -> b lq d, b lk d, b lk d",
        need_replication_factors=_DROPOUT_REPL)
    return fn


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_attention_dropout(q, k, v, bias, seeds, rate):
    """Fused attention with in-kernel inverted dropout on the probabilities
    (rate static; seeds a traced [bh, 1] int32 vector of per-row seeds)."""
    return _dropout_fwd_sharded(rate)(seeds, q, k, v, bias)


def _fwd_drop(q, k, v, bias, seeds, rate):
    return _dropout_fwd_sharded(rate)(seeds, q, k, v, bias), \
        (q, k, v, bias, seeds)


def _bwd_drop(rate, res, g_out):
    q, k, v, bias, seeds = res
    dq, dk, dv = _dropout_bwd_sharded(rate)(seeds, q, k, v, bias, g_out)
    return dq, dk, dv, jnp.zeros_like(bias), None


fused_attention_dropout.defvjp(_fwd_drop, _bwd_drop)


def mha_pallas_dropout(q: Array, k: Array, v: Array,
                       attn_bias: Optional[Array], seed: Array,
                       rate: float) -> Array:
    """[B, H, L, D] wrapper for the dropout variant. The scalar seed expands
    to per-row seeds (seed + row index) so masks stay distinct across batch
    groups AND across mesh shards."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    qf = q.reshape(b * h, lq, d)
    kf = k.reshape(b * h, lk, d)
    vf = v.reshape(b * h, lk, d)
    if attn_bias is None:
        bias = jnp.zeros((b * h, lk), jnp.float32)
    else:
        bias = jnp.broadcast_to(attn_bias[:, 0, 0, :][:, None, :],
                                (b, h, lk)).reshape(b * h, lk)
    seeds = (seed + jax.lax.iota(jnp.int32, b * h))[:, None]
    out = fused_attention_dropout(qf, kf, vf, bias.astype(jnp.float32),
                                  seeds, rate)
    return out.reshape(b, h, lq, d)


# ---------------------------------------------------------------------------
# BLHD layout path (EXPLORED AND REJECTED as the default — kept tested and
# runnable as the record of the experiment): consumes q [B, Lq, H, D] /
# k, v [B, Lk, H, D] — the free reshape of the projection output — instead
# of the transposed [B, H, L, D], so the ~10 ms/step of transpose copies XLA
# emits around the flattened kernels never happen. Each program's block
# covers a batch group with ALL heads (contiguous DMA); the head loop runs
# inside the kernel via keep-dims ref slices.
#
# Measured on v5e (tools/perf_probe.py, bs 96 bf16 rbg): full two-phase step
# 113.2 ms vs 93.6 ms for the flattened path — the strided per-head VMEM
# loads and fp32 stack relayouts cost ~2x what the transposes did. The
# flattened [B*H, L, D] kernels stay the production path.
#
# Mosaic notes (probed on v5e): a squeezed/size-1 head block dim in the
# second-to-last position violates the (8, 128)-divisible block rule;
# value-level middle-axis slicing lowers to a ~10x-slower relayout; per-head
# ref STORES crash the compile helper; a bf16 expand-dims reshape feeding
# jnp.stack fails layout inference (stack fp32, cast after). The working
# pattern is keep-dims ref LOADS (`ref[:, :, h:h+1, :]` + reshape) with one
# stacked store.
# ---------------------------------------------------------------------------


def _blhd_specs(g, lq, lk, h, d):
    # index maps take (*grid_indices, *scalar_prefetch_refs); block units
    qspec = pl.BlockSpec((g, lq, h, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((g, lk, h, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((g, lk), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    return qspec, kspec, bspec


def _head_slices(q_ref, k_ref, v_ref, h):
    """Keep-dims ref loads of head h, squeezed to [G, L, D]."""
    qh = q_ref[:, :, h:h + 1, :]
    kh = k_ref[:, :, h:h + 1, :]
    vh = v_ref[:, :, h:h + 1, :]
    g, lq, _, d = qh.shape
    lk = kh.shape[1]
    return (qh.reshape(g, lq, d), kh.reshape(g, lk, d),
            vh.reshape(g, lk, d))


def _attention_blhd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    bias = bias_ref[:]                     # [G, Lk]
    outs = []
    for h in range(q_ref.shape[2]):
        q, k, v = _head_slices(q_ref, k_ref, v_ref, h)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # [G, Lq, Lk]
        s = s * scale + bias[:, None, :].astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        outs.append(jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))        # [G, Lq, D]
    # stack in fp32, cast once: Mosaic cannot layout-infer the bf16
    # expand-dims reshape that a per-head cast would feed into stack
    o_ref[:] = jnp.stack(outs, axis=2).astype(o_ref.dtype)


def _fused_attention_blhd_impl(q: Array, k: Array, v: Array, bias: Array,
                               group: int | None = None) -> Array:
    """q [B, Lq, H, D], k/v [B, Lk, H, D], bias [B, Lk] -> [B, Lq, H, D]."""
    b, lq, h, d = q.shape
    lk = k.shape[1]
    # BLHD blocks carry ALL heads: DEFAULT_GROUP (tuned for the flattened
    # per-(b,h) kernels) would blow scoped VMEM here; 16 is the validated
    # batch-group for this layout.
    g = _pick_group(b, group or 16)
    qspec, kspec, bspec = _blhd_specs(g, lq, lk, h, d)
    return pl.pallas_call(
        functools.partial(_attention_blhd_kernel, scale=1.0 / (d ** 0.5)),
        out_shape=jax.ShapeDtypeStruct((b, lq, h, d), q.dtype),
        grid=(b // g,),
        in_specs=[qspec, kspec, kspec, bspec],
        out_specs=qspec,
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, bias)


def _reference_attention_blhd(q, k, v, bias):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s / (q.shape[-1] ** 0.5) + bias[:, None, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return o.astype(q.dtype), p


@jax.custom_vjp
def fused_attention_blhd(q: Array, k: Array, v: Array, bias: Array) -> Array:
    """Fused softmax attention in the natural [B, L, H, D] layout."""
    return _fused_attention_blhd_impl(q, k, v, bias)


def _fwd_blhd(q, k, v, bias):
    return _fused_attention_blhd_impl(q, k, v, bias), (q, k, v, bias)


def _bwd_blhd(res, g_out):
    q, k, v, bias = res
    _, p = _reference_attention_blhd(q, k, v, bias)   # [B, H, Lq, Lk] fp32
    g32 = g_out.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, g32)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g32, v32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    scale = 1.0 / (q.shape[-1] ** 0.5)
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q.astype(jnp.float32)) * scale
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(bias))


fused_attention_blhd.defvjp(_fwd_blhd, _bwd_blhd)


def _attention_dropout_blhd_fwd_kernel(seed_ref, q_ref, k_ref, v_ref,
                                       bias_ref, o_ref, *, scale, rate,
                                       group):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    # bias_ref holds the FULL [B, Lk] bias (a g<8 block would violate the
    # 8-sublane block rule); slice this program's batch rows dynamically
    bias = bias_ref[pl.ds(pl.program_id(0) * group, group), :]
    outs = []
    # the head loop consumes PRNG bits in head order; the backward kernel
    # reseeds identically and replays the same order -> identical masks
    for h in range(q_ref.shape[2]):
        q, k, v = _head_slices(q_ref, k_ref, v_ref, h)
        p = _attn_probs(q, k, bias, scale)
        m = _dropout_keep(p.shape, rate)
        outs.append(jax.lax.dot_general(
            (p * m).astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    o_ref[:] = jnp.stack(outs, axis=2).astype(o_ref.dtype)


def _attention_dropout_blhd_bwd_kernel(seed_ref, q_ref, k_ref, v_ref,
                                       bias_ref, g_ref, dq_ref, dk_ref,
                                       dv_ref, *, scale, rate, group):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    bias = bias_ref[pl.ds(pl.program_id(0) * group, group), :]
    dqs, dks, dvs = [], [], []
    for h in range(q_ref.shape[2]):
        q, k, v = _head_slices(q_ref, k_ref, v_ref, h)
        gh = g_ref[:, :, h:h + 1, :]
        g_, lq, _, d = gh.shape
        g32 = gh.reshape(g_, lq, d).astype(jnp.float32)
        p = _attn_probs(q, k, bias, scale)
        m = _dropout_keep(p.shape, rate)
        v32 = v.astype(jnp.float32)
        pm = p * m
        dvs.append(jax.lax.dot_general(
            pm, g32, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
        dp = jax.lax.dot_general(
            g32, v32, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * m
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dqs.append(jax.lax.dot_general(
            ds, k.astype(jnp.float32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale)
        dks.append(jax.lax.dot_general(
            ds, q.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale)
    dq_ref[:] = jnp.stack(dqs, axis=2).astype(dq_ref.dtype)
    dk_ref[:] = jnp.stack(dks, axis=2).astype(dk_ref.dtype)
    dv_ref[:] = jnp.stack(dvs, axis=2).astype(dv_ref.dtype)


def _dropout_group(lq: int, lk: int) -> int:
    """Batch-group size for the BLHD dropout kernel pair.

    The unrolled per-head backward holds ~H live fp32 intermediates; at G=16
    (and at G=8 for Lq=36 rows) that blows the 16 MB scoped-VMEM limit. The
    forward MUST use the same (group, grid) as the backward so in-kernel
    mask regeneration stays aligned."""
    return 8 if lq <= 20 else 4


def _fused_dropout_blhd_fwd_impl(q, k, v, bias, seed, rate, group=None):
    b, lq, h, d = q.shape
    lk = k.shape[1]
    g = _pick_group(b, group or _dropout_group(lq, lk))
    qspec, kspec, _ = _blhd_specs(g, lq, lk, h, d)
    bspec = pl.BlockSpec((b, lk), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(b // g,),
        in_specs=[qspec, kspec, kspec, bspec],
        out_specs=qspec)
    return pl.pallas_call(
        functools.partial(_attention_dropout_blhd_fwd_kernel,
                          scale=1.0 / (d ** 0.5), rate=rate, group=g),
        out_shape=jax.ShapeDtypeStruct((b, lq, h, d), q.dtype),
        grid_spec=grid_spec,
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray([seed], jnp.int32), q, k, v, bias)


def _fused_dropout_blhd_bwd_impl(q, k, v, bias, seed, rate, g_out,
                                 group=None):
    b, lq, h, d = q.shape
    lk = k.shape[1]
    g = _pick_group(b, group or _dropout_group(lq, lk))
    qspec, kspec, _ = _blhd_specs(g, lq, lk, h, d)
    bspec = pl.BlockSpec((b, lk), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(b // g,),
        in_specs=[qspec, kspec, kspec, bspec, qspec],
        out_specs=[qspec, kspec, kspec])
    return pl.pallas_call(
        functools.partial(_attention_dropout_blhd_bwd_kernel,
                          scale=1.0 / (d ** 0.5), rate=rate, group=g),
        out_shape=[jax.ShapeDtypeStruct((b, lq, h, d), q.dtype),
                   jax.ShapeDtypeStruct((b, lk, h, d), k.dtype),
                   jax.ShapeDtypeStruct((b, lk, h, d), v.dtype)],
        grid_spec=grid_spec,
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray([seed], jnp.int32), q, k, v, bias, g_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_attention_dropout_blhd(q, k, v, bias, seed, rate):
    """BLHD-layout fused attention with in-kernel inverted dropout on the
    probabilities (rate static; seed a traced int32 scalar)."""
    return _fused_dropout_blhd_fwd_impl(q, k, v, bias, seed, rate)


def _fwd_drop_blhd(q, k, v, bias, seed, rate):
    return _fused_dropout_blhd_fwd_impl(q, k, v, bias, seed, rate), \
        (q, k, v, bias, seed)


def _bwd_drop_blhd(rate, res, g_out):
    q, k, v, bias, seed = res
    dq, dk, dv = _fused_dropout_blhd_bwd_impl(q, k, v, bias, seed, rate,
                                              g_out)
    return dq, dk, dv, jnp.zeros_like(bias), None


fused_attention_dropout_blhd.defvjp(_fwd_drop_blhd, _bwd_drop_blhd)


def _bias_2d(attn_bias: Optional[Array], b: int, lk: int) -> Array:
    if attn_bias is None:
        return jnp.zeros((b, lk), jnp.float32)
    return attn_bias[:, 0, 0, :].astype(jnp.float32)


def mha_pallas_blhd(q: Array, k: Array, v: Array,
                    attn_bias: Optional[Array]) -> Array:
    """[B, L, H, D] attention (no transposes at the kernel boundary).

    attn_bias: [B, 1, 1, Lk] additive mask or None."""
    b, lq, h, d = q.shape
    lk = k.shape[1]
    return fused_attention_blhd(q, k, v, _bias_2d(attn_bias, b, lk))


def mha_pallas_dropout_blhd(q: Array, k: Array, v: Array,
                            attn_bias: Optional[Array], seed: Array,
                            rate: float) -> Array:
    """[B, L, H, D] wrapper for the BLHD dropout variant."""
    b, lq, h, d = q.shape
    lk = k.shape[1]
    return fused_attention_dropout_blhd(q, k, v, _bias_2d(attn_bias, b, lk),
                                        seed, rate)


def mha_pallas(q: Array, k: Array, v: Array,
               attn_bias: Optional[Array]) -> Array:
    """Drop-in for the [B, H, L, D] einsum attention path.

    attn_bias: [B, 1, 1, Lk] additive mask or None."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    qf = q.reshape(b * h, lq, d)
    kf = k.reshape(b * h, lk, d)
    vf = v.reshape(b * h, lk, d)
    if attn_bias is None:
        bias = jnp.zeros((b * h, lk), jnp.float32)
    else:
        bias = jnp.broadcast_to(attn_bias[:, 0, 0, :][:, None, :],
                                (b, h, lk)).reshape(b * h, lk)
    out = fused_attention(qf, kf, vf, bias.astype(jnp.float32))
    return out.reshape(b, h, lq, d)
