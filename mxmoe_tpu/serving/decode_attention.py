"""Fused decode attention: one Pallas kernel for Q·Kᵀ → softmax → ·V over
the head-major KV cache with per-slot lengths.

Round-1 measurement (PERF.md): cached attention at decode costs 0.78 ms
per layer at B=8 against a ~20 µs bandwidth floor — the XLA einsum path
burns its time in many small ops, f32 masking over S_max, and kernel
launch overhead. This kernel streams each (slot, kv-head)'s cache once,
with an online-softmax accumulator across S-blocks (flash-style, trivial
at s_new = 1), and skips blocks beyond the slot's valid length via a
CLAMPED block index (Pallas's revisit detection turns the repeated index
into no DMA) plus a pl.when compute guard.

Variants: bf16 cache, and int8 cache with per-(slot, head, position)
vector scales folded into scores / probs (QuantKVCache layout).
The serving path the reference never had (its ``ref_bind.cu`` binding is
broken as shipped) — our moat, per SURVEY §7.9.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _decode_attn_kernel(lengths, q_ref, k_ref, v_ref, out_ref,
                        m_ref, l_ref, acc_ref,
                        *, scale, block_s, s_blocks, groups, dv):
    b = pl.program_id(0)
    sblk = pl.program_id(2)
    length = lengths[b]

    @pl.when(sblk == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # positions this block covers; only run when any position is in range
    @pl.when(sblk * block_s <= length)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)                      # [G, dk]
        k = k_ref[0, 0].astype(jnp.float32)                      # [S_b, dk]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale          # [G, S_b]
        pos = sblk * block_s + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(pos <= length, s, -jnp.inf)

        m_prev = m_ref[...]                                      # [G, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                                   # [G, S_b]
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, 0].astype(jnp.float32)                      # [S_b, dv]
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[...] = m_new

    @pl.when(sblk == s_blocks - 1)
    def _():
        out = acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
        out_ref[0, 0] = out.astype(out_ref.dtype)


def _decode_attn_kernel_q8(lengths, q_ref, k_ref, ks_ref, v_ref, vs_ref,
                           out_ref, m_ref, l_ref, acc_ref,
                           *, scale, block_s, s_blocks, groups, dv):
    """int8-cache variant: scores *= k_scale[pos]; probs *= v_scale[pos]."""
    b = pl.program_id(0)
    sblk = pl.program_id(2)
    length = lengths[b]

    @pl.when(sblk == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(sblk * block_s <= length)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s * ks_ref[0, 0] * scale        # ks [1, S_b] broadcasts over G
        pos = sblk * block_s + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(pos <= length, s, -jnp.inf)

        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        l_raw = jnp.exp(s - m_new)
        # re-mask after the scale multiply: out-of-range positions carry
        # garbage v-scales and 0 * garbage would poison the accumulator
        p = jnp.where(pos <= length, l_raw * vs_ref[0, 0], 0.0)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(l_raw, axis=1, keepdims=True)
        v = v_ref[0, 0].astype(jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[...] = m_new

    @pl.when(sblk == s_blocks - 1)
    def _():
        out = acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
        out_ref[0, 0] = out.astype(out_ref.dtype)


def _clamped_s_index(lengths, block_s):
    """Index map factory: S-blocks beyond a slot's length re-map to the last
    in-range block, so Pallas skips their DMA (same index as previous)."""
    def idx(b, h, sblk, lengths):
        last = lengths[b] // block_s
        return (b, h, jnp.minimum(sblk, last), 0)
    return idx


def decode_attention(
    q: jax.Array,          # [B, n_h, dk] single-position queries
    cache_k: jax.Array,    # [B, n_kv, S, dk] (head-major cache layout)
    cache_v: jax.Array,    # [B, n_kv, S, dv]
    lengths: jax.Array,    # [B] int32 — query sits at position lengths[b]
    scale: float | None = None,
    block_s: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Fused single-step attention over the cache -> [B, n_h, dv]."""
    b, n_h, dk = q.shape
    _, n_kv, s_max, _ = cache_k.shape
    dv = cache_v.shape[-1]
    groups = n_h // n_kv
    scale = scale if scale is not None else 1.0 / float(dk) ** 0.5
    block_s = min(block_s, s_max)
    s_blocks = _cdiv(s_max, block_s)

    qg = q.reshape(b, n_kv, groups, dk)
    kernel = functools.partial(
        _decode_attn_kernel, scale=scale, block_s=block_s,
        s_blocks=s_blocks, groups=groups, dv=dv)
    kv_idx = _clamped_s_index(lengths, block_s)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_kv, s_blocks),
            in_specs=[
                pl.BlockSpec((1, 1, groups, dk),
                             lambda b, h, sblk, lengths: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, block_s, dk), kv_idx),
                pl.BlockSpec((1, 1, block_s, dv), kv_idx),
            ],
            out_specs=pl.BlockSpec((1, 1, groups, dv),
                                   lambda b, h, sblk, lengths: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((groups, 1), jnp.float32),
                pltpu.VMEM((groups, 1), jnp.float32),
                pltpu.VMEM((groups, dv), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_kv, groups, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, qg, cache_k, cache_v)
    return out.reshape(b, n_h, dv)


def decode_attention_q8(
    q: jax.Array,          # [B, n_h, dk]
    cache_kq: jax.Array,   # [B, n_kv, S, dk] int8
    cache_ks: jax.Array,   # [B, n_kv, S] f32 per-vector scales
    cache_vq: jax.Array,
    cache_vs: jax.Array,
    lengths: jax.Array,
    scale: float | None = None,
    block_s: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Fused single-step attention over the INT8 cache (QuantKVCache):
    scales fold into scores/probs in-kernel — 2x less cache bandwidth."""
    b, n_h, dk = q.shape
    _, n_kv, s_max, _ = cache_kq.shape
    dv = cache_vq.shape[-1]
    groups = n_h // n_kv
    scale = scale if scale is not None else 1.0 / float(dk) ** 0.5
    block_s = min(block_s, s_max)
    s_blocks = _cdiv(s_max, block_s)

    qg = q.reshape(b, n_kv, groups, dk)
    kernel = functools.partial(
        _decode_attn_kernel_q8, scale=scale, block_s=block_s,
        s_blocks=s_blocks, groups=groups, dv=dv)
    kv_idx = _clamped_s_index(lengths, block_s)

    # scales ride as [B, n_kv, 1, S]: a [B, n_kv, S] operand with block
    # (1, 1, block_s) violates the TPU (8, 128) tiling rule on its last
    # two dims (second-to-last block 1 != n_kv); with the unit axis the
    # block (1, 1, 1, block_s) has second-to-last == full dim — legal.
    ks4 = cache_ks.reshape(b, n_kv, 1, s_max)
    vs4 = cache_vs.reshape(b, n_kv, 1, s_max)

    def sc_idx(b, h, sblk, lengths):
        last = lengths[b] // block_s
        return (b, h, 0, jnp.minimum(sblk, last))

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_kv, s_blocks),
            in_specs=[
                pl.BlockSpec((1, 1, groups, dk),
                             lambda b, h, sblk, lengths: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, block_s, dk), kv_idx),
                pl.BlockSpec((1, 1, 1, block_s), sc_idx),
                pl.BlockSpec((1, 1, block_s, dv), kv_idx),
                pl.BlockSpec((1, 1, 1, block_s), sc_idx),
            ],
            out_specs=pl.BlockSpec((1, 1, groups, dv),
                                   lambda b, h, sblk, lengths: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((groups, 1), jnp.float32),
                pltpu.VMEM((groups, 1), jnp.float32),
                pltpu.VMEM((groups, dv), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_kv, groups, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, qg, cache_kq, ks4, cache_vq, vs4)
    return out.reshape(b, n_h, dv)
