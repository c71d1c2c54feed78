"""Grouped (ragged) matmul front-end.

The single entry point ``gmm(lhs, rhs, group_sizes)`` computes, for each
expert g, ``out[rows_g] = lhs[rows_g] @ rhs[g]`` where rows are contiguous
per group (expert-sorted). Backends:

  'ragged_dot' — jax.lax.ragged_dot, XLA's native grouped matmul
  'dense'      — one-hot einsum reference (oracle for tests)
  'pallas'     — our Pallas TPU kernel (mxmoe_tpu.ops.pallas_gmm)

This is the TPU analog of the reference's grouped-GEMM problem list
(``hz_fused.cuh:128-211``): one logical launch covering all experts of a
layer, with per-expert row counts from routing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gmm_dense_reference(lhs: jax.Array, rhs: jax.Array, group_sizes: jax.Array) -> jax.Array:
    """O(E)-compute oracle: mask-and-sum over experts. Exact for any sizes."""
    m = lhs.shape[0]
    e = rhs.shape[0]
    ends = jnp.cumsum(group_sizes)
    starts = ends - group_sizes
    row = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    out = jnp.zeros((m, rhs.shape[-1]), dtype=jnp.promote_types(lhs.dtype, rhs.dtype))
    for g in range(e):
        mask = (row >= starts[g]) & (row < ends[g])
        contrib = (jnp.where(mask, 1, 0).astype(lhs.dtype) * lhs) @ rhs[g]
        out = out + contrib
    return out


def gmm(
    lhs: jax.Array,          # [M, K] expert-sorted rows
    rhs: jax.Array,          # [E, K, N]
    group_sizes: jax.Array,  # [E] int32
    backend: str = "ragged_dot",
    preferred_element_type=None,
) -> jax.Array:
    if backend == "ragged_dot":
        return jax.lax.ragged_dot(
            lhs, rhs, group_sizes,
            preferred_element_type=preferred_element_type or lhs.dtype,
        )
    if backend == "dense":
        return gmm_dense_reference(lhs, rhs, group_sizes)
    if backend == "pallas":
        from . import pallas_gmm

        return pallas_gmm.gmm_bf16(lhs, rhs, group_sizes)
    raise ValueError(f"unknown gmm backend {backend!r}")


def int8_dot_ksplit(aq: jax.Array, wq: jax.Array) -> jax.Array:
    """Dense int8 dot -> int32, 2-way K-split on tall-narrow weights.

    XLA's int8 dot collapses at tall-narrow shapes (K=5632, N=2048:
    ~120 TFLOPS vs 339 at K=2048/N=11264, PERF.md "Shared-expert");
    summing two K-half dots in int32 restores the rate and is EXACT
    (int32 accumulation — bitwise-identical output). The shared-expert
    execution path for real-quantized models (models.layers
    shared_expert_ffn, bench.py _shared_int8_dot)."""
    k, n = wq.shape
    if k >= 2 * n and k % 2 == 0:
        h = k // 2
        return (jnp.dot(aq[:, :h], wq[:h], preferred_element_type=jnp.int32)
                + jnp.dot(aq[:, h:], wq[h:],
                          preferred_element_type=jnp.int32))
    return jnp.dot(aq, wq, preferred_element_type=jnp.int32)
