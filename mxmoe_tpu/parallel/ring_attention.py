"""Ring attention: causal attention with the SEQUENCE sharded over a mesh
axis (context parallelism for long prefill).

Absent from the reference (SURVEY §5: no SP/CP anywhere) — net-new. Design:
each shard holds a contiguous S/P slice of Q, K, V; P ring steps rotate the
K/V block one hop over ICI (`jax.lax.ppermute`) while every shard
accumulates its queries' attention with an online-softmax merge, so peak
memory is O(S/P · S/P) per shard and the K/V transfer overlaps compute via
XLA's latency-hiding scheduler. Causality at block granularity: a shard
skips K/V blocks from later positions entirely and masks the diagonal
block triangularly.

Usage (inside shard_map over axis ``seq``): see :func:`make_ring_attention_fn`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _block_attention(q, k, v, scale, mask):
    """Scores for one (q-block, kv-block) pair -> (m, l, acc) contributions.

    q [B, Sq, n, hd]; k/v [B, Skv, n, hd]; mask [Sq, Skv] bool or None.
    Returns m [B, n, Sq], l [B, n, Sq], acc [B, n, Sq, hd].
    """
    s = jnp.einsum("bqnh,bknh->bnqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if mask is not None:
        s = jnp.where(mask[None, None], s, -jnp.inf)
    m = jnp.max(s, axis=-1)                                   # [B, n, Sq]
    # fully-masked rows produce m = -inf; exp(-inf - -inf) guarded below
    p = jnp.exp(s - jnp.where(jnp.isfinite(m), m, 0.0)[..., None])
    p = jnp.where(jnp.isfinite(s), p, 0.0)
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bnqk,bknh->bnqh", p, v.astype(jnp.float32))
    return m, l, acc


def _merge(m1, l1, a1, m2, l2, a2):
    """Merge two online-softmax partial states."""
    m = jnp.maximum(m1, m2)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    c1 = jnp.where(jnp.isfinite(m1), jnp.exp(m1 - m_safe), 0.0)
    c2 = jnp.where(jnp.isfinite(m2), jnp.exp(m2 - m_safe), 0.0)
    return m, l1 * c1 + l2 * c2, a1 * c1[..., None] + a2 * c2[..., None]


def ring_attention(
    q: jax.Array,      # [B, S_local, n_h, hd] this shard's queries
    k: jax.Array,      # [B, S_local, n_kv, hd]
    v: jax.Array,
    axis: str = "seq",
    scale: float | None = None,
) -> jax.Array:
    """Causal attention over the sequence-sharded axis. Call in shard_map."""
    b, s_l, n_h, hd = q.shape
    n_kv = k.shape[2]
    if n_kv != n_h:
        groups = n_h // n_kv
        k = jnp.repeat(k, groups, axis=2)
        v = jnp.repeat(v, groups, axis=2)
    scale = scale if scale is not None else 1.0 / float(hd) ** 0.5
    p = jax.lax.axis_size(axis)
    my = jax.lax.axis_index(axis)

    causal = jnp.tril(jnp.ones((s_l, s_l), bool))

    m0 = jnp.full((b, n_h, s_l), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, n_h, s_l), jnp.float32)
    a0 = jnp.zeros((b, n_h, s_l, hd), jnp.float32)
    # mark the literal init values as device-varying so the fori_loop carry
    # type matches the (shard-dependent) body outputs under shard_map
    if hasattr(jax.lax, "pvary"):
        m0, l0, a0 = (jax.lax.pvary(x, (axis,)) for x in (m0, l0, a0))

    def body(r, carry):
        m, l, acc, kr, vr = carry
        src = (my - r) % p          # the shard whose K/V block we now hold
        # src > my  -> future block: contribute nothing
        # src == my -> diagonal: causal triangle
        # src < my  -> past block: full attention
        is_diag = src == my
        is_past = src < my
        allowed = is_past | (is_diag & causal)        # [S_l, S_l]
        bm_, bl_, ba_ = _block_attention(q, kr, vr, scale, allowed)
        m, l, acc = _merge(m, l, acc, bm_, bl_, ba_)
        # rotate K/V one hop around the ring (shard i -> i+1)
        perm = [(i, (i + 1) % p) for i in range(p)]
        kr = jax.lax.ppermute(kr, axis, perm)
        vr = jax.lax.ppermute(vr, axis, perm)
        return m, l, acc, kr, vr

    m, l, acc, _, _ = jax.lax.fori_loop(0, p, body, (m0, l0, a0, k, v))
    out = acc / jnp.maximum(l, 1e-30)[..., None]              # [B, n, Sq, hd]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)          # [B, Sq, n, hd]


def make_ring_attention_fn(mesh, axis: str = "seq"):
    """shard_map wrapper: q/k/v sharded on sequence (dim 1), heads replicated."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def inner(q, k, v):
        return ring_attention(q, k, v, axis=axis)

    spec = P(None, axis, None, None)
    return shard_map(inner, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec)
