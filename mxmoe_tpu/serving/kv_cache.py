"""Static-shape KV cache for decode.

Layout: per layer K/V stacked [L, B, S_max, n_kv, hd] so the scanned layer
loop indexes its slice; batch slots are independent (continuous batching
assigns/evicts slots). All updates are `dynamic_update_slice` at per-slot
positions — no dynamic shapes anywhere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.configs import MoEConfig


class KVCache(NamedTuple):
    k: jax.Array          # [L, B, S_max, n_kv, hd]
    v: jax.Array          # [L, B, S_max, n_kv, hd]
    lengths: jax.Array    # [B] int32 valid tokens per slot

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def init_kv_cache(
    cfg: MoEConfig, batch: int, max_len: int, dtype=jnp.bfloat16
) -> KVCache:
    """K/V head dims differ under MLA (qk_head_dim vs v_head_dim)."""
    if cfg.attention_type == "mla":
        n_kv, k_dim, v_dim = cfg.num_heads, cfg.qk_head_dim, cfg.v_head_dim
    else:
        n_kv = cfg.num_kv_heads
        k_dim = v_dim = cfg.head_dim
    return KVCache(
        k=jnp.zeros((cfg.num_layers, batch, max_len, n_kv, k_dim), dtype),
        v=jnp.zeros((cfg.num_layers, batch, max_len, n_kv, v_dim), dtype),
        lengths=jnp.zeros((batch,), jnp.int32),
    )


def update_layer_cache(
    cache_k: jax.Array,   # [B, S_max, n_kv, hd] one layer's K
    cache_v: jax.Array,
    new_k: jax.Array,     # [B, S_new, n_kv, hd]
    new_v: jax.Array,
    lengths: jax.Array,   # [B] current lengths (write offsets)
) -> tuple[jax.Array, jax.Array]:
    """Scatter new entries at each slot's current length."""
    b, s_new = new_k.shape[0], new_k.shape[1]

    def upd(ck, cv, nk, nv, off):
        ck = jax.lax.dynamic_update_slice(ck, nk, (off, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, nv, (off, 0, 0))
        return ck, cv

    return jax.vmap(upd)(cache_k, cache_v, new_k, new_v, lengths)


def attention_with_cache(
    q: jax.Array,          # [B, S_new, n_h, hd]
    cache_k: jax.Array,    # [B, S_max, n_kv, hd] (already updated)
    cache_v: jax.Array,
    lengths: jax.Array,    # [B] lengths BEFORE this step
    s_new: int,
) -> jax.Array:
    """GQA attention over the cache with causal + validity masking.

    Query position i (0-based within the new chunk) attends cache slots
    [0, lengths + i]. Static shapes: full S_max keys, masked.
    """
    b, _, n_h, hd = q.shape
    s_max = cache_k.shape[1]
    n_kv = cache_k.shape[2]
    groups = n_h // n_kv

    qg = q.reshape(b, s_new, n_kv, groups, hd)
    scores = jnp.einsum("bsngh,btnh->bngst", qg, cache_k).astype(jnp.float32)
    scores = scores / jnp.sqrt(float(hd))

    key_pos = jax.lax.broadcasted_iota(jnp.int32, (s_new, s_max), 1)
    q_end = lengths[:, None, None] + jax.lax.broadcasted_iota(
        jnp.int32, (s_new, s_max), 0
    )[None]
    mask = key_pos[None] <= q_end              # [B, S_new, S_max]
    scores = jnp.where(mask[:, None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bngst,btnh->bsngh", probs, cache_v)
    # v head dim may differ from the qk head dim (MLA)
    return out.reshape(b, s_new, n_h, cache_v.shape[-1])
