"""Full-model multi-chip forward: GSPMD everywhere + shard_map EP MoE.

The hybrid pattern (scaling-book): dense parts (embedding, attention,
shared expert, lm head) are plain JAX under `jit` — XLA/GSPMD shards them
from the param/data shardings — while the routed-expert block drops into
an explicit `shard_map` with capacity-bucketed all-to-all (bf16 or
int8-dispatch quantized). One mesh axis ("expert") carries both the token
batch and the expert dimension.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..models.configs import MoEConfig
from ..models.layers import (
    attention_block, rms_norm, rope_frequencies, shared_expert_ffn,
)
from .ep import EPConfig, make_ep_moe_fn, make_ep_moe_quant_fn


def make_sharded_forward(
    cfg: MoEConfig,
    mesh,
    quantized: bool = False,
    ep_cfg: EPConfig | None = None,
    gate_freq=None,
):
    """Returns forward(params, tokens) -> logits, jit-able over the mesh.

    quantized=True expects the pytree from
    quant.qparams.quantize_model_experts_uniform/mixed (int8 codes +
    scales) and ships int8 over the all-to-all.

    ``gate_freq``: per-expert access frequencies from a gate trace; when
    given (and ``ep_cfg`` is not) the EP capacity factor is derived from
    the measured routing skew (ep.capacity_factor_from_freq) so skewed
    models don't silently drop assignments at the 2.0-constant default.

    Non-divisible expert counts (E % mesh != 0): pad the params first
    with ``ep.pad_expert_arrays(params["layers"], cfg.num_experts,
    mesh.size)`` — the EP blocks already use ceil(E/n) local experts
    (never-routed phantoms); the serving Engine does this automatically.
    """
    if ep_cfg is None:
        from .ep import capacity_factor_from_freq

        cap = (capacity_factor_from_freq(gate_freq, mesh.size, margin=1.5)
               if gate_freq is not None else 2.0)
        ep_cfg = EPConfig(axis="expert", capacity_factor=max(cap, 2.0))
    if quantized:
        ep_fn = make_ep_moe_quant_fn(cfg, mesh, ep_cfg)
    else:
        ep_fn = make_ep_moe_fn(cfg, mesh, ep_cfg)

    def forward(params, tokens):
        x = jnp.take(params["embed"], tokens, axis=0, mode="clip")
        b, s = tokens.shape
        cos, sin = rope_frequencies(cfg.head_dim, cfg.rope_theta, jnp.arange(s))

        def body(carry, lp):
            x = carry
            h = x + attention_block(
                rms_norm(x, lp["input_norm"], cfg.rms_norm_eps),
                lp, cfg, cos, sin,
            )
            moe_in = rms_norm(h, lp["post_attn_norm"], cfg.rms_norm_eps)
            x2d = moe_in.reshape(-1, cfg.hidden_size)
            if quantized:
                y = ep_fn(
                    x2d, lp["router"],
                    lp["expert_gate_up_q"], lp["expert_gate_up_sc"],
                    lp["expert_down_q"], lp["expert_down_sc"],
                )
            else:
                y = ep_fn(x2d, lp["router"], lp["expert_gate_up"], lp["expert_down"])
            if cfg.shared_expert_intermediate_size > 0:
                y = y + shared_expert_ffn(x2d, lp, cfg)
            return h + y.reshape(b, s, cfg.hidden_size), None

        x, _ = jax.lax.scan(body, x, params["layers"])
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        head = params["embed"].T if cfg.tie_word_embeddings else params["lm_head"]
        return x @ head

    return forward


def make_sp_prefill_forward(cfg: MoEConfig, mesh, axis: str = "seq",
                            impl=None):
    """SEQUENCE-parallel prefill forward: logits(params, tokens) with the
    sequence axis sharded over ``mesh`` and attention running the ring
    kernel (context parallelism for prompts beyond one chip's S budget —
    SURVEY §5 long-context; net-new vs the reference, which has no SP/CP).

    Everything position-local (embedding, norms, router, expert FFN, head)
    is plain GSPMD under the sequence sharding — only attention needs
    cross-shard communication, and that is the ring's P ppermute hops
    (O(S/P · S/P) score memory per shard). Params are replicated; compose
    with EP meshes separately. Requires S % mesh.size == 0.
    """
    import dataclasses as _dc

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models import model as model_mod
    from ..models.layers import MoEImpl
    from .ring_attention import make_ring_attention_fn

    ring = make_ring_attention_fn(mesh, axis)
    impl = _dc.replace(impl or MoEImpl(), attn_backend="ring",
                       ring_attn=ring)

    def forward(params, tokens):
        assert tokens.shape[1] % mesh.size == 0, (
            f"sequence {tokens.shape[1]} not divisible by the "
            f"{mesh.size}-way '{axis}' mesh")
        h = model_mod.forward_hidden(params, tokens, cfg, impl)
        return model_mod.head_logits(params, h, cfg)

    tok_sharding = NamedSharding(mesh, P(None, axis))
    return jax.jit(forward, in_shardings=(None, tok_sharding))


def ep_param_shardings(params: dict, mesh, quantized: bool = False):
    """NamedShardings for the hybrid forward: expert arrays sharded on the
    mesh axis (dim E = axis 1 of the stacked [L, E, ...] layout),
    everything else replicated (DP on tokens). Structure-generic: walks
    the whole pytree so quantized variants (``expert_*_q/_sc``,
    ``lm_head_q``) and future keys shard correctly without editing this
    function."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    (axis,) = mesh.axis_names

    def spec_for(path, arr):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name.endswith("_qcat"):
            # [L, ep, R, N] per-shard packed layout (engine reshard)
            # shards dim 1; the global [L, R, N] layout has no clean
            # expert dim and replicates
            return (P(None, axis, None, None) if arr.ndim == 4
                    else P(*([None] * arr.ndim)))
        if name.startswith("expert_") and arr.ndim >= 2:
            return P(None, axis, *([None] * (arr.ndim - 2)))
        return P(*([None] * arr.ndim))

    return jax.tree_util.tree_map_with_path(
        lambda p, a: NamedSharding(mesh, spec_for(p, a)), params)
