"""Quantized expert-weight pytrees and real-quantized MoE execution.

This is the *execute* stage of the pipeline (SURVEY.md §0 step 5): weights
are stored as integer codes + scales and the expert FFN runs through the
quantized Pallas grouped matmuls — unlike the reference, whose Python side
only ever fake-quantizes (``quant.py:319-359``) and benches kernels on
synthetic buffers. Here the quantized model IS the serving path.

Uniform-scheme layout (per layer, stacked leading L axis like the bf16
pytree):

  expert_gate_up_q   [L, E, H, 2N] int8 (int4 codes stored in int8)
  expert_gate_up_sc  [L, E, H//g, 2N] f32     (g=-1 -> H//g == 1)
  expert_gate_up_zp  [L, E, H//g, 2N] f32     (absent when symmetric)
  expert_down_*      likewise with [L, E, N, H]

Mixed schemes use per-layer scheme buckets (expert permutation): see
:mod:`mxmoe_tpu.quant.mixed`.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .schemes import QLinearConfig
from .packing import quantize_weight_kn
from .rtn import quantize as rtn_quantize


class QuantLinearParams(NamedTuple):
    """One stacked quantized linear family ([..., K, N] codes)."""

    q: jax.Array        # [..., K, N] int8 codes (signed storage)
    scale: jax.Array    # [..., K//g, N] f32
    zp: jax.Array       # [..., K//g, N] f32 (zeros when symmetric)


@dataclasses.dataclass(frozen=True)
class UniformQuantConfig:
    """One scheme applied to every routed expert linear in the model."""

    cfg: QLinearConfig

    @property
    def weight_dtype(self):
        return jnp.int8


def quantize_expert_weights(
    w: jax.Array,            # [L, E, K, N] float
    cfg: QLinearConfig,
) -> QuantLinearParams:
    """RTN-quantize stacked expert weights (grouping along K per column)."""
    packed = quantize_weight_kn(w, cfg)
    return QuantLinearParams(
        q=packed.values.astype(jnp.int8),
        scale=packed.scale,
        zp=packed.zp,
    )


def quantize_act_per_token(x: jax.Array, bits: int = 8) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-token activation quantization -> (int8 codes, [M,1] scale).

    The dynamic-quant step the reference fuses into dispatch
    (``ref_bind.cu:434-592`` intent); XLA fuses this into the surrounding
    gather on TPU.
    """
    upper = float((1 << (bits - 1)) - 1)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / upper
    q = jnp.round(x.astype(jnp.float32) / scale)
    return q.astype(jnp.int8), scale


def quantize_act_rtn(x: jax.Array, cfg: QLinearConfig) -> tuple[jax.Array, jax.Array]:
    """Generic per-token path honoring a_bits from the scheme (sym)."""
    assert cfg.a_sym or cfg.a_bits >= 16, "asymmetric activations not yet wired"
    return quantize_act_per_token(x, int(cfg.a_bits))


def quantize_model_experts_uniform(params: dict, cfg: QLinearConfig) -> dict:
    """bf16 param pytree -> pytree where routed expert weights are quantized.

    Returns a new pytree: ``layers['expert_gate_up']``/``['expert_down']``
    replaced by QuantLinearParams fields (suffixes _q/_sc/_zp).
    """
    layers = dict(params["layers"])
    for name in ("expert_gate_up", "expert_down"):
        qp = quantize_expert_weights(layers[name], cfg)
        del layers[name]
        layers[f"{name}_q"] = qp.q
        layers[f"{name}_sc"] = qp.scale
        layers[f"{name}_zp"] = qp.zp
    out = dict(params)
    out["layers"] = layers
    return out
