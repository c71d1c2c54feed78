"""Headline benchmark: canonical qwen2_moe layer-10 bs8192 MoE FFN GroupGEMM.

Protocol mirrors the reference bench binary (``test.cu`` bench mode,
SURVEY.md §6): Σ2MNK / median-time TFLOPS on the recorded workload —
routed experts AND shared expert, gate_up AND down — with speedup reported
against the *vendor baseline*: for the reference that is the best CUTLASS
grouped-GEMM fp16 tile; here it is XLA bf16 (`jax.lax.ragged_dot` for the
routed groups + dense `jnp.dot` for the shared expert).

Ours: w8a8 quantized execution (per-token dynamic activation quant on
device + int8×int8 Pallas grouped matmul with s_a·s_b epilogue), the same
class of kernel the reference's headline w8a8/w4a4 numbers use. TFLOPS is
computed on nominal Σ2MNK like the reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "TFLOPS", "vs_baseline": N}
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

from mxmoe_tpu.bench import workloads
from mxmoe_tpu.bench.timing import bench_fn
from mxmoe_tpu.ops import pallas_gmm
from mxmoe_tpu.quant.qparams import quantize_act_per_token


def _build_fp_operands(wl, key, dtype=jnp.bfloat16):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lhs = jax.random.uniform(k1, (wl.m_total, wl.k), jnp.float32, -1, 1).astype(dtype)
    rhs = jax.random.uniform(
        k2, (wl.num_experts, wl.k, wl.n), jnp.float32, -1, 1
    ).astype(dtype)
    group_sizes = jnp.array(wl.group_sizes, jnp.int32)
    shared = None
    if wl.shared_m:
        sh_lhs = jax.random.uniform(k3, (wl.shared_m, wl.shared_k), jnp.float32, -1, 1).astype(dtype)
        sh_rhs = jax.random.uniform(k4, (wl.shared_k, wl.shared_n), jnp.float32, -1, 1).astype(dtype)
        shared = (sh_lhs, sh_rhs)
    return lhs, rhs, group_sizes, shared


def _quantize_weights(operands):
    """Pre-quantize weights (offline step); activations quantize on device."""
    out = []
    for lhs, rhs, gs, shared in operands:
        w = rhs.astype(jnp.float32)
        wsc = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0   # [E,1,N]
        wq = jnp.round(w / wsc).astype(jnp.int8)
        sh = None
        if shared is not None:
            sw = shared[1].astype(jnp.float32)
            ssc = jnp.max(jnp.abs(sw), axis=0, keepdims=True) / 127.0  # [1,N]
            swq = jnp.round(sw / ssc).astype(jnp.int8)
            sh = (shared[0], swq, ssc)
        out.append((lhs, wq, wsc, gs, sh))
    return out


def _baseline_step(operands):
    """XLA bf16: ragged_dot for routed experts + dense dot for shared."""
    outs = []
    for lhs, rhs, group_sizes, shared in operands:
        o = jax.lax.ragged_dot(lhs, rhs, group_sizes, preferred_element_type=jnp.bfloat16)
        outs.append(o)
        if shared is not None:
            outs.append(jnp.dot(shared[0], shared[1], preferred_element_type=jnp.bfloat16))
    return outs


def _w8a8_step(qoperands):
    """Dynamic per-token int8 act quant + int8 MXU grouped matmul."""
    outs = []
    for lhs, wq, wsc, gs, shared in qoperands:
        aq, asc = quantize_act_per_token(lhs, 8)
        outs.append(pallas_gmm.gmm_w8a8(aq, asc, wq, wsc, gs, bm=256, bn=512))
        if shared is not None:
            sl, swq, ssc = shared
            saq, sasc = quantize_act_per_token(sl, 8)
            acc = jnp.dot(saq, swq, preferred_element_type=jnp.int32)
            outs.append((acc.astype(jnp.float32) * sasc * ssc).astype(jnp.bfloat16))
    return outs


def main():
    gate_up, down = workloads.qwen2_moe_l10_bs8192()
    key = jax.random.PRNGKey(42)
    k1, k2 = jax.random.split(key)
    operands = [
        _build_fp_operands(gate_up, k1),
        _build_fp_operands(down, k2),
    ]
    total_flops = gate_up.flops + down.flops

    baseline = jax.jit(_baseline_step)
    rb = bench_fn(baseline, operands)
    base_tflops = rb.tflops(total_flops)

    qoperands = jax.jit(_quantize_weights)(operands)
    jax.block_until_ready(qoperands)
    ours = jax.jit(_w8a8_step)
    ro = bench_fn(ours, qoperands)
    ours_tflops = ro.tflops(total_flops)

    print(json.dumps({
        "metric": "qwen2_moe_l10_bs8192_moe_ffn_w8a8_pallas",
        "value": round(ours_tflops, 3),
        "unit": "TFLOPS",
        "vs_baseline": round(ours_tflops / base_tflops, 4),
    }))


if __name__ == "__main__":
    main()
