"""Headline benchmark: canonical qwen2_moe layer-10 bs8192 MoE FFN GroupGEMM.

Protocol mirrors the reference bench binary (``test.cu`` bench mode,
SURVEY.md §6): Σ2MNK / median-time TFLOPS on the recorded workload, with
speedup reported against the best *vendor baseline* — for the reference
that is CUTLASS grouped GEMM fp16; here it is XLA's native grouped matmul
(`jax.lax.ragged_dot`) in bf16.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "TFLOPS", "vs_baseline": N}
where vs_baseline = our-best-kernel TFLOPS / XLA-bf16-baseline TFLOPS.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from mxmoe_tpu.bench import workloads
from mxmoe_tpu.bench.timing import bench_fn


def _build_operands(wl, key, dtype=jnp.bfloat16):
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


def _baseline_step(operands):
    """XLA bf16: ragged_dot for routed experts + dense dot for shared."""
    outs = []
    for lhs, rhs, group_sizes, shared in operands:
        o = jax.lax.ragged_dot(lhs, rhs, group_sizes, preferred_element_type=jnp.bfloat16)
        outs.append(o)
        if shared is not None:
            outs.append(jnp.dot(shared[0], shared[1], preferred_element_type=jnp.bfloat16))
    return outs


def _mxmoe_step_factory():
    """Best available mxmoe kernel path; falls back to the XLA baseline."""
    try:
        from mxmoe_tpu.ops import pallas_gmm  # noqa: F401

        def step(operands):
            outs = []
            for lhs, rhs, group_sizes, shared in operands:
                o = pallas_gmm.gmm(lhs, rhs, group_sizes)
                outs.append(o)
                if shared is not None:
                    outs.append(jnp.dot(shared[0], shared[1], preferred_element_type=jnp.bfloat16))
            return outs

        return step, "pallas-bf16"
    except ImportError:
        return _baseline_step, "xla-bf16"


def main():
    gate_up, down = workloads.qwen2_moe_l10_bs8192()
    key = jax.random.PRNGKey(42)
    k1, k2 = jax.random.split(key)
    operands = [
        _build_operands(gate_up, k1),
        _build_operands(down, k2),
    ]
    total_flops = gate_up.flops + down.flops

    baseline = jax.jit(_baseline_step)
    rb = bench_fn(baseline, operands)
    base_tflops = rb.tflops(total_flops)

    step, kernel_name = _mxmoe_step_factory()
    if step is _baseline_step:
        ours_tflops = base_tflops
    else:
        ours = jax.jit(step)
        ro = bench_fn(ours, operands)
        ours_tflops = ro.tflops(total_flops)

    print(json.dumps({
        "metric": f"qwen2_moe_l10_bs8192_groupgemm_{kernel_name}",
        "value": round(ours_tflops, 3),
        "unit": "TFLOPS",
        "vs_baseline": round(ours_tflops / base_tflops, 4),
    }))


if __name__ == "__main__":
    main()
