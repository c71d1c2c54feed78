"""Expert-parallel scaling benchmark: tokens/s vs device count.

  python -m mxmoe_tpu.parallel.scale_bench --devices 1 2 4 8 --tokens 4096

Weak-scaling protocol (BASELINE.json north star: >=80% tokens/s scaling
efficiency): per-device token load is constant; perfect scaling doubles
aggregate tokens/s per doubling. Runs the shard_map EP MoE layer (bf16 and
int8-dispatch quantized) on the first N devices. On the virtual CPU mesh
the numbers are structural (collective graph compiles/executes) rather
than hardware-meaningful.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..bench.timing import bench_step_chained
from ..models import configs, model as model_mod
from .ep import EPConfig, make_ep_moe_fn, make_ep_moe_quant_fn


def bench_ep_scaling(
    cfg,
    device_counts: list[int],
    tokens_per_device: int = 2048,
    quantized: bool = False,
    capacity_factor: float = 2.0,
) -> list[dict]:
    params = model_mod.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    lp = {k: v[0] for k, v in params["layers"].items()}
    rows = []
    base_rate = None
    for nd in device_counts:
        if len(jax.devices()) < nd:
            continue
        mesh = Mesh(np.array(jax.devices()[:nd]), axis_names=("expert",))
        t = tokens_per_device * nd
        x = jax.random.normal(jax.random.PRNGKey(1), (t, cfg.hidden_size), jnp.float32)
        ecfg = EPConfig(capacity_factor=capacity_factor, return_stats=True)
        if quantized:
            from ..quant.qparams import quantize_expert_weights
            from ..quant.schemes import QLinearConfig

            qc = QLinearConfig(w_bits=8, w_gsize=-1, w_sym=True, a_bits=8)
            qg = quantize_expert_weights(lp["expert_gate_up"], qc)
            qd = quantize_expert_weights(lp["expert_down"], qc)
            fn = make_ep_moe_quant_fn(cfg, mesh, ecfg)
            args = (x, lp["router"], qg.q, qg.scale, qd.q, qd.scale)
        else:
            fn = make_ep_moe_fn(cfg, mesh, ecfg)
            args = (x, lp["router"], lp["expert_gate_up"], lp["expert_down"])
        # chained protocol: next step's tokens = this step's MoE output
        # (true data dependence; constant-arg slope is unsound — timing.py)
        def step(state, cc):
            out = fn(state["x"], *cc)[0]
            return {"x": out * jnp.asarray(1.0 / 8, out.dtype)}

        with mesh:
            r = bench_step_chained(step, {"x": x}, consts=args[1:],
                                   n1=3, n2=12, repeats=3)
            _, drops = jax.jit(fn)(*args)       # observability, untimed
        rate = t / (r.median_ms * 1e-3)
        dropped = int(np.asarray(drops).sum())
        if base_rate is None:
            base_rate = rate / nd
        rows.append({
            "devices": nd,
            "tokens": t,
            "ms_per_step": round(r.median_ms, 3),
            "tokens_per_s": round(rate, 1),
            "scaling_efficiency": round(rate / (base_rate * nd), 4),
            "dropped_assignments": dropped,
            "drop_rate": round(dropped / (t * cfg.top_k), 5),
        })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--tokens", type=int, default=2048, help="per device")
    ap.add_argument("--experts", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--quantized", action="store_true")
    args = ap.parse_args()

    import dataclasses

    cfg = dataclasses.replace(
        configs.tiny_qwen2_moe(num_experts=args.experts, num_layers=1),
        hidden_size=args.hidden, moe_intermediate_size=args.hidden // 2,
        shared_expert_intermediate_size=0,
    )
    rows = bench_ep_scaling(cfg, args.devices, args.tokens, args.quantized)
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
