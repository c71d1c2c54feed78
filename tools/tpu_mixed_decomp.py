"""Decompose the mixed headline step: routed-only vs shared-only vs full.

Reuses bench.py's operand builders and step structure so the parts sum to
the whole (any residual = launch/sequencing overhead).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_mixed_decomp.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets cache dir)
import jax
import jax.numpy as jnp

from mxmoe_tpu.bench import workloads
from mxmoe_tpu.bench.timing import bench_step_chained
from mxmoe_tpu.ops import pallas_gmm
from mxmoe_tpu.quant.qparams import quantize_act_per_token


def main():
    import numpy as np

    gate_up, down = workloads.qwen2_moe_l10_bs8192()
    key = jax.random.PRNGKey(42)
    k1, k2 = jax.random.split(key)
    operands = [bench._build_fp_operands(gate_up, k1),
                bench._build_fp_operands(down, k2)]
    masks = [np.arange(wl.num_experts) % 2 == 0 for wl in (gate_up, down)]
    qmix = bench._quantize_weights_mixed(operands, masks)
    statics = [(p["m4"], p["gs4"], p["gs8"]) for p in qmix]
    consts = [{"lhs": p["lhs"], "q4p": p["q4p"], "sc4": p["sc4"],
               "q8": p["q8"], "sc8": p["sc8"], "sl": p["shared"][0],
               "sw": p["shared"][1], "ssc": p["shared"][2]} for p in qmix]
    state0 = {"s": jnp.zeros((2,), jnp.float32)}
    bm = bench.BENCH_BM

    def routed_parts(state, cc, i, ws=True):
        m4, gs4, gs8 = statics[i]
        p = cc[i]
        lhs = bench._scaled(p["lhs"], state["s"][i])
        l4, l8 = lhs[:m4], lhs[m4:]
        aq4, asc4 = quantize_act_per_token(l4, 4)
        aq8, asc8 = quantize_act_per_token(l8, 8)
        if ws:
            o4 = pallas_gmm.gmm_w4a8_packed_ws(aq4, asc4, p["q4p"], p["sc4"],
                                               gs4, bm=bm)
            o8 = pallas_gmm.gmm_w8a8_ws(aq8, asc8, p["q8"], p["sc8"], gs8,
                                        bm=bm)
        else:
            o4 = pallas_gmm.gmm_w4a8_packed(
                aq4, asc4, p["q4p"], p["sc4"], jnp.asarray(gs4, jnp.int32),
                bm=bm, bn=p["q8"].shape[-1], static_sizes=gs4, aligned=True)
            o8 = pallas_gmm.gmm_w8a8(
                aq8, asc8, p["q8"], p["sc8"], jnp.asarray(gs8, jnp.int32),
                bm=bm, bn=p["q8"].shape[-1], static_sizes=gs8, aligned=True)
        return [o4, o8]

    def shared_parts(state, cc, i):
        p = cc[i]
        saq, sasc = quantize_act_per_token(
            bench._scaled(p["sl"], state["s"][i]), 8)
        acc = jnp.dot(saq, p["sw"], preferred_element_type=jnp.int32)
        return [(acc.astype(jnp.float32) * sasc * p["ssc"])
                .astype(jnp.bfloat16)]

    variants = {
        "routed_ws": lambda st, cc: bench._chain_feedback(
            [routed_parts(st, cc, i) for i in range(2)]),
        "routed_sched": lambda st, cc: bench._chain_feedback(
            [routed_parts(st, cc, i, ws=False) for i in range(2)]),
        "shared_only": lambda st, cc: bench._chain_feedback(
            [shared_parts(st, cc, i) for i in range(2)]),
        "full_ws": lambda st, cc: bench._chain_feedback(
            [routed_parts(st, cc, i) + shared_parts(st, cc, i)
             for i in range(2)]),
        "full_sched": lambda st, cc: bench._chain_feedback(
            [routed_parts(st, cc, i, ws=False) + shared_parts(st, cc, i)
             for i in range(2)]),
    }
    only = sys.argv[1:] or None
    for name, step in variants.items():
        if only and name not in only:
            continue
        r = bench_step_chained(step, state0, consts=consts,
                               n1=4, n2=32, repeats=5, target_s=0.25)
        print(json.dumps({"variant": name, "ms": round(r.median_ms, 3),
                          "std": round(r.std_ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
