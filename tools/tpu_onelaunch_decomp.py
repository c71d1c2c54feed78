"""Decompose the ONE-LAUNCH mixed headline step (bench.py default path).

Parts, each timed as its own chained step (bench/timing protocol):
  quant   per-row-bits act quant only (both workloads)
  routed  act quant + one-launch routed GMM (ws or aligned auto-pipeline)
  shared  act quant + shared-expert int8 XLA dots
  full    the exact bench.py step

Any (full - routed - shared + quant) residual = sequencing overhead.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_onelaunch_decomp.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets cache dir)
import jax
import jax.numpy as jnp

from mxmoe_tpu.bench import workloads
from mxmoe_tpu.bench.timing import bench_step_chained
from mxmoe_tpu.ops import pallas_gmm
from mxmoe_tpu.quant.qparams import (quantize_act_per_row_bits,
                                     quantize_act_per_token)


def main():
    import numpy as np

    gate_up, down = workloads.qwen2_moe_l10_bs8192()
    key = jax.random.PRNGKey(42)
    k1, k2 = jax.random.split(key)
    operands = [bench._build_fp_operands(gate_up, k1),
                bench._build_fp_operands(down, k2)]
    masks = [np.arange(wl.num_experts) % 2 == 0 for wl in (gate_up, down)]
    qmix = bench._quantize_weights_mixed_onelaunch(operands, masks)
    statics = [p["gs"] for p in qmix]
    consts = [{"lhs": p["lhs"], "wq": p["wq"], "wsc": p["wsc"],
               "bits": p["bits"], "sl": p["shared"][0],
               "sw": p["shared"][1], "ssc": p["shared"][2]} for p in qmix]
    state0 = {"s": jnp.zeros((2,), jnp.float32)}
    bm = bench.BENCH_BM
    ws = bench.BENCH_WS

    def _quant(p, s):
        if bench.BENCH_PALLAS_QUANT:
            from mxmoe_tpu.ops.act_quant import quantize_rows

            return quantize_rows(p["lhs"], p["bits"], gain=1 + 1e-3 * s)
        return quantize_act_per_row_bits(
            bench._scaled(p["lhs"], s), p["bits"])

    def quant_i(state, cc, i):
        aq, asc = _quant(cc[i], state["s"][i])
        return [aq, asc]

    def routed_i(state, cc, i):
        p = cc[i]
        aq, asc = _quant(p, state["s"][i])
        if ws:
            o = pallas_gmm.gmm_w8a8_ws(aq, asc, p["wq"], p["wsc"],
                                       statics[i], bm=bm)
        else:
            o = pallas_gmm.gmm_w8a8(
                aq, asc, p["wq"], p["wsc"],
                jnp.asarray(statics[i], jnp.int32), bm=bm,
                bn=p["wq"].shape[-1], static_sizes=statics[i],
                aligned=bench.BENCH_ALIGNED)
        return [o]

    def shared_i(state, cc, i):
        p = cc[i]
        if bench.BENCH_PALLAS_QUANT:
            from mxmoe_tpu.ops.act_quant import quantize_rows_uniform

            saq, sasc = quantize_rows_uniform(
                p["sl"], 8, gain=1 + 1e-3 * state["s"][i])
        else:
            saq, sasc = quantize_act_per_token(
                bench._scaled(p["sl"], state["s"][i]), 8)
        acc = bench._shared_int8_dot(saq, p["sw"])
        return [(acc.astype(jnp.float32) * sasc * p["ssc"])
                .astype(jnp.bfloat16)]

    def make_step(part):
        def step(state, cc):
            return bench._chain_feedback([part(state, cc, i)
                                          for i in range(2)])
        return step

    def full(state, cc):
        return bench._chain_feedback(
            [routed_i(state, cc, i) + shared_i(state, cc, i)
             for i in range(2)])

    for name, part in [("quant", make_step(quant_i)),
                       ("routed", make_step(routed_i)),
                       ("shared", make_step(shared_i)),
                       ("full", full)]:
        r = bench_step_chained(part, state0, consts=consts)
        print(f"{name:8s} {r.median_ms:7.3f} ms/iter  (std {r.std_ms:.3f})",
              flush=True)


if __name__ == "__main__":
    main()
