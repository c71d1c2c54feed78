"""Shared-expert dense int8 GEMM: XLA (2-way K-split) vs single-group ws.

Round-3 follow-up to tools/tpu_shared_dense.py: that sweep predates the
weight-stationary kernels, which now run the ROUTED GMMs at ~334 TFLOPS —
above XLA's dense int8 (325 gate_up / 279 split down). If the ws kernel
holds that rate on a single dense group, the headline's last fat residual
(the shared block, 1.88 ms of the 4.04 ms step) shrinks.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_shared_ws.py
"""
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from mxmoe_tpu.bench.timing import bench_step_chained
from mxmoe_tpu.ops import pallas_gmm
from mxmoe_tpu.ops.act_quant import quantize_rows_uniform

SHAPES = [("gate_up", 8192, 2048, 11264), ("down", 8192, 5632, 2048)]


def run(tag, m, k, n):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.uniform(k1, (m, k), jnp.float32, -1, 1).astype(jnp.bfloat16)
    wq = jax.random.randint(k2, (k, n), -127, 128, jnp.int8)
    ssc = jnp.full((1, n), 0.01, jnp.float32)
    flops = 2 * m * k * n
    state0 = {"s": jnp.zeros((1,), jnp.float32)}
    consts = [{"x": x, "w": wq, "sc": ssc, "we": wq[None], "sce": ssc[None]}]

    def xla_step(state, cc):
        saq, sasc = quantize_rows_uniform(cc[0]["x"], 8,
                                          gain=1 + 1e-3 * state["s"][0])
        acc = bench._shared_int8_dot(saq, cc[0]["w"])
        o = (acc.astype(jnp.float32) * sasc * cc[0]["sc"]).astype(jnp.bfloat16)
        return bench._chain_feedback([[o]])

    r = bench_step_chained(xla_step, state0, consts=consts, repeats=3)
    print(json.dumps({"tag": tag, "kernel": "xla_ksplit",
                      "ms": round(r.median_ms, 3),
                      "tflops": round(flops / r.median_ms / 1e9, 1)}),
          flush=True)

    for bm, bn in [(256, 512), (512, 512), (512, 1024), (1024, 512),
                   (2048, 256)]:
        if n % bn:
            continue
        try:
            def ws_step(state, cc, bm=bm, bn=bn):
                saq, sasc = quantize_rows_uniform(
                    cc[0]["x"], 8, gain=1 + 1e-3 * state["s"][0])
                o = pallas_gmm.gmm_w8a8_ws(saq, sasc, cc[0]["we"],
                                           cc[0]["sce"], (m,), bm=bm, bn=bn)
                return bench._chain_feedback([[o]])

            r = bench_step_chained(ws_step, state0, consts=consts, repeats=3)
            print(json.dumps({"tag": tag, "kernel": f"ws_bm{bm}_bn{bn}",
                              "ms": round(r.median_ms, 3),
                              "tflops": round(flops / r.median_ms / 1e9, 1)}),
                  flush=True)
        except Exception as ex:  # VMEM pre-check refusals etc.
            print(json.dumps({"tag": tag, "kernel": f"ws_bm{bm}_bn{bn}",
                              "skip": str(ex)[:100]}), flush=True)


def main():
    for tag, m, k, n in SHAPES:
        run(tag, m, k, n)


if __name__ == "__main__":
    main()
