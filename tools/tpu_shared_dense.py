"""Down-shared dense int8 GEMM (8192 x 5632 x 2048): XLA vs Pallas tiles.

XLA's int8 dot is fine at K=2048,N=11264 (339 TFLOPS) but collapses at
K=5632,N=2048 (120 TFLOPS). Try the grouped kernel with ONE group and
large k-blocked tiles.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_shared_dense.py
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

from mxmoe_tpu.bench.timing import bench_step_chained
from mxmoe_tpu.ops import pallas_gmm
from mxmoe_tpu.quant.qparams import quantize_act_per_token

M, K, N = 8192, 5632, 2048


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.uniform(k1, (M, K), jnp.float32, -1, 1).astype(jnp.bfloat16)
    wq = jax.random.randint(k2, (K, N), -127, 128, jnp.int8)
    ssc = jnp.full((1, N), 0.01, jnp.float32)
    flops = 2 * M * K * N

    def xla_step(state, cc):
        aq, asc = quantize_act_per_token(state["x"], 8)
        acc = jnp.dot(aq, cc["w"], preferred_element_type=jnp.int32)
        o = (acc.astype(jnp.float32) * asc * cc["sc"]).astype(jnp.bfloat16)
        o = jax.lax.optimization_barrier(o)
        s = jnp.tanh(jnp.sum(o[0, :8].astype(jnp.float32)) * 1e-3)
        return {"x": state["x"] * (1 + 1e-3 * s).astype(state["x"].dtype)}

    r = bench_step_chained(xla_step, {"x": x}, consts={"w": wq, "sc": ssc},
                           n1=4, n2=32, repeats=3, target_s=0.15)
    print(json.dumps({"kernel": "xla_int8_dot", "ms": round(r.median_ms, 3),
                      "tflops": round(flops / r.median_ms / 1e9, 1)}),
          flush=True)

    def xla_splitk_step(state, cc, parts=2):
        aq, asc = quantize_act_per_token(state["x"], 8)
        kpart = K // parts
        acc = sum(
            jnp.dot(aq[:, i * kpart:(i + 1) * kpart],
                    cc["w"][i * kpart:(i + 1) * kpart],
                    preferred_element_type=jnp.int32)
            for i in range(parts))
        o = (acc.astype(jnp.float32) * asc * cc["sc"]).astype(jnp.bfloat16)
        o = jax.lax.optimization_barrier(o)
        s = jnp.tanh(jnp.sum(o[0, :8].astype(jnp.float32)) * 1e-3)
        return {"x": state["x"] * (1 + 1e-3 * s).astype(state["x"].dtype)}

    for parts in (2, 4):
        r = bench_step_chained(
            lambda st, cc, _p=parts: xla_splitk_step(st, cc, _p),
            {"x": x}, consts={"w": wq, "sc": ssc},
            n1=4, n2=32, repeats=3, target_s=0.15)
        print(json.dumps({"kernel": f"xla_splitk{parts}",
                          "ms": round(r.median_ms, 3),
                          "tflops": round(flops / r.median_ms / 1e9, 1)}),
              flush=True)

    def xla_bf16w_step(state, cc):
        # bf16 weights (no act quant): is int8 even winning at this shape?
        o = jnp.dot(state["x"], cc["wb"],
                    preferred_element_type=jnp.bfloat16)
        o = jax.lax.optimization_barrier(o)
        s = jnp.tanh(jnp.sum(o[0, :8].astype(jnp.float32)) * 1e-3)
        return {"x": state["x"] * (1 + 1e-3 * s).astype(state["x"].dtype)}

    r = bench_step_chained(xla_bf16w_step, {"x": x},
                           consts={"wb": wq.astype(jnp.bfloat16)},
                           n1=4, n2=32, repeats=3, target_s=0.15)
    print(json.dumps({"kernel": "xla_bf16_dot", "ms": round(r.median_ms, 3),
                      "tflops": round(flops / r.median_ms / 1e9, 1)}),
          flush=True)

    for bm, bn, bk in ((1024, 1024, 512), (512, 2048, 512), (1024, 2048, 512),
                       (2048, 1024, 512), (1024, 1024, 1408)):
        def p_step(state, cc, _bm=bm, _bn=bn, _bk=bk):
            aq, asc = quantize_act_per_token(state["x"], 8)
            o = pallas_gmm.gmm_w8a8(
                aq, asc, cc["w"][None], cc["sc"][None],
                jnp.asarray([M], jnp.int32), bm=_bm, bn=_bn, bk=_bk,
                static_sizes=(M,), aligned=True)
            o = jax.lax.optimization_barrier(o)
            s = jnp.tanh(jnp.sum(o[0, :8].astype(jnp.float32)) * 1e-3)
            return {"x": state["x"] * (1 + 1e-3 * s).astype(state["x"].dtype)}

        try:
            r = bench_step_chained(p_step, {"x": x},
                                   consts={"w": wq, "sc": ssc},
                                   n1=3, n2=12, repeats=3)
            print(json.dumps({"kernel": f"pallas_bm{bm}_bn{bn}_bk{bk}",
                              "ms": round(r.median_ms, 3),
                              "tflops": round(flops / r.median_ms / 1e9, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"kernel": f"pallas_bm{bm}_bn{bn}_bk{bk}",
                              "skip": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
