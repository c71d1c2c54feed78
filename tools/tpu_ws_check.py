"""Weight-stationary GMM: TPU correctness + timing vs the pipelined kernel.

Real headline shapes (qwen2_moe l10 bs8192 routed GMMs, aligned layout).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_ws_check.py
"""
import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mxmoe_tpu.bench import workloads
from mxmoe_tpu.bench.timing import bench_step_chained
from mxmoe_tpu.ops import pallas_gmm
from mxmoe_tpu.quant.packing import pack_int4_halves


def build(wl, bm):
    sizes = tuple(int(((s + bm - 1) // bm) * bm) for s in wl.group_sizes)
    m = sum(sizes)
    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    aq = jax.random.randint(k1, (m, wl.k), -127, 128, jnp.int8)
    asc = jax.random.uniform(k2, (m, 1), jnp.float32, 0.005, 0.02)
    wq = jax.random.randint(k1, (wl.num_experts, wl.k, wl.n), -127, 128,
                            jnp.int8)
    wsc = jax.random.uniform(k2, (wl.num_experts, 1, wl.n), jnp.float32,
                             0.005, 0.02)
    q4p = pack_int4_halves(jnp.clip(wq, -8, 7))
    return dict(aq=aq, asc=asc, wq=wq, wsc=wsc, q4p=q4p, sizes=sizes, m=m)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bm", type=int, default=128)
    ap.add_argument("--which", default="gate_up", choices=["gate_up", "down"])
    ap.add_argument("--kernels", nargs="+", default=["w8a8_ws", "w4a8p_ws"])
    ap.add_argument("--no-check", action="store_true")
    args = ap.parse_args()
    gu, dn = workloads.qwen2_moe_l10_bs8192()
    wl = gu if args.which == "gate_up" else dn
    bm = args.bm
    c = build(wl, bm)
    gs = jnp.asarray(c["sizes"], jnp.int32)
    flops = 2 * wl.m_total * wl.k * wl.n   # nominal on real rows

    launchers = {
        "w8a8_ws": lambda aq, cc: pallas_gmm.gmm_w8a8_ws(
            aq, cc["asc"], cc["wq"], cc["wsc"], c["sizes"], bm=bm),
        "w4a8p_ws": lambda aq, cc: pallas_gmm.gmm_w4a8_packed_ws(
            aq, cc["asc"], cc["q4p"], cc["wsc"], c["sizes"], bm=bm),
        "w8a8_pipelined": lambda aq, cc: pallas_gmm.gmm_w8a8(
            aq, cc["asc"], cc["wq"], cc["wsc"], cc["gs"], bm=bm,
            bn=wl.n, static_sizes=c["sizes"], aligned=True),
    }
    consts = {"asc": c["asc"], "wq": c["wq"], "wsc": c["wsc"],
              "q4p": c["q4p"], "gs": gs}

    if not args.no_check:
        ref = jax.jit(lambda aq, cc: launchers["w8a8_pipelined"](aq, cc))(
            c["aq"], consts)
        got = jax.jit(lambda aq, cc: launchers["w8a8_ws"](aq, cc))(
            c["aq"], consts)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(json.dumps({"check": "ws_vs_pipelined", "max_abs": err}),
              flush=True)

    for name in args.kernels + ["w8a8_pipelined"]:
        fn = launchers[name]

        def step(state, cc, _fn=fn):
            out = _fn(state["aq"], cc)
            na = state["aq"] ^ (out[:, :wl.k] > 0).astype(jnp.int8)
            return {"aq": na}

        r = bench_step_chained(step, {"aq": c["aq"]}, consts=consts,
                               n1=3, n2=12, repeats=3)
        print(json.dumps({
            "kernel": name, "which": wl.name, "bm": bm,
            "ms": round(r.median_ms, 3), "std": round(r.std_ms, 3),
            "tflops": round(flops / r.median_ms / 1e9, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
