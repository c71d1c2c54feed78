"""Trusted-protocol (chained) tile sweep on the headline routed GMMs.

Re-measures the routed gate_up / down GroupGEMM kernels with
bench_step_chained (the constant-arg protocol is unsound through the
tunnel — timing.py), over (kernel, bm, bn, k-block, aligned) configs,
plus the act-quant pass and the shared-expert XLA dots, to rebuild the
headline roofline decomposition in PERF.md.

  PYTHONPATH=/root/.axon_site python tools/tpu_gmm_sweep.py [--which gate_up]
"""
import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mxmoe_jax_cache")
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
from mxmoe_tpu.quant.qparams import quantize_act_per_token


def aligned_layout(sizes, bm):
    sizes = np.asarray(sizes)
    padded = ((sizes + bm - 1) // bm) * bm
    return tuple(int(x) for x in padded)


def build(wl, bm, aligned):
    key = jax.random.PRNGKey(42)
    k1, k2 = jax.random.split(key)
    sizes = aligned_layout(wl.group_sizes, bm) if aligned else tuple(wl.group_sizes)
    m = int(sum(sizes))
    lhs = jax.random.uniform(k1, (m, wl.k), jnp.float32, -1, 1)
    w = jax.random.uniform(k2, (wl.num_experts, wl.k, wl.n), jnp.float32, -1, 1)
    wsc = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0
    wq = jnp.round(w / wsc).astype(jnp.int8)
    aq, asc = quantize_act_per_token(lhs, 8)
    q4 = jnp.clip(wq, -8, 7)
    return dict(aq=aq, asc=asc, wq=wq, wsc=wsc, q4p=pack_int4_halves(q4),
                sizes=sizes, m=m)


def sweep_kernel(name, wl, bm, bn, bk, aligned, flops):
    try:
        ops = build(wl, bm, aligned)
        sizes = ops["sizes"]
        gs = jnp.asarray(sizes, jnp.int32)
        if name == "w8a8":
            def launch(aq, cc):
                return pallas_gmm.gmm_w8a8(
                    aq, cc["asc"], cc["wq"], cc["wsc"], cc["gs"], bm=bm,
                    bn=bn, bk=bk, static_sizes=sizes, aligned=aligned)
            consts = {"asc": ops["asc"], "wq": ops["wq"],
                      "wsc": ops["wsc"], "gs": gs}
        else:
            def launch(aq, cc):
                return pallas_gmm.gmm_w4a8_packed(
                    aq, cc["asc"], cc["q4p"], cc["wsc"], cc["gs"], bm=bm,
                    bn=bn, static_sizes=sizes, aligned=aligned)
            consts = {"asc": ops["asc"], "q4p": ops["q4p"],
                      "wsc": ops["wsc"], "gs": gs}

        k_in = wl.k

        def step(state, cc):
            out = launch(state["aq"], cc)
            na = state["aq"] ^ (out[:, :k_in] > 0).astype(jnp.int8)
            return {"aq": na}

        r = bench_step_chained(step, {"aq": ops["aq"]}, consts=consts,
                               n1=3, n2=12, repeats=3)
        print(json.dumps({
            "kernel": name, "which": wl.name, "bm": bm, "bn": bn,
            "bk": bk if isinstance(bk, int) else 0, "aligned": aligned,
            "ms": round(r.median_ms, 3), "std": round(r.std_ms, 3),
            "tflops": round(flops / r.median_ms / 1e9, 1),
        }), flush=True)
    except Exception as e:
        print(json.dumps({"kernel": name, "bm": bm, "bn": bn,
                          "skip": str(e)[:100]}), flush=True)


def aux_measure(wl_gu, wl_dn):
    """Act-quant pass + shared-expert XLA int8 dots, chained."""
    m = wl_gu.m_total
    x = jax.random.uniform(jax.random.PRNGKey(0), (m, wl_gu.k),
                           jnp.float32, -1, 1).astype(jnp.bfloat16)

    def qstep(state):
        aq, asc = quantize_act_per_token(state["x"], 8)
        return {"x": (aq.astype(jnp.bfloat16) * asc).astype(jnp.bfloat16)}

    r = bench_step_chained(qstep, {"x": x}, n1=3, n2=12, repeats=3)
    print(json.dumps({"aux": f"act_quant+dequant m{m} k{wl_gu.k}",
                      "ms": round(r.median_ms, 3)}), flush=True)

    for tag, (sm, sk, sn) in (("shared_gu", (wl_gu.shared_m, wl_gu.shared_k,
                                             wl_gu.shared_n)),
                              ("shared_dn", (wl_dn.shared_m, wl_dn.shared_k,
                                             wl_dn.shared_n))):
        sl = jax.random.uniform(jax.random.PRNGKey(1), (sm, sk),
                                jnp.float32, -1, 1).astype(jnp.bfloat16)
        wq8 = jax.random.randint(jax.random.PRNGKey(2), (sk, sn), -127, 128,
                                 jnp.int8)
        ssc = jnp.ones((1, sn), jnp.float32) * 0.01

        def sstep(state, cc):
            saq, sasc = quantize_act_per_token(state["x"], 8)
            acc = jnp.dot(saq, cc["w"], preferred_element_type=jnp.int32)
            o = (acc.astype(jnp.float32) * sasc * cc["sc"]).astype(jnp.bfloat16)
            reps = -(-sk // sn)
            nx = (jnp.tile(o, (1, reps))[:, :sk] if reps > 1 else o[:, :sk])
            return {"x": nx * jnp.bfloat16(1.0 / 64)}

        r = bench_step_chained(sstep, {"x": sl},
                               consts={"w": wq8, "sc": ssc},
                               n1=3, n2=12, repeats=3)
        fl = 2 * sm * sk * sn
        print(json.dumps({"aux": f"{tag} quant+int8dot {sm}x{sk}x{sn}",
                          "ms": round(r.median_ms, 3),
                          "tflops": round(fl / r.median_ms / 1e9, 1)}),
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="gate_up", choices=["gate_up", "down", "aux"])
    ap.add_argument("--kernels", nargs="+", default=["w8a8", "w4a8p"])
    args = ap.parse_args()
    gu, dn = workloads.qwen2_moe_l10_bs8192()

    if args.which == "aux":
        aux_measure(gu, dn)
        return

    wl = gu if args.which == "gate_up" else dn
    flops = 2 * wl.m_total * wl.k * wl.n   # nominal on real rows

    if args.which == "gate_up":            # K=2048 N=2816
        cfgs = [(256, 2816, None), (128, 2816, None), (256, 1408, None),
                (512, 1408, None), (512, 1408, 512), (1024, 1408, 512),
                (256, 256, None)]
    else:                                  # K=1408 N=2048
        cfgs = [(256, 2048, None), (512, 2048, None), (256, 1024, None),
                (512, 1024, None), (1024, 1024, None)]

    for kern in args.kernels:
        for bm, bn, bk in cfgs:
            if kern == "w4a8p" and bk is not None:
                continue                   # packed kernel is full-K only
            sweep_kernel(kern, wl, bm, bn, bk, True, flops)


if __name__ == "__main__":
    main()
