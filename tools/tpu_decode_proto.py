"""Isolate the decode-attention × cache-carry interaction on TPU.

Variants (L=4 layers, B=8, n_kv=16, hd=128, int8 cache, lengths=512):
  kernel_const   stacked kernel, caches as loop-invariant consts
  kernel_carry   scatter_quant + stacked kernel, caches in the chain carry
  xla_carry      scatter_quant + XLA attention slice, caches in carry

  PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_decode_proto.py
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
from mxmoe_tpu.serving.decode_attention import (decode_attention_stacked, decode_attention_update_stacked)
from mxmoe_tpu.serving.kv_cache import (_quant_vec, attention_with_quant_cache,
                                        scatter_layer_cache_quant)

L, B, NKV, NH, HD = 4, 8, 16, 16, 128


def run(s_max):
    key = jax.random.PRNGKey(0)
    ck = jax.random.normal(key, (L, B, NKV, s_max, HD), jnp.float32)
    ckq, cks = _quant_vec(ck)
    cvq, cvs = ckq, cks
    lengths = jnp.full((B,), 512, jnp.int32)
    q0 = jax.random.normal(key, (B, NH, HD), jnp.bfloat16)
    kv_new = jax.random.normal(key, (B, 1, NKV, HD), jnp.bfloat16)

    def make_kernel_const(alias):
        def layers_kernel_const(state, cc):
            x = state["x"]
            for l in range(L):
                o, _ = decode_attention_stacked(
                    (cc["q"] * (1 + 1e-3 * x)).astype(jnp.bfloat16),
                    cc["ckq"], cc["cks"], cc["cvq"], cc["cvs"],
                    cc["len"], jnp.int32(l), alias=alias)
                x = jnp.tanh(x + o.astype(jnp.float32).sum() * 1e-6)
            return {"x": x}
        return layers_kernel_const

    def layers_kernel_carry_noalias(state, cc):
        x = state["x"]
        ckq, cks, cvq, cvs = state["c"]
        for l in range(L):
            ckq, cks, cvq, cvs = scatter_layer_cache_quant(
                ckq, cks, cvq, cvs, jnp.int32(l),
                (cc["kv"] * (1 + 1e-3 * x)).astype(jnp.bfloat16),
                cc["kv"], cc["len"])
            o, _ = decode_attention_stacked(
                (cc["q"] * (1 + 1e-3 * x)).astype(jnp.bfloat16),
                ckq, cks, cvq, cvs, cc["len"], jnp.int32(l), alias=False)
            x = jnp.tanh(x + o.astype(jnp.float32).sum() * 1e-6)
        return {"x": x, "c": (ckq, cks, cvq, cvs)}

    def layers_update_carry(state, cc):
        x = state["x"]
        ckq, cks, cvq, cvs = state["c"]
        for l in range(L):
            o, (ckq, cks, cvq, cvs) = decode_attention_update_stacked(
                (cc["q"] * (1 + 1e-3 * x)).astype(jnp.bfloat16),
                cc["kv"][:, 0], cc["kv"][:, 0], ckq, cks, cvq, cvs,
                cc["len"], jnp.int32(l))
            x = jnp.tanh(x + o.astype(jnp.float32).sum() * 1e-6)
        return {"x": x, "c": (ckq, cks, cvq, cvs)}

    def layers_kernel_carry(state, cc):
        x = state["x"]
        ckq, cks, cvq, cvs = state["c"]
        for l in range(L):
            ckq, cks, cvq, cvs = scatter_layer_cache_quant(
                ckq, cks, cvq, cvs, jnp.int32(l),
                (cc["kv"] * (1 + 1e-3 * x)).astype(jnp.bfloat16),
                cc["kv"], cc["len"])
            o, (ckq, cks, cvq, cvs) = decode_attention_stacked(
                (cc["q"] * (1 + 1e-3 * x)).astype(jnp.bfloat16),
                ckq, cks, cvq, cvs, cc["len"], jnp.int32(l))
            x = jnp.tanh(x + o.astype(jnp.float32).sum() * 1e-6)
        return {"x": x, "c": (ckq, cks, cvq, cvs)}

    def layers_xla_carry(state, cc):
        x = state["x"]
        ckq, cks, cvq, cvs = state["c"]
        for l in range(L):
            ckq, cks, cvq, cvs = scatter_layer_cache_quant(
                ckq, cks, cvq, cvs, jnp.int32(l),
                (cc["kv"] * (1 + 1e-3 * x)).astype(jnp.bfloat16),
                cc["kv"], cc["len"])
            o = attention_with_quant_cache(
                (cc["q"][:, None] * (1 + 1e-3 * x)).astype(jnp.bfloat16),
                ckq[l], cks[l], cvq[l], cvs[l], cc["len"], 1)
            x = jnp.tanh(x + o.astype(jnp.float32).sum() * 1e-6)
        return {"x": x, "c": (ckq, cks, cvq, cvs)}

    consts = {"q": q0, "kv": kv_new, "len": lengths,
              "ckq": ckq, "cks": cks, "cvq": cvq, "cvs": cvs}
    cases = {
        "kernel_const_alias": ({"x": jnp.float32(0.0)}, make_kernel_const(True)),
        "kernel_const_noalias": ({"x": jnp.float32(0.0)}, make_kernel_const(False)),
        "kernel_carry_noalias": ({"x": jnp.float32(0.0), "c": (ckq, cks, cvq, cvs)},
                                 layers_kernel_carry_noalias),
        "kernel_carry": ({"x": jnp.float32(0.0), "c": (ckq, cks, cvq, cvs)},
                         layers_kernel_carry),
        "update_carry": ({"x": jnp.float32(0.0), "c": (ckq, cks, cvq, cvs)},
                         layers_update_carry),
        "xla_carry": ({"x": jnp.float32(0.0), "c": (ckq, cks, cvq, cvs)},
                      layers_xla_carry),
    }
    only = sys.argv[1:] or None
    for name, (st, step) in cases.items():
        if only and name not in only:
            continue
        r = bench_step_chained(step, st, consts=consts,
                               n1=4, n2=32, repeats=3, target_s=0.1)
        print(json.dumps({"s_max": s_max, "variant": name,
                          "ms": round(r.median_ms, 3),
                          "std": round(r.std_ms, 3)}), flush=True)


for s in (1024, 4096):
    run(s)
