"""Additive decomposition of one serving DECODE step (round-3 task 1).

Mirrors tools/tpu_onelaunch_decomp.py for the decode regime: the 4-layer
qwen2_moe-width engine step at 32 slots (mixed-packed experts, int8 KV,
int8 head, S_max=1024) decodes at ~11 ms while its weight-traffic bound is
~3 ms — this tool times every component as its own chained step so each
ms is pinned to a named part (reference protocol: test_utils.h:97-191).

Parts (each a lax.scan over the 4 stacked layers where applicable):
  embed_head  token -> embed lookup + final norm + int8 lm_head + argmax
  attn        input-norm + QKV(+bias) + RoPE + fused attn/update + wo + resid
  router      router dot + top-k + dispatch build + gather + combine
  quant       per-row-bits act quant of both GMM inputs ([128,2048],[128,1408])
  gmm         the two one-launch packed mixed GMMs + silu at real group sizes
  shared      quantized shared expert (int8 K-split dots + expert gate)
  full        the real forward_cached decode step + argmax (bench_serving's)

residual = full - sum(parts) = scan-carry + small-op sequencing overhead.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_decode_decomp.py
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mxmoe_jax_cache")

import jax

if os.environ.get("MXMOE_CPU"):   # CPU smoke: JAX_PLATFORMS is ignored
    jax.config.update("jax_platforms", "cpu")   # (plugin wins; CLAUDE.md)

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from functools import partial

from mxmoe_tpu.bench.timing import bench_step_chained
from mxmoe_tpu.models import configs, model as model_mod
from mxmoe_tpu.models.layers import MoEImpl, rms_norm, silu_mul, shared_expert_ffn
from mxmoe_tpu.ops import act_quant, pallas_gmm
from mxmoe_tpu.ops.dispatch import (combine_tokens, gather_tokens,
                                    make_dispatch, route_topk)
from mxmoe_tpu.serving import decode as dec
from mxmoe_tpu.serving.kv_cache import init_quant_kv_cache


def build(args):
    cfg = dataclasses.replace(configs.config_for("qwen2_moe"),
                              num_layers=args.layers)
    params = model_mod.init_params(cfg, jax.random.PRNGKey(0),
                                   dtype=jnp.bfloat16)
    from mxmoe_tpu.quant.qparams import (quantize_lm_head,
                                         quantize_model_experts_mixed)
    from mxmoe_tpu.quant.schemes import (QExpertConfig, QLayerConfig,
                                         QModelConfig, parse_scheme)

    schemes = [parse_scheme("w4a4_g-1_sym"), parse_scheme("w8a8_g-1_sym")]
    experts = {str(e): QExpertConfig(*([schemes[e % 2]] * 3))
               for e in range(cfg.num_experts)}
    if args.shared_quant:
        # production ILP solves cover the shared expert (index E); without
        # this the shared expert serves bf16 = 2x the decode weight bytes
        experts[str(cfg.num_experts)] = QExpertConfig(*([schemes[1]] * 3))
    qmc = QModelConfig(layers={str(l): QLayerConfig(experts=dict(experts))
                               for l in range(cfg.num_layers)})
    params = quantize_model_experts_mixed(params, cfg, qmc, pack_w4=True)
    params = quantize_lm_head(params)
    impl = MoEImpl(kind="ragged", quant="mixed", interpret=args.interpret,
                   decode_attn="fused" if args.interpret else "auto")
    cache = init_quant_kv_cache(cfg, args.slots, args.max_len)
    # advance the cache to a realistic fill level so attention reads real
    # lengths (the fused kernel's trip count follows them)
    fwd = jax.jit(partial(dec.forward_cached, cfg=cfg, impl=impl))
    ptoks = jax.random.randint(jax.random.PRNGKey(1),
                               (args.slots, args.prefill), 0, cfg.vocab_size)
    _, cache = fwd(params, ptoks, cache)
    jax.block_until_ready(cache.lengths)
    return cfg, params, impl, cache, fwd


def layer_slice(params, keys):
    """Sub-pytree of the stacked [L, ...] layer params (consts payload)."""
    return {k: params["layers"][k] for k in keys
            if k in params["layers"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--slots", type=int, default=32)
    ap.add_argument("--max-len", type=int, default=1024)
    ap.add_argument("--prefill", type=int, default=512)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--parts", default="")
    ap.add_argument("--interpret", action="store_true", help="CPU smoke (Pallas interpret, tiny chains)")
    ap.add_argument("--shared-quant", action="store_true",
                    help="quantize the shared expert w8a8 (production ILP "
                    "solves cover index E; default off = the measured "
                    "pre-round-4 engine)")
    args = ap.parse_args()

    cfg, params, impl, cache, fwd = build(args)
    interp = args.interpret
    b = args.slots
    h_dim = cfg.hidden_size
    tk = b * cfg.top_k
    n_mid = cfg.moe_intermediate_size
    lengths = cache.lengths

    key = jax.random.PRNGKey(7)
    x_tok = jax.random.normal(key, (b, 1, h_dim), jnp.bfloat16)
    x2d0 = x_tok.reshape(b, h_dim)

    # one real routing draw for representative group sizes + row bits
    r0 = {k: v[0] for k, v in params["layers"].items()}
    routing0 = route_topk(x2d0 @ r0["router"], cfg.top_k,
                          cfg.norm_topk_prob, cfg.routed_scaling_factor)
    disp0 = make_dispatch(routing0, cfg.num_experts)
    gs0 = jax.device_get(disp0.group_sizes)
    row_expert0 = jnp.repeat(jnp.arange(cfg.num_experts, dtype=jnp.int32),
                             disp0.group_sizes, total_repeat_length=tk)
    print(f"[decomp] live experts {int((gs0 > 0).sum())}/{cfg.num_experts}, "
          f"rows {tk}", flush=True)

    results = {}

    def run(name, step, state0, consts, **kw):
        if args.parts and name not in args.parts.split(","):
            return
        kw.setdefault("repeats", args.repeats)
        kw.setdefault("target_s", 0.1)
        r = bench_step_chained(step, state0, consts=consts, **kw)
        results[name] = r.median_ms
        print(f"{name:11s} {r.median_ms:8.3f} ms/step  "
              f"(band {min(r.samples_ms):.3f}-{max(r.samples_ms):.3f})",
              flush=True)

    # ---- embed + final norm + int8 head + argmax (once per step) ----
    def embed_head(state, cc):
        p = cc["p"]
        x = jnp.take(p["embed"], state["tok"], axis=0, mode="clip")
        x = rms_norm(x, p["final_norm"], cfg.rms_norm_eps)
        logits = model_mod.head_logits(p, x, cfg)
        return {"tok": jnp.argmax(logits[:, -1:, :], axis=-1)
                .astype(jnp.int32)}

    head_consts = {"p": {k: params[k] for k in
                         ("embed", "final_norm", "lm_head_q", "lm_head_sc")}}
    run("embed_head", embed_head,
        {"tok": jnp.zeros((b, 1), jnp.int32)}, head_consts)

    # ---- attention chain over the L layers (fused kernel path) ----
    positions = lengths[:, None]
    cos, sin = dec._rope_tables(cfg, positions)
    attn_keys = ("wq", "wk", "wv", "wo", "bq", "bk", "bv", "input_norm")

    # same fused/xla decision as the real forward (auto picks xla below
    # S_max 2048; forcing fused here once mis-attributed 4.4 ms to attn
    # while the full step used the 1.8 ms xla path)
    use_fused = impl.use_fused_decode(args.max_len)

    def attn_step(state, cc):
        def body(carry, lp):
            x, caches, l = carry
            hh, caches = dec._attention_block_cached_quant(
                rms_norm(x, lp["input_norm"], cfg.rms_norm_eps),
                lp, cfg, cc["cos"], cc["sin"], caches, l, cc["lengths"],
                fused=use_fused, interpret=interp, valid=cc["lengths"] > 0)
            return (x + hh, caches, l + 1), None

        carry = (state["x"], (state["ckq"], state["cks"], state["cvq"],
                              state["cvs"]), jnp.int32(0))
        (x, caches, _), _ = jax.lax.scan(body, carry, cc["lp"])
        return {"x": x * jnp.asarray(0.125, x.dtype), "ckq": caches[0],
                "cks": caches[1], "cvq": caches[2], "cvs": caches[3]}

    run("attn", attn_step,
        {"x": x_tok, "ckq": cache.k_q, "cks": cache.k_sc,
         "cvq": cache.v_q, "cvs": cache.v_sc},
        {"lp": layer_slice(params, attn_keys), "cos": cos, "sin": sin,
         "lengths": lengths})

    # ---- router + dispatch + gather + combine over L layers ----
    def router_step(state, cc):
        def body(x2d, router):
            logits = x2d @ router
            routing = route_topk(logits, cfg.top_k, cfg.norm_topk_prob,
                                 cfg.routed_scaling_factor)
            disp = make_dispatch(routing, cfg.num_experts,
                                 align=impl.dispatch_align)
            xs = gather_tokens(x2d, disp)
            out = combine_tokens(xs, disp, x2d.shape[0])
            return out + x2d * jnp.asarray(0.125, x2d.dtype), None

        x2d, _ = jax.lax.scan(body, state["x2d"], cc["router"])
        return {"x2d": x2d}

    run("router", router_step, {"x2d": x2d0},
        {"router": params["layers"]["router"]})

    # ---- act quant of both GMM inputs over L layers ----
    bits_gu = jnp.take(params["layers"]["act_bits_gateup"][0], row_expert0)
    bits_dn = jnp.take(params["layers"]["act_bits_down"][0], row_expert0)

    def quant_step(state, cc):
        def body(xs, _):
            aq, asc = act_quant.quantize_rows(xs, cc["bits_gu"], interpret=interp)
            mid = jnp.tile(xs[:, :n_mid], (1, 1))
            aq2, asc2 = act_quant.quantize_rows(mid, cc["bits_dn"], interpret=interp)
            nxt = xs + (aq[:, :1] + aq2[:, :1]).astype(xs.dtype) * \
                jnp.asarray(1e-6, xs.dtype)
            return nxt, None

        xs, _ = jax.lax.scan(body, state["xs"], None, length=args.layers)
        return {"xs": xs}

    run("quant", quant_step,
        {"xs": jax.random.normal(key, (tk, h_dim), jnp.bfloat16)},
        {"bits_gu": bits_gu, "bits_dn": bits_dn})

    # ---- the two packed mixed GMMs (+ silu) over L layers ----
    aq0, asc0 = act_quant.quantize_rows(
        jax.random.normal(key, (tk, h_dim), jnp.bfloat16), bits_gu,
        interpret=interp)
    aq0d, asc0d = act_quant.quantize_rows(
        jax.random.normal(key, (tk, n_mid), jnp.bfloat16), bits_dn,
        interpret=interp)

    def bn_for(k_in, n_out):
        return min(n_out, max(512, ((3 * 1024 * 1024) // max(k_in, 1))
                              // 128 * 128))

    # mirror the REAL path (layers.split_expert_stack): big weight arrays
    # ride flattened as loop constants + globalized metadata; only the tiny
    # blk/pf metadata is per-layer
    from mxmoe_tpu.models.layers import split_expert_stack

    xs_small, estack = split_expert_stack(params["layers"])
    gmm_small = ("expert_gate_up_pf", "expert_gate_up_blk",
                 "expert_down_pf", "expert_down_blk")

    def gmm_step(state, cc):
        st = cc["stack"]
        n_layers = args.layers
        e_tot = cfg.num_experts

        def one(aq, asc, prefix, l, k_in, n_out):
            qcat = st[f"{prefix}_qcat"]
            units = qcat.shape[0] // n_layers // (k_in // 2)
            return pallas_gmm.gmm_mixed_packed(
                aq, asc, qcat, st[f"{prefix}_sc"], cc["gs"],
                cc["lp"][f"{prefix}_pf"][l],
                cc["lp"][f"{prefix}_blk"][l] + l * units,
                bn=bn_for(k_in, n_out), out_dtype=jnp.bfloat16,
                interpret=interp, group_base=l * e_tot,
                num_total_groups=n_layers * e_tot)

        def body(carry, l):
            aq, aqd = carry
            hh = one(aq, cc["asc"], "expert_gate_up", l, h_dim, 2 * n_mid)
            hh = silu_mul(hh)
            out = one(aqd, cc["ascd"], "expert_down", l, n_mid, h_dim)
            aq = aq ^ (out[:, : aq.shape[1]] > 0).astype(jnp.int8)
            aqd = aqd ^ (hh[:, : aqd.shape[1]] > 0).astype(jnp.int8)
            return (aq, aqd), None

        carry, _ = jax.lax.scan(body, (state["aq"], state["aqd"]),
                                jnp.arange(args.layers))
        return {"aq": carry[0], "aqd": carry[1]}

    run("gmm", gmm_step, {"aq": aq0, "aqd": aq0d},
        {"lp": {k: params["layers"][k] for k in gmm_small},
         "stack": {k: v for k, v in estack.items() if k != "_num_layers"},
         "asc": asc0, "ascd": asc0d, "gs": disp0.group_sizes})

    # ---- quantized shared expert over L layers ----
    # NB: the serving mixed qconfig covers ROUTED experts only, so the
    # shared expert runs bf16 dense here (2x the int8 weight bytes) —
    # itself a finding this decomposition surfaces
    shared_keys = ("shared_gate_up", "shared_down",
                   "shared_gate_up_q", "shared_gate_up_sc",
                   "shared_down_q", "shared_down_sc", "shared_gate",
                   "act_bits_shared")

    def shared_step(state, cc):
        def body(x2d, lp):
            out = shared_expert_ffn(x2d, lp, cfg)
            return out + x2d * jnp.asarray(0.125, x2d.dtype), None

        x2d, _ = jax.lax.scan(body, state["x2d"], cc["lp"])
        return {"x2d": x2d}

    run("shared", shared_step, {"x2d": x2d0},
        {"lp": layer_slice(params, shared_keys)})

    # ---- the real engine step ----
    def full_step(state, cc):
        logits, c = dec.forward_cached(cc["params"], state["toks"],
                                       state["cache"], cfg, impl)
        nt = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
        return {"toks": nt, "cache": c}

    run("full", full_step,
        {"toks": jnp.zeros((b, 1), jnp.int32), "cache": cache},
        {"params": params}, n1=5, n2=25)

    if len(results) == 7:
        parts = sum(v for k, v in results.items() if k != "full")
        print(f"{'sum(parts)':11s} {parts:8.3f} ms/step")
        print(f"{'residual':11s} {results['full'] - parts:8.3f} ms/step")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
