"""Measure the XLA-vs-fused decode-attention choice per model family and
fit the auto-crossover MODEL (round-4 weak #6: `decode_attn=auto` encoded
a single-point heuristic; MLA and the 57B head layout were unmeasured).

For each attention shape (qwen2_moe GQA 16/16/128, 57B GQA 28/4/128, ds2
MLA 16 heads dk256/dv128) and S_max in {512, 2048, 8192}, measures one
decode step of L=4 stacked layers (B=8, bf16 cache) through BOTH paths:

  fused  decode_attention_update_stacked (scatter+attention one kernel)
  xla    scatter_layer_cache + attention_with_cache (padded-length einsum)

and least-squares fits per-layer ms = a + b * S_max per (config, path).
Writes perf/decode_attn_model.json, consumed by
models.layers.MoEImpl.use_fused_decode — the auto choice then picks the
measured winner at every recorded family instead of one global constant.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_decode_attn_fit.py
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
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mxmoe_tpu.bench.timing import bench_step_chained
from mxmoe_tpu.serving.decode_attention import decode_attention_update_stacked
from mxmoe_tpu.serving.kv_cache import attention_with_cache, scatter_layer_cache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
L = 4
B_GRID = (8, 32)      # the fused kernel's grid dispatches scale with B
                      # (and n_kv): the crossover is batch-dependent —
                      # round-4's B=32 engine showed XLA winning at
                      # S_max=1024 while B=8 fits say fused; the model
                      # records both and auto picks the nearest batch
S_CANDIDATES = (512, 1024, 2048, 4096, 8192)
CACHE_BUDGET = 3.5e9   # bytes for k+v across L layers: the chained
                       # carry holds ~2x (in+out), and the chip has
                       # ~8-16 G usable — B=32 x S=8192 at qwen dims
                       # (8.6 G) OOMed the first batch-grid attempt

# key format matches models.layers._decode_attn_key
CONFIGS = {
    "gqa:nh16:nkv16:hd128": dict(nh=16, nkv=16, dk=128, dv=128, scale=None),
    "gqa:nh28:nkv4:hd128": dict(nh=28, nkv=4, dk=128, dv=128, scale=None),
    # ds2 MLA: per-head cache (nkv = nh), qk dim padded to 256 lanes,
    # softmax scale on the TRUE qk dim (192), not the padded one
    "mla:nh16:dk256:dv128": dict(nh=16, nkv=16, dk=256, dv=128,
                                 scale=1.0 / 192.0 ** 0.5),
}


def s_grid(c, B):
    bytes_per_s = L * B * c["nkv"] * (c["dk"] + c["dv"]) * 2
    grid = [s for s in S_CANDIDATES if s * bytes_per_s <= CACHE_BUDGET]
    return tuple(grid[-4:]) if len(grid) >= 3 else tuple(S_CANDIDATES[:3])


def measure(c, s_max, B):
    key = jax.random.PRNGKey(0)
    nh, nkv, dk, dv = c["nh"], c["nkv"], c["dk"], c["dv"]
    ck = jax.random.normal(key, (L, B, nkv, s_max, dk), jnp.bfloat16)
    cv = jax.random.normal(key, (L, B, nkv, s_max, dv), jnp.bfloat16)
    lengths = jnp.full((B,), s_max // 2, jnp.int32)
    q0 = jax.random.normal(key, (B, nh, dk), jnp.bfloat16)
    k0 = jax.random.normal(key, (B, nkv, dk), jnp.bfloat16)
    v0 = jax.random.normal(key, (B, nkv, dv), jnp.bfloat16)
    consts = {"q": q0, "k": k0, "v": v0, "len": lengths}
    kw = {} if c["scale"] is None else {"scale": c["scale"]}

    def fused_step(state, cc):
        x = state["x"]
        ck_, cv_ = state["c"]
        for l in range(L):
            o, (ck_, cv_) = decode_attention_update_stacked(
                (cc["q"] * (1 + 1e-3 * x)).astype(jnp.bfloat16),
                cc["k"], cc["v"], ck_, None, cv_, None,
                cc["len"], jnp.int32(l), **kw)
            x = jnp.tanh(x + o.astype(jnp.float32).sum() * 1e-6)
        return {"x": x, "c": (ck_, cv_)}

    def xla_step(state, cc):
        x = state["x"]
        ck_, cv_ = state["c"]
        for l in range(L):
            ck_, cv_ = scatter_layer_cache(
                ck_, cv_, jnp.int32(l),
                (cc["k"][:, None] * (1 + 1e-3 * x)).astype(jnp.bfloat16),
                cc["v"][:, None], cc["len"])
            o = attention_with_cache(
                (cc["q"][:, None] * (1 + 1e-3 * x)).astype(jnp.bfloat16),
                ck_[l], cv_[l], cc["len"], 1, **kw)
            x = jnp.tanh(x + o.astype(jnp.float32).sum() * 1e-6)
        return {"x": x, "c": (ck_, cv_)}

    out = {}
    for name, step in (("fused", fused_step), ("xla", xla_step)):
        st = {"x": jnp.float32(0.0), "c": (ck, cv)}
        r = float(np.median([bench_step_chained(
            step, st, consts=consts, n1=4, n2=32, repeats=3,
            target_s=0.1).median_ms for _ in range(2)]))
        out[name] = r / L      # per-layer ms
        print(f"  {name:5s} s_max={s_max:5d}: {r / L:.4f} ms/layer",
              flush=True)
    return out


def main():
    model = {}
    for ckey, c in CONFIGS.items():
        model[ckey] = {}
        for B in B_GRID:
            grid = s_grid(c, B)
            print(f"== {ckey} @ B={B} (S grid {grid})", flush=True)
            rows = {s: measure(c, s, B) for s in grid}
            entry = {"s_grid": list(grid),
                     "measured": {str(s): rows[s] for s in grid}}
            xs = np.array(grid, np.float64)
            for name in ("fused", "xla"):
                ys = np.array([rows[s][name] for s in grid])
                b_ = float(((xs - xs.mean()) * (ys - ys.mean())).sum()
                           / ((xs - xs.mean()) ** 2).sum())
                a_ = float(ys.mean() - b_ * xs.mean())
                entry[name] = [round(a_, 5), round(b_, 9)]
            ax, bx = entry["xla"]
            af, bf = entry["fused"]
            entry["crossover"] = (round((af - ax) / (bx - bf), 1)
                                  if bx > bf else None)
            print(f"  fit: xla {entry['xla']}  fused {entry['fused']}  "
                  f"crossover {entry['crossover']}", flush=True)
            model[ckey][f"b{B}"] = entry
    out = os.path.join(REPO, "perf", "decode_attn_model.json")
    with open(out, "w") as f:
        json.dump(model, f, indent=2)
    print(f"-> {out}", flush=True)


if __name__ == "__main__":
    main()
