"""Validate the decode cache-update protocol hypothesis on TPU.

Hypothesis: carrying KV caches through lax.scan as xs/ys copies every
layer's full [B, n, S, hd] slice per step (read slice + write stacked ys),
so decode cost scales with PADDED S_max even though only one position is
written. A stacked-carry + in-place scatter protocol should be ~flat in
S_max.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_cache_protocol.py
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

L, B, NKV, HD = 4, 8, 16, 128


def run(s_max):
    kq = jnp.zeros((L, B, NKV, s_max, HD), jnp.int8)
    lengths = jnp.full((B,), 512, jnp.int32)
    newv = jnp.ones((B, 1, NKV, HD), jnp.bfloat16)

    def upd_slice(ck, nk, off):
        # per-layer functional update (current protocol's inner op)
        nk = jnp.swapaxes(nk, 0, 1).astype(jnp.int8)    # [n, 1, hd]
        return jax.lax.dynamic_update_slice(ck, nk, (0, off, 0))

    def step_scan_ys(state, cc):
        def body(x, ck):
            ck = jax.vmap(upd_slice)(ck, cc["new"] * x.astype(jnp.bfloat16),
                                     cc["len"])
            # fake "attention read": touch one row so the slice isn't dead
            x = x + ck[:, :, 0, :8].astype(jnp.float32).sum()
            return x, ck
        x, nk = jax.lax.scan(body, state["x"], state["kq"])
        return {"x": x * 1e-9 + 1.0, "kq": nk}

    def step_carry_scatter(state, cc):
        def body(carry, l):
            x, kq = carry
            nk = (cc["new"] * x.astype(jnp.bfloat16)).astype(jnp.int8)
            bidx = jnp.arange(B)
            kq = kq.at[l, bidx[:, None], :,
                       cc["len"][:, None] + jnp.arange(1)[None], :].set(
                jnp.swapaxes(nk, 1, 1))     # [B, 1, n, hd]
            x = x + kq[l, :, :, 0, :8].astype(jnp.float32).sum()
            return (x, kq), None
        (x, kq), _ = jax.lax.scan(body, (state["x"], state["kq"]),
                                  jnp.arange(L))
        return {"x": x * 1e-9 + 1.0, "kq": kq}

    for name, step in (("scan_ys", step_scan_ys),
                       ("carry_scatter", step_carry_scatter)):
        r = bench_step_chained(
            step, {"x": jnp.float32(1.0), "kq": kq},
            consts={"new": newv, "len": lengths},
            n1=4, n2=32, repeats=3, target_s=0.1)
        print(json.dumps({"s_max": s_max, "proto": name,
                          "ms": round(r.median_ms, 3),
                          "std": round(r.std_ms, 3)}), flush=True)


for s in (1024, 4096):
    run(s)
