"""Long-differential decode A/B: int8-stored vs packed mixed one-launch."""
import os, sys, json, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import bench
from mxmoe_tpu.bench.timing import _force
from mxmoe_tpu.ops import pallas_gmm
from mxmoe_tpu.ops.act_quant import quantize_rows
from mxmoe_tpu.quant.packing import build_ragged_mixed

e, kk, nn, rows = 60, 2048, 1408, 32
kw1, kw2 = jax.random.split(jax.random.PRNGKey(7))
pf = np.arange(e) % 2 == 0
wq = np.array(jax.random.randint(kw1, (e, kk, nn), -127, 128, jnp.int8))
wq[pf] = np.clip(wq[pf], -7, 7)
wq = jnp.asarray(wq)
wsc = jax.random.uniform(kw2, (e, 1, nn), jnp.float32, 0.01, 0.02)
m = e * rows
lhs = jax.random.normal(kw1, (m, kk), jnp.bfloat16)
bits = jnp.asarray(np.repeat(np.where(pf, 4.0, 8.0), rows), jnp.float32)
gs = tuple([rows] * e)
rhs_cat, _ = build_ragged_mixed(wq, pf.astype(np.int32))
consts = {"lhs": lhs, "wq": wq, "wsc": wsc, "bits": bits, "cat": rhs_cat}
w_bytes_int8 = e * kk * nn
w_bytes_packed = int(rhs_cat.shape[0]) * nn

def int8_step(state, cc):
    aq, asc = quantize_rows(cc["lhs"], cc["bits"], gain=1 + 1e-3 * state["s"][0])
    o = pallas_gmm.gmm_w8a8(aq, asc, cc["wq"], cc["wsc"],
                            jnp.asarray(gs, jnp.int32), bm=rows, bn=nn,
                            static_sizes=gs, aligned=True)
    return bench._chain_feedback([[o]])

def ws_step(state, cc):
    aq, asc = quantize_rows(cc["lhs"], cc["bits"], gain=1 + 1e-3 * state["s"][0])
    o = pallas_gmm.gmm_w8a8_ws(aq, asc, cc["wq"], cc["wsc"], gs, bm=rows, bn=nn)
    return bench._chain_feedback([[o]])

def packed_step(state, cc):
    aq, asc = quantize_rows(cc["lhs"], cc["bits"], gain=1 + 1e-3 * state["s"][0])
    o = pallas_gmm.gmm_mixed_packed(
        aq, asc, cc["cat"], cc["wsc"], jnp.asarray(gs, jnp.int32),
        jnp.asarray(pf.astype(np.int32)), bm=rows, bn=nn,
        static_sizes=gs, static_pflags=[int(x) for x in pf], aligned=True)
    return bench._chain_feedback([[o]])

for name, step in [("int8_auto", int8_step), ("int8_ws", ws_step),
                   ("mixed_packed", packed_step)]:
    jf = jax.jit(lambda s, n, cc, _step=step: jax.lax.fori_loop(
        0, n, lambda _, c: _step(c, cc), s))
    f = lambda s, n: jf(s, jnp.int32(n), consts)
    _force(f({"s": jnp.zeros((1,), jnp.float32)}, 1))
    pers = []
    for rep in range(3):
        times = {}
        for n_it in (128, 384):
            s0 = {"s": jnp.full((1,), 1e-6 * (rep * 13 + n_it), jnp.float32)}
            t0 = time.perf_counter()
            _force(f(s0, n_it))
            times[n_it] = time.perf_counter() - t0
        pers.append((times[384] - times[128]) / 256)
    per = float(np.median(pers)) * 1e3
    gbs = (w_bytes_packed if name == "mixed_packed" else w_bytes_int8) / (per * 1e-3) / 1e9
    print(json.dumps({"kernel": name, "ms": round(per, 4),
                      "w_gbps": round(gbs, 0)}), flush=True)
