"""Mixtral-scale (K=14336) grouped w×a kernel check + timing on the TPU.

Verdict #4(b/c) 'done' criterion: g128 schemes must survive mixtral's
down-proj K through the k-blocked gmm_w8a8_grouped. Checks correctness
against the fake-quant dense oracle at small M, then times a prefill-scale
M. Run: timeout 590 python tools/tpu_mixtral_check.py
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mxmoe_jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mxmoe_tpu.ops import pallas_gmm
from mxmoe_tpu.quant.qparams import quantize_act_grouped
from mxmoe_tpu.quant.packing import quantize_weight_kn
from mxmoe_tpu.quant.schemes import QLinearConfig
from mxmoe_tpu.bench.timing import bench_step_chained, chain_launcher

K, N, E, G = 14336, 4096, 8, 128


def operands(m, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    a = jax.random.uniform(k1, (m, K), jnp.float32, -1, 1)
    w = jax.random.uniform(k2, (E, K, N), jnp.float32, -1, 1)
    aq, asc = quantize_act_grouped(a, 4, G)
    packed = quantize_weight_kn(w, QLinearConfig(w_bits=4, w_gsize=G,
                                                 w_sym=True, a_bits=4))
    sizes = np.random.default_rng(seed).multinomial(m, np.ones(E) / E)
    return aq, asc, packed.values.astype(jnp.int8), packed.scale, \
        tuple(int(s) for s in sizes)


def main():
    # correctness at small M vs fake-quant dense oracle
    m = 512
    aq, asc, wq, wsc, sizes = operands(m)
    out = pallas_gmm.gmm_w8a8_grouped(
        aq, asc, wq, wsc, jnp.asarray(sizes, jnp.int32), gsize=G,
        bm=256, bn=512, bk="auto", static_sizes=sizes,
        out_dtype=jnp.float32)
    a_fq = (aq.astype(jnp.float32).reshape(m, K // G, G)
            * asc[..., None]).reshape(m, K)
    w_fq = (wq.astype(jnp.float32).reshape(E, K // G, G, N)
            * wsc[:, :, None, :]).reshape(E, K, N)
    offs = np.concatenate([[0], np.cumsum(sizes)])
    refs = [a_fq[offs[g]:offs[g + 1]] @ w_fq[g] for g in range(E)]
    ref = jnp.concatenate(refs, axis=0)
    rel = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(json.dumps({"check": "mixtral_k14336_w4a4_g128", "m": m,
                      "rel_err": round(rel, 6)}), flush=True)
    assert rel < 5e-3, rel

    # timing at prefill scale
    m = 4096
    aq, asc, wq, wsc, sizes = operands(m, seed=1)
    gs = jnp.asarray(sizes, jnp.int32)

    def launch(ops):
        return pallas_gmm.gmm_w8a8_grouped(
            ops["lhs"], ops["asc"], ops["wq"], ops["wsc"], ops["gs"],
            gsize=G, bm=256, bn=512, bk="auto", static_sizes=sizes)

    cstep, cstate, cconsts = chain_launcher(
        launch, {"lhs": aq, "asc": asc, "wq": wq, "wsc": wsc, "gs": gs})
    r = bench_step_chained(cstep, cstate, consts=cconsts,
                           n1=3, n2=12, repeats=3)
    flops = 2 * m * K * N
    print(json.dumps({
        "bench": "mixtral_k14336_w4a4_g128", "m": m,
        "ms": round(r.median_ms, 3),
        "tflops": round(flops / (r.median_ms * 1e-3) / 1e12, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
