"""Bucketed-vs-fused measurement for mixed weight-only + w×a layers.

The reference's Fused mode runs heterogeneous schemes in ONE persistent
kernel (``hz_fused.cuh:14-127``); round 1 deferred the weight-only + w×a
pairing without measuring. This script settles it (verdict #7): the same
mixed layer executes as

  (a) two scheme-bucketed launches with exact static grids
      (gmm_weight_only on the a16 bucket + gmm_w8a8 on the w×a bucket), vs
  (b) one gmm_mixed_wo_wxa launch with per-expert scheme flags
      (real branch per logical tile; both act operands stream every tile).

  python -m mxmoe_tpu.bench.fused_ab [--ms 32768 2048 512]

Writes one JSON line per (variant, M); PERF.md records the conclusion.
"""

from __future__ import annotations

import argparse
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mxmoe_jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from ..ops import pallas_gmm
from ..quant.qparams import quantize_act_per_token


def build_case(m_total: int, k: int = 2048, n: int = 2816, e: int = 60,
               seed: int = 42, interpret: bool = False):
    """Random grouped workload, experts alternately weight-only / w×a,
    already sorted so the weight-only bucket is contiguous (rows first)."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    lhs = jax.random.uniform(k1, (m_total, k), jnp.float32, -1, 1).astype(jnp.bfloat16)
    w = jax.random.uniform(k2, (e, k, n), jnp.float32, -1, 1)
    wsc = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0
    wq = jnp.round(w / wsc).astype(jnp.int8)

    rng = np.random.default_rng(seed)
    sizes = rng.multinomial(m_total, np.ones(e) / e)
    n_wo = e // 2
    flags = np.array([1] * n_wo + [0] * (e - n_wo), np.int32)
    m_wo = int(sizes[:n_wo].sum())

    aq, asc = quantize_act_per_token(lhs.astype(jnp.float32), 8)
    return dict(
        lhs=lhs, aq=aq, asc=asc, wq=wq, wsc=wsc,
        sizes=tuple(int(s) for s in sizes), flags=flags, m_wo=m_wo,
        n_wo=n_wo, interpret=interpret,
    )


def bucketed_step(c):
    """(a) two launches on the pre-sorted buckets, exact grids."""
    s_wo, s_xa = c["sizes"][: c["n_wo"]], c["sizes"][c["n_wo"]:]
    m_wo = c["m_wo"]
    n_full = c["wq"].shape[-1]
    out_wo = pallas_gmm.gmm_weight_only(
        c["lhs"][:m_wo], c["wq"][: c["n_wo"]], c["wsc"][: c["n_wo"]],
        jnp.zeros_like(c["wsc"][: c["n_wo"]]),
        jnp.asarray(s_wo, jnp.int32), gsize=-1, bm=128, bn=min(n_full, 512),
        static_sizes=s_wo, interpret=c["interpret"],
    )
    out_xa = pallas_gmm.gmm_w8a8(
        c["aq"][m_wo:], c["asc"][m_wo:], c["wq"][c["n_wo"]:],
        c["wsc"][c["n_wo"]:], jnp.asarray(s_xa, jnp.int32),
        bm=256, bn=n_full, static_sizes=s_xa, interpret=c["interpret"],
    )
    return jnp.concatenate([out_wo, out_xa], axis=0)


def fused_step(c):
    """(b) one launch, per-expert flags."""
    return pallas_gmm.gmm_mixed_wo_wxa(
        c["lhs"], c["aq"], c["asc"], c["wq"], c["wsc"], c["flags"],
        jnp.asarray(c["sizes"], jnp.int32), bm=128,
        bn=min(c["wq"].shape[-1], 512),
        static_sizes=c["sizes"], interpret=c["interpret"],
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ms", type=int, nargs="+", default=[32768, 2048, 512])
    ap.add_argument("--experts", type=int, default=60)
    args = ap.parse_args()

    from .timing import bench_step_chained

    interpret = jax.default_backend() == "cpu"
    for m in args.ms:
        c = build_case(m, e=args.experts, interpret=interpret)
        flops = 2 * m * 2048 * 2816
        steps = {"bucketed": bucketed_step, "fused": fused_step}
        outs = {}
        for name, step in steps.items():
            # statics (sizes/flags/m_wo) stay in the closure; weights ride
            # the consts jit arg; activations chain through the carry
            k_in = c["lhs"].shape[1]
            statics = {k: v for k, v in c.items() if not hasattr(v, "dtype")}
            consts = {k: v for k, v in c.items()
                      if hasattr(v, "dtype") and k not in ("lhs", "aq")}

            def chained(state, cc, _step=step, _k=k_in):
                out = _step({**statics, **cc,
                             "lhs": state["lhs"], "aq": state["aq"]})
                nl = out[:, :_k] * jnp.bfloat16(1.0 / 64)
                na = state["aq"] ^ (out[:, :_k] > 0).astype(jnp.int8)
                return {"lhs": nl.astype(jnp.bfloat16), "aq": na}

            state0 = {"lhs": c["lhs"], "aq": c["aq"]}
            outs[name] = jax.jit(lambda s, cc, _step=step: _step(
                {**statics, **cc, "lhs": s["lhs"], "aq": s["aq"]}))(
                    state0, consts)
            r = bench_step_chained(chained, state0, consts=consts,
                                   n1=3, n2=12, repeats=3)
            print(json.dumps({
                "variant": name, "m": m,
                "ms": round(r.median_ms, 3),
                "tflops": round(flops / (r.median_ms * 1e-3) / 1e12, 1),
            }), flush=True)
        err = float(jnp.max(jnp.abs(
            outs["bucketed"].astype(jnp.float32)
            - outs["fused"].astype(jnp.float32))))
        print(json.dumps({"m": m, "cross_check_max_abs": err}), flush=True)


if __name__ == "__main__":
    main()
