"""Does the Pallas pipeline re-fetch the rhs block on m-tile revisits?

PERF.md round-1 attributed the gap to ~2.5x weight re-reads: consecutive
logical tiles of the same group map to the SAME rhs block, and the
question is whether the pipeline skips the DMA (weight-stationary for
free) or re-issues it per logical tile.

Probe: identical compute (M=8192, K=2048, N=2816, int8, full-row bn,
aligned layout, bm=256) under two groupings:
  A: 32 groups x 256 rows  -> 1 logical tile per group (no reuse possible)
     weight bytes unique = 32*K*N = 184 MB
  B:  8 groups x 1024 rows -> 4 consecutive logical tiles per group
     weight bytes unique =  8*K*N =  46 MB
If the pipeline skips same-index copies, B ~ 2x faster (HBM-bound at
these shapes); if it re-fetches, A == B (both stream 184 MB).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_revisit_probe.py
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


def run_case(tag, e, rows_per_group, m=8192, k=2048, n=2816, bm=256):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    aq = jax.random.randint(k1, (m, k), -127, 128, jnp.int8)
    asc = jnp.ones((m, 1), jnp.float32)
    wq = jax.random.randint(k2, (e, k, n), -127, 128, jnp.int8)
    wsc = jnp.ones((e, 1, n), jnp.float32) * 0.01
    sizes = (rows_per_group,) * e
    gs = jnp.asarray(sizes, jnp.int32)

    def step(state, cc):
        out = pallas_gmm.gmm_w8a8(state["aq"], cc["asc"], cc["wq"],
                                  cc["wsc"], cc["gs"], bm=bm, bn=n,
                                  static_sizes=sizes, aligned=True)
        na = state["aq"] ^ (out[:, :k] > 0).astype(jnp.int8)
        return {"aq": na}

    r = bench_step_chained(step, {"aq": aq},
                           consts={"asc": asc, "wq": wq, "wsc": wsc,
                                   "gs": gs},
                           n1=4, n2=16, repeats=3)
    flops = 2 * m * k * n
    uniq_mb = e * k * n / 1e6
    print(json.dumps({
        "case": tag, "groups": e, "rows_per_group": rows_per_group,
        "ms": round(r.median_ms, 4), "std": round(r.std_ms, 4),
        "tflops": round(flops / r.median_ms / 1e9, 1),
        "unique_weight_mb": round(uniq_mb, 1),
    }), flush=True)
    return r.median_ms


def main():
    # bm=128: refetch traffic = 64 tiles x 5.8 MB = 371 MB (0.45 ms at
    # 819 GB/s) vs compute floor 0.24 ms — cleanly separated (at bm=256
    # the two floors coincide and the probe cannot discriminate)
    ta = run_case("A_one_tile_per_group", 64, 128, bm=128)
    tb = run_case("B_eight_tiles_per_group", 8, 1024, bm=128)
    ratio = ta / tb
    verdict = ("pipeline SKIPS same-index rhs copies (weight-stationary "
               "for free)" if ratio > 1.4 else
               "pipeline RE-FETCHES rhs per logical tile (weight-"
               "stationary schedule must be built)")
    print(json.dumps({"a_over_b": round(ratio, 3), "verdict": verdict}),
          flush=True)


if __name__ == "__main__":
    main()
