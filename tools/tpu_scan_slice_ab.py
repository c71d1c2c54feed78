"""Does lax.scan's per-layer weight slicing copy the expert weights before
each Pallas GMM launch? (decode-decomposition follow-up)

Arms, all at the serving decode shape (E=60, K=2048, N=1408, M=128
unaligned, traced metadata — the model path's exact parameters):
  direct   one launch, weights passed straight from consts
  unroll4  4 launches, 4 separate weight arrays (python loop)
  scan4    4 launches, weights stacked [4, E, K, N] as scan xs (model path)

If scan4 >> unroll4 ~= 4 x direct, the scan slice is materializing a copy
of the weights every layer (XLA cannot fuse a dynamic-slice producer into
a custom call operand).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_scan_slice_ab.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets cache dir)
import jax
import jax.numpy as jnp
import numpy as np

from mxmoe_tpu.bench.timing import bench_step_chained
from mxmoe_tpu.ops import pallas_gmm

E, K, N, M, L = 60, 2048, 1408, 128, 4


def main():
    kw1, kw2 = jax.random.split(jax.random.PRNGKey(3))
    wq = jax.random.randint(kw1, (L, E, K, N), -127, 128, jnp.int8)
    wsc = jax.random.uniform(kw2, (L, E, 1, N), jnp.float32, 0.01, 0.02)
    aq = jax.random.randint(kw1, (M, K), -127, 128, jnp.int8)
    asc = jax.random.uniform(kw2, (M, 1), jnp.float32, 0.01, 0.02)
    # unaligned ragged sizes like a real 32-slot top-4 routing draw
    rng = np.random.default_rng(0)
    gs = rng.multinomial(M, np.ones(E) / E)
    gs_dev = jnp.asarray(gs, jnp.int32)
    bn = min(N, max(512, ((3 * 1024 * 1024) // K) // 128 * 128))

    def launch(a, sc, w, ws):
        return pallas_gmm.gmm_w8a8(a, sc, w, ws, gs_dev, bn=bn,
                                   out_dtype=jnp.bfloat16)

    def chain(a, out):
        k = a.shape[1]
        reps = -(-k // out.shape[1])
        o = jnp.tile(out, (1, reps))[:, :k]
        return a ^ (o > 0).astype(jnp.int8)

    def direct(state, cc):
        out = launch(state["aq"], cc["asc"], cc["wq"][0], cc["wsc"][0])
        return {"aq": chain(state["aq"], out)}

    def unroll4(state, cc):
        a = state["aq"]
        for l in range(L):
            out = launch(a, cc["asc"], cc[f"w{l}"], cc[f"s{l}"])
            a = chain(a, out)
        return {"aq": a}

    def scan4(state, cc):
        def body(a, lw):
            out = launch(a, cc["asc"], lw["w"], lw["s"])
            return chain(a, out), None

        a, _ = jax.lax.scan(body, state["aq"], {"w": cc["wq"], "s": cc["wsc"]})
        return {"aq": a}

    state0 = {"aq": aq}
    base = {"asc": asc}
    arms = [
        ("direct", direct, {**base, "wq": wq, "wsc": wsc}),
        ("unroll4", unroll4,
         {**base, **{f"w{l}": wq[l] for l in range(L)},
          **{f"s{l}": wsc[l] for l in range(L)}}),
        ("scan4", scan4, {**base, "wq": wq, "wsc": wsc}),
    ]
    for name, step, consts in arms:
        r = bench_step_chained(step, state0, consts=consts, repeats=5,
                               target_s=0.1)
        print(f"{name:8s} {r.median_ms:7.3f} ms  "
              f"(band {min(r.samples_ms):.3f}-{max(r.samples_ms):.3f})",
              flush=True)


if __name__ == "__main__":
    main()
