"""Probe: GPTQ at the ds2 dense-layer shape (the round-4 OOM).

The at-scale runbook's ds2 calibrate stage OOMed the chip twice inside
``jit(_solve_triangular)`` — f32[1, ~9k, 10944] update temps from the
full-identity RHS (out/runbook_scale/ds2-calibrate.log). This drives
``gptq_quantize_kn`` at exactly that shape (down proj [10944, 2048],
Hessian [1, 10944, 10944]) on the real TPU and prints the compiled
memory analysis + wall time, so the fix (reverse-Cholesky factor +
column-chunked triangular inversion, quant/gptq.py) is validated BEFORE
rerunning the 27-layer runbook.

Run:  timeout 580 python tools/tpu_gptq_dense_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from mxmoe_tpu.quant.gptq import gptq_quantize_kn
from mxmoe_tpu.quant.schemes import parse_scheme


def main():
    k, n = 10944, 2048   # ds2 dense down: intermediate 10944 -> hidden 2048
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((1, k, n)), jnp.float32) * 0.02
    x = jnp.asarray(rng.standard_normal((512, k)), jnp.float32)
    h = (2.0 * (x.T @ x))[None]
    qcfg = parse_scheme("w4a4_g-1_sym")

    fn = jax.jit(lambda w, h: gptq_quantize_kn(w, h, qcfg).w_fq)
    lowered = fn.lower(w, h)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    print(f"temp  = {ma.temp_size_in_bytes / 2**30:.2f} GiB")
    print(f"args  = {ma.argument_size_in_bytes / 2**30:.2f} GiB")
    print(f"out   = {ma.output_size_in_bytes / 2**30:.2f} GiB")
    total = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
             + ma.output_size_in_bytes)
    print(f"total = {total / 2**30:.2f} GiB")

    t0 = time.time()
    out = compiled(w, h)
    out.block_until_ready()
    print(f"ran in {time.time() - t0:.1f}s, finite={bool(jnp.all(jnp.isfinite(out)))}")


if __name__ == "__main__":
    main()
