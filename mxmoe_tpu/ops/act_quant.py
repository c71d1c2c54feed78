"""Single-pass Pallas activation row quantization.

XLA lowers ``quantize_act_per_row_bits`` (quant/qparams.py) as an amax
reduction kernel followed by a separate quantize map — the activation
tensor is read TWICE from HBM (measured 0.79 ms/iter on the headline
workload vs the 0.46 ms single-read traffic bound,
tools/tpu_onelaunch_decomp.py). A row tile staged once in VMEM computes
amax and the codes in one pass at ~the read+write bound.

This is the TPU answer to the reference's intended quant-and-permute
fusion (``ref_bind.cu:434-592``, the missing ``act_kernel.cuh``): the
dynamic-quant pass runs at memory speed as its own kernel rather than
fused into dispatch (fusing into the GMM itself was measured slower —
PERF.md "Fused act-quant kernel").

Semantics are bit-identical to ``quantize_act_per_row_bits``:
  upper = 2^(min(bits,8)-1) - 1;  scale = max(amax(|x|), 1e-8)/upper
  q     = round(x/scale)  (int8; |x|/scale <= upper by construction)

``gain``: optional scalar multiplied into x before quantization — lets a
caller chain a per-step scale (bench.py's chain-dependence injection)
without an extra XLA elementwise pass over x.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .pallas_gmm import _cdiv, _check_vmem


def _quant_rows_kernel(x_ref, bits_ref, gain_ref, q_ref, sc_ref):
    xf = x_ref[...].astype(jnp.float32) * gain_ref[0, 0]
    upper = jnp.exp2(jnp.minimum(bits_ref[...], 8.0) - 1.0) - 1.0   # [bm,1]
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / upper
    q_ref[...] = jnp.round(xf / scale).astype(jnp.int8)
    sc_ref[...] = scale


def quantize_rows(
    x: jax.Array,            # [M, K] bf16/f32
    bits_per_row: jax.Array, # [M] float (per-row bitwidth; >=16 clips to 8)
    gain: jax.Array | float = 1.0,  # scalar pre-scale fused into the read
    bm: int = 256,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric quant -> (int8 codes [M,K], f32 scales [M,1])."""
    m, k = x.shape
    # keep the row tile at a sublane-safe multiple for the int8 output
    # (32 rows = one int8 sublane tile): tiny decode batches (m as small as
    # top_k) would otherwise produce sub-tile int8 OUTPUT blocks, a layout
    # this kernel family has never compiled on hardware (a failed Mosaic
    # compile wedges the remote backend — CLAUDE.md). Pallas masks the
    # out-of-bounds partial block when bm > m.
    bm = max(32, min(bm, m))
    # auto-shrink the row tile for wide K (full row must stage in VMEM)
    while bm > 32 and bm * k * (2 * x.dtype.itemsize + 4 + 2) > 12 * 2**20:
        bm //= 2
    gain = jnp.asarray(gain, jnp.float32).reshape(1, 1)
    bits2d = bits_per_row.astype(jnp.float32).reshape(m, 1)
    _check_vmem("quantize_rows",
                (bm * k * x.dtype.itemsize, True),
                (bm * k * 4, False),            # f32 staging
                (bm * k, True), (bm * 4, True))
    return pl.pallas_call(
        _quant_rows_kernel,
        grid=(_cdiv(m, bm),),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), jnp.int8),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, bits2d, gain)


def quantize_rows_uniform(
    x: jax.Array,
    bits: int = 8,
    gain: jax.Array | float = 1.0,
    bm: int = 256,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Uniform-bitwidth convenience wrapper (per-token dynamic quant)."""
    bits_row = jnp.full((x.shape[0],), float(bits), jnp.float32)
    return quantize_rows(x, bits_row, gain=gain, bm=bm, interpret=interpret)
