"""Single-pass Pallas act-quant kernel vs the XLA reference functions.

The kernel must be BITWISE identical to quant/qparams.py's
quantize_act_per_row_bits / quantize_act_per_token — the GMM kernels
consume its codes+scales interchangeably (bench.py BENCH_PALLAS_QUANT).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mxmoe_tpu.ops.act_quant import quantize_rows, quantize_rows_uniform
from mxmoe_tpu.quant.qparams import (quantize_act_per_row_bits,
                                     quantize_act_per_token)


@pytest.mark.parametrize("m,k,bm", [(37, 64, 16), (256, 128, 256),
                                    (300, 256, 128)])
def test_quantize_rows_matches_reference(m, k, bm):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32).astype(
        jnp.bfloat16)
    bits = jnp.asarray(rng.choice([4.0, 8.0, 16.0], m), jnp.float32)
    q_ref, s_ref = quantize_act_per_row_bits(x, bits)
    q, s = quantize_rows(x, bits, bm=bm, interpret=True)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref))


def test_quantize_rows_gain_folds_into_read():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32).astype(
        jnp.bfloat16)
    bits = jnp.full((64,), 8.0, jnp.float32)
    g = 1.0 + 1e-3 * 0.37
    q, s = quantize_rows(x, bits, gain=g, interpret=True)
    q_ref, s_ref = quantize_act_per_row_bits(x.astype(jnp.float32) * g, bits)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)


def test_quantize_rows_uniform_matches_per_token():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((50, 96)), jnp.float32).astype(
        jnp.bfloat16)
    q, s = quantize_rows_uniform(x, 8, interpret=True)
    q_ref, s_ref = quantize_act_per_token(x, 8)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref))


def test_quantize_rows_wide_k_autoshrinks_tile():
    # K wide enough that bm=256 would blow the VMEM staging budget; the
    # auto-shrink must keep the launch valid (and exact)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((16, 8192)), jnp.float32).astype(
        jnp.bfloat16)
    q, s = quantize_rows_uniform(x, 8, bm=256, interpret=True)
    q_ref, s_ref = quantize_act_per_token(x, 8)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))


@pytest.mark.parametrize("m", [1, 2, 8, 31])
def test_quantize_rows_tiny_m_sublane_clamp(m):
    """Decode-size batches (m as small as top_k) must still produce exact
    codes: the kernel clamps its row tile to a 32-row int8 sublane multiple
    and relies on Pallas partial-block masking (round-2 advisor: sub-tile
    int8 OUTPUT blocks are an untested Mosaic layout — never emit them)."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((m, 128)), jnp.float32).astype(
        jnp.bfloat16)
    bits = jnp.asarray(rng.choice([4.0, 8.0], m), jnp.float32)
    q_ref, s_ref = quantize_act_per_row_bits(x, bits)
    q, s = quantize_rows(x, bits, interpret=True)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref))
    qu, su = quantize_rows_uniform(x, 8, interpret=True)
    qu_ref, su_ref = quantize_act_per_token(x, 8)
    np.testing.assert_array_equal(np.asarray(qu), np.asarray(qu_ref))
