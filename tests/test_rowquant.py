"""Pallas one-pass row-quant kernel == the jnp absmax/clamp reference.

The kernel (ops/rowquant.py) replaces the activation-quant step inside the
w8a8/w8a8g8 custom-VJP cores (ops/quant.py); these tests pin bit-exact
equality with the jnp formulation on CPU (interpret mode — same code path
the TPU runs compiled).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phantom_vlb_tpu.ops.rowquant import row_quant, row_quant_scaled


def _ref_quant(x):
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    return jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8), s


@pytest.mark.parametrize("shape", [(16, 256), (2, 8, 384), (8, 128)])
@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_row_quant_matches_reference(shape, dtype):
    x = jax.random.normal(jax.random.key(0), shape, dtype) * 3.0
    q, s = row_quant(x, interpret=True)
    q_ref, s_ref = _ref_quant(x)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)


def test_row_quant_zero_row():
    # All-zero rows hit the 1e-12 scale floor, not a division blowup.
    x = jnp.zeros((8, 256), jnp.bfloat16)
    q, s = row_quant(x, interpret=True)
    assert np.all(np.asarray(q) == 0)
    np.testing.assert_allclose(np.asarray(s), 1e-12)


@pytest.mark.parametrize("shape", [(16, 256), (2, 8, 384)])
def test_row_quant_scaled_matches_reference(shape):
    kx, kw = jax.random.split(jax.random.key(1))
    dy = jax.random.normal(kx, shape, jnp.bfloat16)
    w_scale = jax.random.uniform(kw, (shape[-1],), jnp.float32, 0.01, 2.0)
    q, s = row_quant_scaled(dy, w_scale, interpret=True)
    q_ref, s_ref = _ref_quant(dy.astype(jnp.float32) * w_scale)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)


def test_act_quant_dispatch_fallback():
    # Non-128-multiple feature dims take the jnp path, same numbers.
    from phantom_vlb_tpu.ops.quant import _act_quant

    x = jax.random.normal(jax.random.key(2), (4, 100), jnp.float32)
    q, s = _act_quant(x)
    q_ref, s_ref = _ref_quant(x)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)
