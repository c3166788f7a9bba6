"""Fused dropout+adapter-matmul kernel: fwd/grad parity vs an XLA reference.

CPU runs the ``bits``-input mode (mask supplied; in-kernel PRNG replaced) in
Pallas interpret — identical arithmetic to the TPU PRNG path, which
scripts/fused_dropout_tpu.py checks on the real chip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phantom_vlb_tpu.ops.lora_fused import fused_dropout_matmul

M, K, R = 256, 512, 16
P = 0.1
THR = round(P * 256)
KEEP = 1.0 - THR / 256.0


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    a = jnp.asarray(rng.standard_normal((K, R)) * 0.05, jnp.bfloat16)
    bits = jnp.asarray(rng.integers(0, 256, (M, K)), jnp.uint8)
    return x, a, bits


def ref(x, a, bits):
    z = jnp.where(bits.astype(jnp.int32) >= THR,
                  x * jnp.asarray(1 / KEEP, x.dtype), 0)
    return jax.lax.dot(z, a, preferred_element_type=jnp.float32).astype(x.dtype)


def test_forward_parity(data):
    x, a, bits = data
    out = fused_dropout_matmul(x, a, 0, P, bits=bits,
                               block_m=128, block_k=128)
    want = ref(x, a, bits)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        atol=1e-2, rtol=1e-2,
    )
    # p=0 short-circuits to a plain matmul
    out0 = fused_dropout_matmul(x, a, 0, 0.0, bits=bits)
    np.testing.assert_allclose(
        np.asarray(out0, np.float32),
        np.asarray(jax.lax.dot(x, a.astype(x.dtype)), np.float32),
        atol=1e-2, rtol=1e-2,
    )


def test_grad_parity(data):
    x, a, bits = data

    def loss_fused(x, a):
        out = fused_dropout_matmul(x, a, 0, P, bits=bits,
                                   block_m=128, block_k=128)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(x, a):
        return jnp.sum(ref(x, a, bits).astype(jnp.float32) ** 2)

    gx, ga = jax.grad(loss_fused, argnums=(0, 1))(x, a)
    gx_r, ga_r = jax.grad(loss_ref, argnums=(0, 1))(x, a)
    # bf16 cotangents: compare with cosine + scale, not elementwise exact.
    for g, r_ in ((gx, gx_r), (ga, ga_r)):
        g = np.asarray(g, np.float32).ravel()
        r_ = np.asarray(r_, np.float32).ravel()
        cos = float(g @ r_ / (np.linalg.norm(g) * np.linalg.norm(r_) + 1e-30))
        assert cos > 0.999, cos
        np.testing.assert_allclose(np.linalg.norm(g), np.linalg.norm(r_),
                                   rtol=2e-2)


def test_mask_zero_rows_propagate(data):
    """Entries dropped by the mask must contribute no gradient to x."""
    x, a, bits = data
    dead = bits.astype(jnp.int32) < THR

    def loss(x):
        out = fused_dropout_matmul(x, a, 0, P, bits=bits,
                                   block_m=128, block_k=128)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gx = jax.grad(loss)(x)
    assert float(jnp.abs(jnp.where(dead, gx.astype(jnp.float32), 0)).max()) == 0.0
