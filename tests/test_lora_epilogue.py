"""Fused LoRA rank-r epilogue kernels: fwd/grad parity vs the XLA form.

CPU runs the Pallas kernels in interpret mode — identical arithmetic to the
TPU path (the op replaces XLA GEMMs measured 10-30x off bandwidth in-step;
BENCHMARKS.md round 5).  Reference math: peft's ``y + alpha/r * (z @ B)``
(litmodule.py:101-120 via lora.yaml:28-29).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phantom_vlb_tpu.ops.lora_epilogue import lora_epilogue

M, N, R = 256, 384, 16
SCALING = 2.0


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal((M, N)), jnp.bfloat16)
    z = jnp.asarray(rng.standard_normal((M, R)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((R, N)) * 0.1, jnp.bfloat16)
    return y, z, b


def ref(y, z, b):
    return y + jnp.asarray(SCALING, y.dtype) * (z @ b)


def test_forward_parity(data):
    y, z, b = data
    out = lora_epilogue(y, z, b, SCALING, block_m=128, block_n=128,
                        interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref(y, z, b), np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_forward_parity_3d(data):
    """Leading batch dims are flattened internally; math unchanged."""
    y, z, b = data
    y3 = y.reshape(2, M // 2, N)
    z3 = z.reshape(2, M // 2, R)
    out = lora_epilogue(y3, z3, b, SCALING, block_m=128, block_n=128,
                        interpret=True)
    assert out.shape == y3.shape
    np.testing.assert_allclose(
        np.asarray(out.reshape(M, N), np.float32),
        np.asarray(ref(y, z, b), np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_grad_parity(data):
    y, z, b = data

    def loss(fn):
        def inner(y, z, b):
            out = fn(y, z, b)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return inner

    fused = lambda y, z, b: lora_epilogue(  # noqa: E731
        y, z, b, SCALING, block_m=128, block_n=128, interpret=True)
    g_fused = jax.grad(loss(fused), argnums=(0, 1, 2))(y, z, b)
    g_ref = jax.grad(loss(ref), argnums=(0, 1, 2))(y, z, b)
    for got, want, name in zip(g_fused, g_ref, ("dy", "dz", "db")):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=5e-2, rtol=5e-2, err_msg=name,
        )


def test_grad_parity_xla_backward(data):
    """backward='xla' (Pallas fwd, XLA dz/dB): same gradients."""
    y, z, b = data

    def loss(y, z, b):
        out = lora_epilogue(y, z, b, SCALING, block_m=128, block_n=128,
                            interpret=True, backward="xla")
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(y, z, b):
        return jnp.sum(ref(y, z, b).astype(jnp.float32) ** 2)

    g_f = jax.grad(loss, argnums=(0, 1, 2))(y, z, b)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(y, z, b)
    for got, want, name in zip(g_f, g_r, ("dy", "dz", "db")):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=5e-2, rtol=5e-2, err_msg=name,
        )


def test_untileable_shape_falls_back(data):
    """r > 128 (or non-tiling shapes) take the plain XLA expression."""
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.standard_normal((4, 20)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((4, 130)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((130, 20)), jnp.float32)
    out = lora_epilogue(y, z, b, SCALING, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(y + SCALING * (z @ b)), rtol=1e-5
    )
