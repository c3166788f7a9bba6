"""Pallas flash attention vs XLA reference — forward and gradients.

Runs the Pallas kernels in interpreter mode on the CPU test platform; the same
code compiles with Mosaic on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phantom_vlb_tpu.ops.flash_attention import attention, xla_attention

B, HQ, HKV, S, D = 2, 4, 2, 256, 64


def _inputs(seed=0, s=S, hq=HQ, hkv=HKV, d=D):
    ks = jax.random.split(jax.random.key(seed), 3)
    q = jax.random.normal(ks[0], (B, hq, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (B, hkv, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (B, hkv, s, d), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [True, False])
def test_forward_parity(causal):
    q, k, v = _inputs()
    ref = xla_attention(q, k, v, causal=causal)
    out = attention(q, k, v, causal=causal, impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_forward_with_padding_mask():
    q, k, v = _inputs(1)
    valid = np.ones((B, S), np.int32)
    valid[0, 200:] = 0
    valid[1, 100:150] = 0  # interior padding (unk id quirk, litmodule.py:271)
    kv_mask = jnp.asarray(valid)
    ref = xla_attention(q, k, v, causal=True, kv_mask=kv_mask)
    out = attention(q, k, v, causal=True, kv_mask=kv_mask, impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_forward_unaligned_seq():
    q, k, v = _inputs(2, s=200)  # not a multiple of 128
    ref = xla_attention(q, k, v, causal=True)
    out = attention(q, k, v, causal=True, impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_gradient_parity(causal):
    q, k, v = _inputs(3, s=128)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, causal=causal) ** 2)

    def loss_pallas(q, k, v):
        return jnp.sum(
            attention(q, k, v, causal=causal, impl="pallas", interpret=True) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g_pal, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4,
            err_msg=f"d{name} mismatch",
        )


def test_gradient_with_mask():
    q, k, v = _inputs(4, s=128)
    valid = np.ones((B, 128), np.int32)
    valid[:, 100:] = 0
    kv_mask = jnp.asarray(valid)

    def loss(impl):
        def f(q, k, v):
            return jnp.sum(
                attention(
                    q, k, v, causal=True, kv_mask=kv_mask,
                    impl=impl, interpret=True,
                )
                ** 2
            )
        return f

    def f_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, causal=True, kv_mask=kv_mask) ** 2)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4)


def test_gradient_unaligned_clip_shape():
    """Gradients at the CLIP tower's 577-token, non-128-multiple length.

    Exercises the transposed (B, H, 8, S) stat layout when the padded S is
    not a lane multiple (sq_p = 577 -> block minor == array dim)."""
    q, k, v = _inputs(6, s=577, hq=2, hkv=2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, causal=False) ** 2)

    def loss_pallas(q, k, v):
        return jnp.sum(
            attention(q, k, v, causal=False, impl="pallas", interpret=True) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g_pal, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4,
            err_msg=f"d{name} mismatch",
        )


def test_bf16_runs():
    q, k, v = _inputs(5, s=128)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = attention(q, k, v, causal=True, impl="pallas", interpret=True)
    ref = xla_attention(q, k, v, causal=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=5e-2, rtol=5e-2
    )


# ---------------------------------------------------------------------------
# Packed (B, S, H*D) layout — same kernels, transpose-free BlockSpecs.
# ---------------------------------------------------------------------------
def _to_packed(x):
    return x.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[2], -1)


@pytest.mark.parametrize("causal", [True, False])
def test_packed_forward_parity(causal):
    from phantom_vlb_tpu.ops.flash_attention import attention_packed

    q, k, v = _inputs(7)
    ref = xla_attention(q, k, v, causal=causal)
    out = attention_packed(
        _to_packed(q), _to_packed(k), _to_packed(v), HQ, HKV,
        causal=causal, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_to_packed(ref)), atol=2e-5, rtol=2e-5
    )


def test_packed_forward_with_padding_mask():
    from phantom_vlb_tpu.ops.flash_attention import attention_packed

    q, k, v = _inputs(8)
    valid = np.ones((B, S), np.int32)
    valid[0, 200:] = 0
    valid[1, 100:150] = 0
    kv_mask = jnp.asarray(valid)
    ref = xla_attention(q, k, v, causal=True, kv_mask=kv_mask)
    out = attention_packed(
        _to_packed(q), _to_packed(k), _to_packed(v), HQ, HKV,
        causal=True, kv_mask=kv_mask, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_to_packed(ref)), atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("s", [128, 200, 577])
def test_packed_gradient_parity(s):
    """Gradients vs the XLA reference, incl. the unaligned CLIP length 577."""
    from phantom_vlb_tpu.ops.flash_attention import attention_packed

    q, k, v = _inputs(9, s=s)
    causal = s == 128

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, causal=causal) ** 2)

    def loss_packed(qp, kp, vp):
        return jnp.sum(
            attention_packed(qp, kp, vp, HQ, HKV, causal=causal, interpret=True)
            ** 2
        )

    gr = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    gp = jax.grad(loss_packed, (0, 1, 2))(
        _to_packed(q), _to_packed(k), _to_packed(v)
    )
    for a, b in zip(gr, gp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(_to_packed(a)), atol=5e-4, rtol=5e-4
        )


def test_packed_matches_bhsd_model_path():
    """The tiny Mistral stack: packed-pallas layer output == xla layer output."""
    from phantom_vlb_tpu.models.mistral import MistralConfig, MistralModel

    def run(impl):
        cfg = MistralConfig(
            hidden_size=128, intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=32,
            vocab_size=64, param_dtype=jnp.float32, dtype=jnp.float32,
            remat=False, scan_layers=False, attention_impl=impl, lora=None,
        )
        model = MistralModel(cfg)
        x = jax.random.normal(jax.random.key(0), (2, 40, 128), jnp.float32)
        pos = jnp.broadcast_to(jnp.arange(40)[None], (2, 40))
        kv_mask = jnp.ones((2, 40), jnp.int32)
        params = model.init(jax.random.key(1), x, pos, kv_mask)
        out = model.apply(params, x, pos, kv_mask)
        dx = jax.grad(
            lambda p, x: jnp.sum(jnp.sin(model.apply(p, x, pos, kv_mask))),
            argnums=1,
        )(params, x)
        return out, dx

    o_x, g_x = run("xla")
    o_p, g_p = run("pallas")
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=1e-4, rtol=1e-4)
