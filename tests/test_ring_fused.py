"""Fused RDMA ring attention: parity vs single-device attention.

Runs the Pallas kernel in TPU *interpret* mode (simulated inter-device DMAs
and semaphores) over a shard_map'd virtual CPU mesh — the same mechanism the
driver's dryrun uses for multi-chip validation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from phantom_vlb_tpu.ops.flash_attention import xla_attention
from phantom_vlb_tpu.ops.ring_fused import ring_flash_fused, ring_fwd_sharded


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), ("sequence",))


def _qkv(b=1, hq=4, hkv=2, s=512, d=128, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, hq, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("n", [2, 4])
def test_fused_ring_forward_parity(n):
    mesh = _mesh(n)
    q, k, v = _qkv()
    out, lse = ring_fwd_sharded(
        q, k, v, None, mesh, "sequence", causal=True, interpret=True,
        block_q=128,
    )
    ref = xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
    assert np.isfinite(np.asarray(lse)).all()


def test_fused_ring_with_kv_mask():
    mesh = _mesh(2)
    q, k, v = _qkv(s=256, seed=1)
    mask = np.ones((1, 256), np.int32)
    mask[:, 200:] = 0   # pad tail masked out
    mask_j = jnp.asarray(mask)
    out, _ = ring_fwd_sharded(
        q, k, v, mask_j, mesh, "sequence", causal=True, interpret=True,
        block_q=128,
    )
    ref = xla_attention(q, k, v, causal=True, kv_mask=mask_j)
    np.testing.assert_allclose(
        np.asarray(out)[:, :, :200], np.asarray(ref)[:, :, :200],
        atol=2e-3, rtol=2e-3,
    )


def test_fused_ring_gradient_parity():
    """Fused forward + ppermute backward == dense attention gradients."""
    mesh = _mesh(2)
    q, k, v = _qkv(b=1, hq=2, hkv=1, s=256, seed=2)

    def loss_fused(q, k, v):
        out = ring_flash_fused(q, k, v, mesh, "sequence", causal=True,
                               interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, causal=True).astype(jnp.float32) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fused, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3,
            err_msg=f"d{name}",
        )


def test_fused_ring_multi_axis_mesh():
    """Ring over `sequence` on a 2x2 (fsdp x sequence) mesh.

    Regression for the multi-axis neighbor addressing: the kernel must
    address its right neighbor per mesh axis ({'sequence': idx}, MESH
    device-id type).  The earlier LOGICAL flat-id form cross-wired rings
    across fsdp rows and deadlocked (round-3 fix).

    NB deliberately 4 participating devices: mosaic interpret mode
    deadlocks at 8 concurrently-blocked kernels on small hosts (see
    __graft_entry__.dryrun_multichip docstring for the measurement).
    """
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.array(devs[:4]).reshape(2, 2), ("fsdp", "sequence"))
    q, k, v = _qkv(s=256, seed=3)
    out, lse = ring_fwd_sharded(
        q, k, v, None, mesh, "sequence", causal=True, interpret=True,
        block_q=128,
    )
    ref = xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
    assert np.isfinite(np.asarray(lse)).all()
