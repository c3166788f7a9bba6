"""Ring attention — context parallelism over the ``sequence`` mesh axis.

The reference has no sequence parallelism (window design caps the multimodal
sequence at 2048; SURVEY.md §5.7), but the mesh API reserves a ``sequence``
axis.  This module makes that axis functional: Q/K/V sharded on the sequence
dimension, KV blocks rotating around the ring via ``jax.lax.ppermute`` while
each device folds them into an online softmax (the guide's §16 pattern) —
point-to-point ICI traffic, no all-gather, activation memory O(S/N) per chip.

Implemented with jnp inside ``shard_map`` so JAX AD works end to end
(``ppermute`` transposes to the inverse permutation); the per-block math uses
the same fp32-stats online softmax as the Pallas kernel.  Swap-in point for a
future Pallas ring kernel with compute/RDMA overlap.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from phantom_vlb_tpu.core.mesh import MeshEnv, SEQUENCE_AXIS

__all__ = [
    "ring_attention",
    "ring_flash_attention",
    "set_sequence_mesh",
    "get_sequence_mesh",
]

# Process-level default mesh for model code that selects
# attention_impl='ring' (modules cannot carry a MeshEnv in their config).
_SEQUENCE_MESH: MeshEnv | None = None


def set_sequence_mesh(env: MeshEnv | None) -> None:
    global _SEQUENCE_MESH
    _SEQUENCE_MESH = env


def get_sequence_mesh() -> MeshEnv:
    if _SEQUENCE_MESH is None:
        raise RuntimeError(
            "attention_impl='ring' needs set_sequence_mesh(env) first"
        )
    return _SEQUENCE_MESH

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def ring_attention(
    q: jnp.ndarray,   # (B, Hq, S, D), S sharded over the sequence axis
    k: jnp.ndarray,   # (B, Hkv, S, D)
    v: jnp.ndarray,   # (B, Hkv, S, D)
    env: MeshEnv,
    causal: bool = True,
    sm_scale: float | None = None,
    kv_mask: jnp.ndarray | None = None,   # (B, S) valid-token mask
    axis: str = SEQUENCE_AXIS,
) -> jnp.ndarray:
    """Numerically equal to full attention over the global sequence."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    n_shards = env.mesh.shape[axis]
    if n_shards == 1:
        from phantom_vlb_tpu.ops.flash_attention import xla_attention

        return xla_attention(q, k, v, causal=causal, sm_scale=sm_scale,
                             kv_mask=kv_mask)

    b, hq, s_global, d = q.shape
    hkv = k.shape[1]
    group = hq // hkv
    s_loc = s_global // n_shards
    assert s_global % n_shards == 0, "sequence must divide the ring size"
    if kv_mask is None:
        kv_mask = jnp.ones((b, s_global), jnp.int32)

    def body(q_loc, k_loc, v_loc, mask_loc):
        idx = jax.lax.axis_index(axis)
        qg = q_loc.reshape(b, hkv, group, s_loc, d)

        m = jnp.full((b, hkv, group, s_loc, 1), _NEG, jnp.float32)
        l = jnp.zeros((b, hkv, group, s_loc, 1), jnp.float32)
        o = jnp.zeros((b, hkv, group, s_loc, d), jnp.float32)

        k_blk, v_blk, m_blk = k_loc, v_loc, mask_loc
        q_pos = idx * s_loc + jnp.arange(s_loc)[:, None]          # (s_loc, 1)

        for step in range(n_shards):
            src = (idx - step) % n_shards
            s_ = jnp.einsum(
                "bhgqd,bhkd->bhgqk", qg, k_blk,
                preferred_element_type=jnp.float32,
            ) * sm_scale
            valid = m_blk[:, None, None, None, :] > 0              # (B,1,1,1,s_loc)
            if causal:
                kv_pos = src * s_loc + jnp.arange(s_loc)[None, :]  # (1, s_loc)
                valid = valid & (kv_pos <= q_pos)[None, None, None]
            s_ = jnp.where(valid, s_, _NEG)

            m_new = jnp.maximum(m, s_.max(-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s_ - m_new)
            l = alpha * l + p.sum(-1, keepdims=True)
            o = alpha * o + jnp.einsum(
                "bhgqk,bhkd->bhgqd", p, v_blk.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            m = m_new
            if step < n_shards - 1:
                perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
                k_blk = jax.lax.ppermute(k_blk, axis, perm)
                v_blk = jax.lax.ppermute(v_blk, axis, perm)
                m_blk = jax.lax.ppermute(m_blk, axis, perm)

        out = o / jnp.maximum(l, 1e-30)
        return out.reshape(b, hq, s_loc, d).astype(q_loc.dtype)

    spec_q = P(None, None, axis, None)
    return shard_map(
        body,
        mesh=env.mesh,
        in_specs=(spec_q, spec_q, spec_q, P(None, axis)),
        out_specs=spec_q,
    )(q, k, v, kv_mask)


def ring_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    env: MeshEnv,
    causal: bool = True,
    sm_scale: float | None = None,
    axis: str = SEQUENCE_AXIS,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Ring attention with the Pallas flash kernel per rotation step.

    Each step runs the flash kernel over (local q, rotated kv) with a
    device-dependent ``causal_offset`` (a runtime SMEM scalar), then folds the
    block's (out, logsumexp) into the running result with the standard
    log-sum-exp merge.  Forward-only for now (the differentiable path is
    :func:`ring_attention`); intended for serving / long-sequence inference.
    """
    from phantom_vlb_tpu.ops.flash_attention import attention_with_stats

    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    n_shards = env.mesh.shape[axis]
    if n_shards == 1:
        from phantom_vlb_tpu.ops.flash_attention import attention

        return attention(q, k, v, causal=causal, sm_scale=sm_scale,
                         interpret=interpret)

    b, hq, s_global, d = q.shape
    s_loc = s_global // n_shards
    assert s_global % n_shards == 0

    def body(q_loc, k_loc, v_loc):
        idx = jax.lax.axis_index(axis)

        o = jnp.zeros(q_loc.shape, jnp.float32)
        lse = jnp.full((b, hq, s_loc), _NEG, jnp.float32)

        k_blk, v_blk = k_loc, v_loc
        for step in range(n_shards):
            src = (idx - step) % n_shards
            offset = ((idx - src) * s_loc).astype(jnp.int32)
            o_blk, lse_blk = attention_with_stats(
                q_loc, k_blk, v_blk, causal=causal, sm_scale=sm_scale,
                causal_offset=offset, interpret=interpret,
            )
            m = jnp.maximum(lse, lse_blk)
            w_old = jnp.exp(lse - m)
            w_new = jnp.exp(lse_blk - m)
            denom = jnp.maximum(w_old + w_new, 1e-30)
            o = (o * w_old[..., None]
                 + o_blk.astype(jnp.float32) * w_new[..., None]) / denom[..., None]
            lse = m + jnp.log(denom)
            if step < n_shards - 1:
                perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
                k_blk = jax.lax.ppermute(k_blk, axis, perm)
                v_blk = jax.lax.ppermute(v_blk, axis, perm)
        return o.astype(q_loc.dtype)

    spec = P(None, None, axis, None)
    return shard_map(
        body,
        mesh=env.mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        # pallas_call outputs carry no varying-mesh-axis metadata.
        check_vma=False,
    )(q, k, v)
