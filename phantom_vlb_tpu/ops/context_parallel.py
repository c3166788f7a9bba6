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

import numpy as np

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
    kv_mask: jnp.ndarray | None = None,   # (B, S) valid-token mask
    axis: str = SEQUENCE_AXIS,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Ring attention with the Pallas flash kernels — trainable.

    Forward: each rotation step runs the flash forward over (local q, rotated
    kv) with a device-dependent ``causal_offset`` (runtime SMEM scalar), and
    folds the block's (out, logsumexp) into the running result via the
    log-sum-exp merge.  Backward (custom VJP): kv blocks rotate again; every
    step reuses the Pallas dq/dkv kernels with the saved global (out, lse) —
    the flash decomposition makes per-block grads exact — and the dk/dv
    accumulators travel WITH their kv blocks, arriving home after a final
    rotation.  ``kv_mask`` rotates with its kv blocks on both passes.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    n_shards = env.mesh.shape[axis]
    if n_shards == 1:
        from phantom_vlb_tpu.ops.flash_attention import attention

        return attention(q, k, v, causal=causal, sm_scale=sm_scale,
                         kv_mask=kv_mask, interpret=interpret)
    if kv_mask is None:
        kv_mask = jnp.ones((q.shape[0], q.shape[2]), jnp.int32)
    rf = _make_ring_flash(env, causal, sm_scale, axis, interpret)
    return rf(q, k, v, kv_mask.astype(jnp.int32))


def _make_ring_flash(env, causal, sm_scale, axis, interpret):
    from phantom_vlb_tpu.ops.flash_attention import (
        MASK_VALUE,
        _bwd_impl,
        _pad_to,
        _pick_kv_block,
        attention_with_stats,
    )

    n_shards = env.mesh.shape[axis]
    spec = P(None, None, axis, None)
    spec_lse = P(None, None, axis)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def fwd_body(q_loc, k_loc, v_loc, mask_loc):
        idx = jax.lax.axis_index(axis)
        b, hq, s_loc, d = q_loc.shape

        o = jnp.zeros(q_loc.shape, jnp.float32)
        lse = jnp.full((b, hq, s_loc), _NEG, jnp.float32)

        k_blk, v_blk, m_blk = k_loc, v_loc, mask_loc
        for step in range(n_shards):
            src = (idx - step) % n_shards
            offset = ((idx - src) * s_loc).astype(jnp.int32)
            o_blk, lse_blk = attention_with_stats(
                q_loc, k_blk, v_blk, causal=causal, sm_scale=sm_scale,
                kv_mask=m_blk, causal_offset=offset, interpret=interpret,
            )
            m = jnp.maximum(lse, lse_blk)
            w_old = jnp.exp(lse - m)
            w_new = jnp.exp(lse_blk - m)
            denom = jnp.maximum(w_old + w_new, 1e-30)
            o = (o * w_old[..., None]
                 + o_blk.astype(jnp.float32) * w_new[..., None]) / denom[..., None]
            lse = m + jnp.log(denom)
            if step < n_shards - 1:
                k_blk = jax.lax.ppermute(k_blk, axis, perm)
                v_blk = jax.lax.ppermute(v_blk, axis, perm)
                m_blk = jax.lax.ppermute(m_blk, axis, perm)
        return o.astype(q_loc.dtype), lse

    def bwd_body(q_loc, k_loc, v_loc, mask_loc, o_loc, lse_loc, do_loc):
        idx = jax.lax.axis_index(axis)
        b, hq, s_loc, d = q_loc.shape
        bq = min(512, max(s_loc, 8))
        bk = _pick_kv_block(s_loc, 1664)
        skv_p = -(-s_loc // bk) * bk

        dq = jnp.zeros(q_loc.shape, jnp.float32)
        dk_blk = jnp.zeros(k_loc.shape, jnp.float32)
        dv_blk = jnp.zeros(v_loc.shape, jnp.float32)

        k_blk, v_blk, m_blk = k_loc, v_loc, mask_loc
        for step in range(n_shards):
            src = (idx - step) % n_shards
            offset = ((idx - src) * s_loc).astype(jnp.int32)
            maskp = _pad_to(m_blk[:, None, :], skv_p, 2)
            bias = jnp.where(maskp > 0, 0.0, MASK_VALUE).astype(jnp.float32)
            dq_b, dk_b, dv_b = _bwd_impl(
                q_loc, k_blk, v_blk, bias, True, o_loc, lse_loc, do_loc,
                causal, sm_scale, bq, bk,
                interpret if interpret is not None
                else jax.default_backend() != "tpu",
                offset,
            )
            dq = dq + dq_b.astype(jnp.float32)
            dk_blk = dk_blk + dk_b.astype(jnp.float32)
            dv_blk = dv_blk + dv_b.astype(jnp.float32)
            if step < n_shards - 1:
                k_blk = jax.lax.ppermute(k_blk, axis, perm)
                v_blk = jax.lax.ppermute(v_blk, axis, perm)
                m_blk = jax.lax.ppermute(m_blk, axis, perm)
                dk_blk = jax.lax.ppermute(dk_blk, axis, perm)
                dv_blk = jax.lax.ppermute(dv_blk, axis, perm)
        # One more rotation returns each dk/dv block to its home shard.
        dk_blk = jax.lax.ppermute(dk_blk, axis, perm)
        dv_blk = jax.lax.ppermute(dv_blk, axis, perm)
        return (
            dq.astype(q_loc.dtype),
            dk_blk.astype(k_loc.dtype),
            dv_blk.astype(v_loc.dtype),
        )

    spec_mask = P(None, axis)
    fwd_sm = shard_map(
        fwd_body, mesh=env.mesh,
        in_specs=(spec, spec, spec, spec_mask),
        out_specs=(spec, spec_lse),
        check_vma=False,
    )
    bwd_sm = shard_map(
        bwd_body, mesh=env.mesh,
        in_specs=(spec, spec, spec, spec_mask, spec, spec_lse, spec),
        out_specs=(spec, spec, spec),
        check_vma=False,
    )

    @jax.custom_vjp
    def rf(q, k, v, kv_mask):
        return fwd_sm(q, k, v, kv_mask)[0]

    def rf_fwd(q, k, v, kv_mask):
        out, lse = fwd_sm(q, k, v, kv_mask)
        return out, (q, k, v, kv_mask, out, lse)

    def rf_bwd(res, do):
        q, k, v, kv_mask, out, lse = res
        dq, dk, dv = bwd_sm(q, k, v, kv_mask, out, lse, do)
        # Integer mask: float0 cotangent (no gradient flows into a mask).
        dmask = np.zeros(kv_mask.shape, jax.dtypes.float0)
        return dq, dk, dv, dmask

    rf.defvjp(rf_fwd, rf_bwd)
    # Exposed for the fused-RDMA forward (ops/ring_fused.py), which reuses
    # this exact per-chunk backward against its own saved (out, lse).
    rf.bwd_sm = bwd_sm
    return rf
