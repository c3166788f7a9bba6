"""Fused ring flash attention: RDMA KV rotation overlapped with compute.

The existing ring implementations (ops/context_parallel.py) re-invoke the
flash kernel per rotation with ``jax.lax.ppermute`` between steps — XLA
serializes each collective against the next kernel launch.  This module is
the TPU-native fusion (VERDICT round 1, missing #5): ONE Pallas kernel per
device owns the whole ring pass, forwarding KV chunks to the right neighbor
with ``pltpu.make_async_remote_copy`` while the MXU computes attention
against the chunk that already arrived.

Design ("forwarding all-gather ring"):
- grid = (B, Hq, nq, n_devices) with the ring step r innermost;
- step r consumes the chunk from device ``(my_id - r) % n``; chunk r=0 is the
  local KV (read straight from the input); chunks r>=1 land in an HBM
  scratch slot, filled by the left neighbor's RDMA;
- the FIRST grid cell of each step waits on that slot's recv semaphore and
  immediately forwards the chunk to the right neighbor — so the whole ring
  circulation is driven during the first q-tile's sweep and every other
  tile computes wait-free while later chunks are still in flight;
- causal masking works on GLOBAL positions: chunks from devices after mine
  are skipped entirely (predicated out), the diagonal chunk gets the in-chunk
  triangle, earlier chunks are unmasked; the kv padding mask enters as a
  pre-gathered additive bias arranged in arrival order;
- forward only: the backward reuses the per-step ppermute ring
  (context_parallel.bwd semantics) via custom_vjp in ``ring_flash_fused``.

Verified in Pallas TPU *interpret* mode (which simulates remote DMAs and
semaphores on CPU) over a shard_map'd virtual mesh — the same path the
driver's dryrun exercises.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from phantom_vlb_tpu.ops.flash_attention import MASK_VALUE, _causal_add, _rows8

__all__ = ["ring_flash_fused", "ring_fwd_sharded"]


def _ring_fwd_kernel(
    # scalar prefetch
    my_id_ref,
    # inputs
    q_ref,            # VMEM block (1, 1, bq, D), pre-scaled by sm_scale
    k_loc_ref,        # ANY (B, Hkv, S_loc, D)
    v_loc_ref,        # ANY (B, Hkv, S_loc, D)
    bias_ref,         # VMEM block (1, 1, S_loc) f32, arrival-order chunk r
    # outputs
    o_ref,            # VMEM block (1, 1, bq, D)
    lse_ref,          # VMEM block (1, 1, bq, 128)
    k_all, v_all,     # ANY (n-1, B, Hkv, S_loc, D) — ring landing buffers.
                      # Declared as outputs (discarded) rather than scratch:
                      # interpret mode only supports ANY-space kernel args
                      # that are pallas_call inputs/outputs.
    # scratch
    k_vmem, v_vmem,   # VMEM (S_loc, D)
    m_scr, l_scr, acc_scr,
    k_send, k_recv, v_send, v_recv,   # DMA sems (n-1,)
    local_sem,                        # DMA sems (2,)
    *, causal, group, n, bq, s_loc, ring_axis,
):
    b, h, qi, r = (pl.program_id(i) for i in range(4))
    nq = pl.num_programs(2)
    my = my_id_ref[0]
    hkv = h // group
    # Right neighbor addressed PER MESH AXIS ({ring_axis: idx}, MESH device
    # id): the ring spans only the sequence axis, and on a multi-axis mesh
    # (fsdp x sequence, the production layout) every other coordinate must
    # stay this device's own.  The previous code passed the bare sequence
    # index as a LOGICAL id, which cross-wired rings across fsdp rows and
    # deadlocked (round-3 fix; caught by the extended driver dryrun).
    right = {ring_axis: jax.lax.rem(my + 1, n)}

    first_cell = (b == 0) & (h == 0) & (qi == 0)

    # ---- ring driving (first cell of each step only) ----
    @pl.when(first_cell & (r >= 1))
    def _():
        # chunk r lands in slot r-1, sent by the left neighbor
        pltpu.make_async_remote_copy(
            k_all.at[r - 1], k_all.at[r - 1],
            k_send.at[r - 1], k_recv.at[r - 1], device_id=right,
            device_id_type=pltpu.DeviceIdType.MESH,
        ).wait_recv()
        pltpu.make_async_remote_copy(
            v_all.at[r - 1], v_all.at[r - 1],
            v_send.at[r - 1], v_recv.at[r - 1], device_id=right,
            device_id_type=pltpu.DeviceIdType.MESH,
        ).wait_recv()

    @pl.when(first_cell & (r == 0) & (n > 1))
    def _():
        # step 0: forward OUR chunk into the neighbor's slot 0
        pltpu.make_async_remote_copy(
            k_loc_ref, k_all.at[0], k_send.at[0], k_recv.at[0],
            device_id=right, device_id_type=pltpu.DeviceIdType.MESH,
        ).start()
        pltpu.make_async_remote_copy(
            v_loc_ref, v_all.at[0], v_send.at[0], v_recv.at[0],
            device_id=right, device_id_type=pltpu.DeviceIdType.MESH,
        ).start()

    @pl.when(first_cell & (r >= 1) & (r < n - 1))
    def _():
        # forward the just-arrived chunk r (slot r-1) into neighbor slot r
        pltpu.make_async_remote_copy(
            k_all.at[r - 1], k_all.at[r], k_send.at[r], k_recv.at[r],
            device_id=right, device_id_type=pltpu.DeviceIdType.MESH,
        ).start()
        pltpu.make_async_remote_copy(
            v_all.at[r - 1], v_all.at[r], v_send.at[r], v_recv.at[r],
            device_id=right, device_id_type=pltpu.DeviceIdType.MESH,
        ).start()

    # ---- fetch the chunk for this cell into VMEM ----
    @pl.when(r == 0)
    def _():
        cp_k = pltpu.make_async_copy(
            k_loc_ref.at[b, hkv], k_vmem, local_sem.at[0]
        )
        cp_v = pltpu.make_async_copy(
            v_loc_ref.at[b, hkv], v_vmem, local_sem.at[1]
        )
        cp_k.start(); cp_v.start(); cp_k.wait(); cp_v.wait()

    @pl.when(r >= 1)
    def _():
        cp_k = pltpu.make_async_copy(
            k_all.at[r - 1, b, hkv], k_vmem, local_sem.at[0]
        )
        cp_v = pltpu.make_async_copy(
            v_all.at[r - 1, b, hkv], v_vmem, local_sem.at[1]
        )
        cp_k.start(); cp_v.start(); cp_k.wait(); cp_v.wait()

    # ---- flash update ----
    @pl.when(r == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    src = jax.lax.rem(my - r + n, n)
    run = True
    if causal:
        run = src <= my

    @pl.when(run)
    def _():
        q = q_ref[0, 0]
        s = jax.lax.dot_general(
            q, k_vmem[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + bias_ref[0, 0:1, :]
        if causal:
            # in-chunk triangle only on the diagonal chunk (src == my);
            # earlier chunks are fully visible.
            diag_add = jnp.where(
                src == my,
                _causal_add(jnp.zeros_like(s), qi, 0, 0, bq, s_loc),
                0.0,
            )
            s = s + diag_add

        m_prev = m_scr[:, :1]
        l_prev = l_scr[:, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v_vmem.dtype), v_vmem[...],
            preferred_element_type=jnp.float32,
        )

    @pl.when(r == n - 1)
    def _():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        lse = m_scr[:, :1] + jnp.log(jnp.maximum(l, 1e-30))
        # Transposed dense stat layout (S minor) — see flash_attention._rows8.
        lse_ref[0, 0] = _rows8(lse)

    # ---- drain send semaphores at the very last cell ----
    last_cell = (b == pl.num_programs(0) - 1) & (h == pl.num_programs(1) - 1) \
        & (qi == nq - 1) & (r == n - 1)

    @pl.when(last_cell & (n > 1))
    def _():
        # Every issued send must be awaited before kernel exit; they all
        # completed long ago (the ring was driven during the first q tile).
        for step in range(n - 1):
            pltpu.make_async_remote_copy(
                k_all.at[0], k_all.at[0], k_send.at[step], k_recv.at[step],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.MESH,
            ).wait_send()
            pltpu.make_async_remote_copy(
                v_all.at[0], v_all.at[0], v_send.at[step], v_recv.at[step],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.MESH,
            ).wait_send()


def ring_fwd_sharded(
    q, k, v, kv_mask, mesh, axis: str,
    *, causal=True, sm_scale=None, block_q: int = 512, interpret=False,
):
    """shard_map'd fused ring forward. Shapes are GLOBAL (B, H, S, D);
    q/k/v sharded over ``axis`` on S. Returns (out, lse) with the same
    sharding. ``interpret=True`` uses Pallas TPU interpret mode (simulated
    RDMA on CPU)."""
    from jax import shard_map

    n = mesh.shape[axis]
    b, hq, s_total, d = q.shape
    hkv = k.shape[1]
    group = hq // hkv
    s_loc = s_total // n
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if kv_mask is None:
        kv_mask = jnp.ones((b, s_total), jnp.int32)
    bias_all = jnp.where(kv_mask > 0, 0.0, MASK_VALUE).astype(jnp.float32)

    bq = min(block_q, s_loc)
    nq = s_loc // bq

    def per_device(q_loc, k_loc, v_loc, bias_full):
        my = jax.lax.axis_index(axis).astype(jnp.int32)
        # arrival order: chunk r comes from device (my - r) % n
        order = jnp.mod(my - jnp.arange(n, dtype=jnp.int32), n)
        bias_arr = bias_full.reshape(b, n, s_loc)[:, order]  # (B, n, S_loc)

        qp = (q_loc * jnp.asarray(sm_scale, q_loc.dtype))

        kernel = functools.partial(
            _ring_fwd_kernel, causal=causal, group=group, n=n,
            bq=bq, s_loc=s_loc, ring_axis=axis,
        )
        # NB: with scalar prefetch, index maps receive the scalar refs
        # appended after the grid indices — absorb them with *_.
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, hq, nq, n),
            in_specs=[
                pl.BlockSpec((1, 1, bq, d), lambda b_, h, i, r, *_: (b_, h, i, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 1, s_loc), lambda b_, h, i, r, *_: (b_, r, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, bq, d), lambda b_, h, i, r, *_: (b_, h, i, 0)),
                pl.BlockSpec((1, 1, 8, bq), lambda b_, h, i, r, *_: (b_, h, 0, i)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((s_loc, d), k.dtype),
                pltpu.VMEM((s_loc, d), v.dtype),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
                pltpu.SemaphoreType.DMA((max(n - 1, 1),)),
                pltpu.SemaphoreType.DMA((max(n - 1, 1),)),
                pltpu.SemaphoreType.DMA((max(n - 1, 1),)),
                pltpu.SemaphoreType.DMA((max(n - 1, 1),)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out, lse, _, _ = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((b, hq, s_loc, d), q.dtype),
                jax.ShapeDtypeStruct((b, hq, 8, s_loc), jnp.float32),
                jax.ShapeDtypeStruct((max(n - 1, 1), b, hkv, s_loc, d), k.dtype),
                jax.ShapeDtypeStruct((max(n - 1, 1), b, hkv, s_loc, d), v.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) * 4,
                collective_id=7,
            ),
            interpret=(
                interpret if isinstance(interpret, pltpu.InterpretParams)
                else (pltpu.InterpretParams() if interpret else False)
            ),
        )(my.reshape(1), qp, k_loc, v_loc, bias_arr)
        return out, lse[:, :, 0, :]

    spec = P(None, None, axis, None)
    return shard_map(
        per_device, mesh=mesh,
        in_specs=(spec, spec, spec, P(None, None)),
        out_specs=(spec, P(None, None, axis)),
        check_vma=False,
    )(q, k, v, bias_all)


def ring_flash_fused(
    q, k, v, mesh, axis: str = "sequence",
    *, causal=True, sm_scale=None, kv_mask=None, interpret=None,
):
    """Trainable fused-ring attention: fused RDMA forward + the existing
    per-step ring backward (exact flash decomposition, context_parallel)."""
    from phantom_vlb_tpu.ops import context_parallel as cp

    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    if mesh.shape[axis] == 1:
        from phantom_vlb_tpu.ops.flash_attention import attention

        return attention(q, k, v, causal=causal, sm_scale=sm_scale,
                         kv_mask=kv_mask, interpret=interpret)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if kv_mask is None:
        kv_mask = jnp.ones((q.shape[0], q.shape[2]), jnp.int32)
    kv_mask = kv_mask.astype(jnp.int32)

    class _Env:
        pass

    env = _Env()
    env.mesh = mesh
    ring = cp._make_ring_flash(env, causal, sm_scale, axis, interpret)

    @jax.custom_vjp
    def rf(q, k, v, kv_mask):
        out, _ = ring_fwd_sharded(
            q, k, v, kv_mask, mesh, axis, causal=causal, sm_scale=sm_scale,
            interpret=interpret,
        )
        return out

    def rf_fwd(q, k, v, kv_mask):
        out, lse = ring_fwd_sharded(
            q, k, v, kv_mask, mesh, axis, causal=causal, sm_scale=sm_scale,
            interpret=interpret,
        )
        return out, (q, k, v, kv_mask, out, lse)

    def rf_bwd(res, do):
        # Exact per-chunk backward via the ppermute ring (same flash
        # decomposition, shared (out, lse) residuals).
        q, k, v, kv_mask, out, lse = res
        dq, dk, dv = ring.bwd_sm(q, k, v, kv_mask, out, lse, do)
        import numpy as np

        dmask = np.zeros(kv_mask.shape, jax.dtypes.float0)
        return dq, dk, dv, dmask

    rf.defvjp(rf_fwd, rf_bwd)
    return rf(q, k, v, kv_mask)
