"""Flash attention for TPU (Pallas) with XLA reference fallback.

Replaces the reference's CUDA flash-attention-2 dependency
(``_attn_implementation="flash_attention_2"``, litmodule.py:71-72) for the
~3230-token multimodal sequences of the Mistral blocks.

Design (see /opt/skills/guides/boom_attention_tricks.md):
- online softmax, (block_q x block_kv) tiles, fp32 statistics in VMEM scratch;
- GQA handled in the BlockSpec index maps (kv head = q head // group) — K/V are
  never materialized at query-head multiplicity;
- causal masking skips whole KV tiles above the diagonal; an optional
  per-token ``kv_mask`` (B, Skv) handles padding (the reference's
  ``attention_mask = lang.ne(0)``, litmodule.py:271);
- custom VJP: forward saves (out, logsumexp); backward runs two kernels —
  dq (grid over q tiles, loop kv) and dk/dv (grid over kv tiles, loop
  group x q tiles) — so the (S, S) score matrix is never materialized;
- TWO array layouts served by the SAME kernels (the kernel bodies only ever
  see (bq, d)/(bk, d) tiles; only the BlockSpec index maps differ):
  * ``attention``: the conventional (B, H, S, D) API (ring/CP building block,
    XLA fallback parity) — flattened to (B*H, S, D) bitcasts internally;
  * ``attention_packed``: q/k/v/out as (B, S, H*D) — the layout the
    surrounding projection GEMMs already produce/consume.  Each head is a
    128-lane slice at offset h*128 (tile-aligned, so blocks DMA densely).
    This removes the physical (B,S,H,D)<->(B,H,S,D) transposes XLA
    otherwise inserts around every attention call — measured ~150 ms/step
    of relayout copies at the VLB production geometry (round 4), some of
    them in f32 because the o_proj quant chain's convert_element_type got
    fused ahead of the copy.

VPU-economy details (round 2; the kernels are softmax/mask bound, not MXU
bound, at the VLB geometry):
- q is pre-scaled by ``sm_scale`` outside the kernels (one pass over Q
  instead of one multiply over every (bq, bk) score tile);
- the kv mask enters as a PRECOMPUTED additive f32 bias row (0 / MASK_VALUE),
  one add per tile instead of compare+and+select;
- the causal mask compares 1D broadcast iotas ((bq,1) vs (1,bk)) — one
  fused compare-select pass per tile instead of two full 2D iotas + compares.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["attention", "attention_packed", "xla_attention"]

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


# ---------------------------------------------------------------------------
# XLA reference implementation (also the CPU fallback).
# ---------------------------------------------------------------------------
def xla_attention(q, k, v, *, causal=True, sm_scale=None, kv_mask=None):
    """O = softmax(Q K^T / sqrt(d)) V with GQA; shapes (B,H,S,D)/(B,Hkv,S,D)."""
    b, hq, sq, d = q.shape
    hkv = k.shape[1]
    group = hq // hkv
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    qg = q.reshape(b, hkv, group, sq, d)
    s = jnp.einsum("bhgqd,bhkd->bhgqk", qg, k, preferred_element_type=jnp.float32)
    s = s * sm_scale

    skv = k.shape[2]
    mask = jnp.ones((sq, skv), bool)
    if causal:
        mask = jnp.tril(jnp.ones((sq, skv), bool), k=skv - sq)
    mask = mask[None, None, None]
    if kv_mask is not None:
        mask = mask & (kv_mask[:, None, None, None, :] > 0)
    s = jnp.where(mask, s, MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgqk,bhkd->bhgqd", p.astype(v.dtype), v)
    return out.reshape(b, hq, sq, d)


# ---------------------------------------------------------------------------
# Pallas kernels.
# ---------------------------------------------------------------------------
def _causal_add(s, qi, ki, offset, bq, bk):
    """s + (MASK_VALUE where col > row + offset), via 1D broadcast iotas."""
    row = jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0) + (qi * bq + offset)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1) + (ki * bk)
    return s + jnp.where(col > row, MASK_VALUE, 0.0)


def _fwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, offset_ref, o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, causal, has_bias, nk, bq, bk,
):
    qi, ki = pl.program_id(2), pl.program_id(3)
    offset = offset_ref[0]

    @pl.when(ki == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    run = True
    if causal:
        run = ((qi + 1) * bq - 1 + offset) >= (ki * bk)

    @pl.when(run)
    def _():
        q = q_ref[0]             # pre-scaled by sm_scale
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if has_bias:
            s = s + bias_ref[0, 0:1, :]          # (1, bk) additive bias
        if causal:
            s = _causal_add(s, qi, ki, offset, bq, bk)

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
            p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
        )

    @pl.when(ki == nk - 1)
    def _():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        lse = m_scr[:, :1] + jnp.log(jnp.maximum(l, 1e-30))
        lse_ref[0, 0] = _rows8(lse)


def _rows8(col):
    """(bq, 1) f32 column -> (8, bq) rows, transpose-free.

    The per-row softmax stats (lse, di) are stored TRANSPOSED as
    (B, H, 8, S) f32 so that S sits in the minor (lane) dimension: TPU
    tiled layouts pad the minor dim to 128 lanes, so the naive (B, H, S, k)
    form occupies 128-lane tiles regardless of k (measured: the (..., 8)
    variant was byte-identical to (..., 128) and saved nothing).  The
    transposed form is dense — 16x less HBM traffic on the stats the
    backward reads twice per layer.  The sublane broadcast is an MXU outer
    product (ones(8,1) x col^T), avoiding an in-kernel relayout transpose.
    """
    ones = jnp.ones((8, 1), jnp.float32)
    return jax.lax.dot_general(
        ones, col, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _col8(rows):
    """(8, bq) identical rows -> (bq, 1) column, transpose-free.

    Contracts the 8 sublanes against a constant 1/8 vector on the MXU:
    sum of 8 identical f32 values is exactly 8x (power-of-two), so the
    round trip through :func:`_rows8` is bit-exact.
    """
    eighth = jnp.full((8, 1), 0.125, jnp.float32)
    return jax.lax.dot_general(
        rows, eighth, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dq_kernel(
    q_ref, k_ref, v_ref, bias_ref, offset_ref, do_ref, lse_ref, di_ref, dq_ref,
    dq_scr,
    *, causal, has_bias, sm_scale, nk, bq, bk,
):
    qi, ki = pl.program_id(2), pl.program_id(3)
    offset = offset_ref[0]

    @pl.when(ki == 0)
    def _():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    run = True
    if causal:
        run = ((qi + 1) * bq - 1 + offset) >= (ki * bk)

    @pl.when(run)
    def _():
        q = q_ref[0]             # pre-scaled
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]           # kept bf16: MXU operand (f32 x f32 dots run
        #                          at a fraction of the bf16 MXU rate)
        lse = _col8(lse_ref[0, 0])           # (8, bq) -> (bq, 1)
        di = _col8(di_ref[0, 0])

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if has_bias:
            s = s + bias_ref[0, 0:1, :]
        if causal:
            s = _causal_add(s, qi, ki, offset, bq, bk)

        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - di)
        dq_scr[...] += jax.lax.dot(
            ds.astype(q.dtype), k, preferred_element_type=jnp.float32
        )

    @pl.when(ki == nk - 1)
    def _():
        # d(s)/d(q_unscaled) carries sm_scale once, applied in the epilogue.
        dq_ref[0] = (dq_scr[...] * sm_scale).astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, bias_ref, offset_ref, do_ref, lse_ref, di_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, causal, has_bias, group, nq, bq, bk,
):
    # grid: (B, Hkv, nk, group, nq)
    ki, gi, qi = pl.program_id(2), pl.program_id(3), pl.program_id(4)
    offset = offset_ref[0]

    @pl.when((gi == 0) & (qi == 0))
    def _():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    run = True
    if causal:
        run = ((qi + 1) * bq - 1 + offset) >= (ki * bk)

    @pl.when(run)
    def _():
        q = q_ref[0]             # pre-scaled: dk = ds^T @ q_scaled needs no factor
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]           # bf16 MXU operand (see _dq_kernel)
        lse = _col8(lse_ref[0, 0])
        di = _col8(di_ref[0, 0])

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if has_bias:
            s = s + bias_ref[0, 0:1, :]
        if causal:
            s = _causal_add(s, qi, ki, offset, bq, bk)

        p = jnp.exp(s - lse)                                   # (bq, bk)
        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - di)                                     # (bq, bk)
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when((gi == group - 1) & (qi == nq - 1))
    def _():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _dq_dkv_kernel(
    q_ref, k_ref, v_ref, bias_ref, offset_ref, do_ref, lse_ref, di_ref,
    dq_ref, dk_ref, dv_ref,
    dq_scr, dk_scr, dv_scr,
    *, causal, has_bias, sm_scale, group, nq, nk, bq, bk,
):
    """Fused backward: one pass computes s/p/ds once and emits dq, dk, dv.

    The separate dq/dkv kernels each rebuild s and p (7 matmuls total per
    block pair); this kernel does the 5-matmul minimum. dk/dv accumulate in
    a full-length VMEM scratch (skv_p x d f32 each) so the kv-block axis can
    sit innermost, which lets dq accumulate in its output window.

    grid: (B, Hkv, group, nq, nk) — kv blocks innermost.
    """
    gi, qi, ki = pl.program_id(2), pl.program_id(3), pl.program_id(4)
    offset = offset_ref[0]

    @pl.when((gi == 0) & (qi == 0) & (ki == 0))
    def _():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    @pl.when(ki == 0)
    def _():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    run = True
    if causal:
        run = ((qi + 1) * bq - 1 + offset) >= (ki * bk)

    @pl.when(run)
    def _():
        q = q_ref[0]             # pre-scaled by sm_scale
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]           # bf16 MXU operand
        lse = _col8(lse_ref[0, 0])
        di = _col8(di_ref[0, 0])

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if has_bias:
            s = s + bias_ref[0, 0:1, :]
        if causal:
            s = _causal_add(s, qi, ki, offset, bq, bk)

        p = jnp.exp(s - lse)                                   # (bq, bk)
        ks = pl.ds(ki * bk, bk)
        dv_scr[ks, :] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - di)).astype(q.dtype)                   # (bq, bk)
        dk_scr[ks, :] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_scr[...] += jax.lax.dot(ds, k, preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _():
        dq_ref[0] = (dq_scr[...] * sm_scale).astype(dq_ref.dtype)

    @pl.when((gi == group - 1) & (qi == nq - 1) & (ki == nk - 1))
    def _():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Wrappers.
# ---------------------------------------------------------------------------
def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _kv_bias(kv_mask, b, skv, skv_p):
    """(B, 1, skv_p) additive f32 bias (0 valid / MASK_VALUE masked), or None."""
    if kv_mask is None and skv_p == skv:
        return None
    if kv_mask is None:
        maskp = jnp.ones((b, 1, skv_p), jnp.int32).at[:, :, skv:].set(0)
    else:
        maskp = _pad_to(kv_mask.astype(jnp.int32)[:, None, :], skv_p, 2)
    return jnp.where(maskp > 0, 0.0, MASK_VALUE).astype(jnp.float32)


def _qkv_specs(packed, hq, hkv, group, bq, bk, d):
    """(q, k, v) in_specs + the q-shaped out_spec for a (b, hq, nq, nk) grid.

    packed: arrays are (B, S, H*D); each head is the 128-lane slice at
    h*128 (block index h on the minor dim — tile-aligned, dense DMA).
    unpacked: arrays are flattened (B*H, S, D) bitcasts of (B, H, S, D).
    """
    if packed:
        q_spec = pl.BlockSpec((1, bq, d), lambda b_, h, i, j: (b_, i, h))
        kv_spec = pl.BlockSpec(
            (1, bk, d), lambda b_, h, i, j, g=group: (b_, j, h // g)
        )
    else:
        q_spec = pl.BlockSpec(
            (1, bq, d), lambda b_, h, i, j, H=hq: (b_ * H + h, i, 0)
        )
        kv_spec = pl.BlockSpec(
            (1, bk, d),
            lambda b_, h, i, j, g=group, H=hkv: (b_ * H + h // g, j, 0),
        )
    return q_spec, kv_spec


def _split_heads(x, heads):
    """(B, H, S, D) -> (B*H, S, D) bitcast (row-major; no data movement)."""
    b, h, s, d = x.shape
    assert h == heads
    return x.reshape(b * h, s, d)


def _fwd_impl(q, k, v, kv_mask, causal, sm_scale, bq, bk, interpret, offset=0,
              heads=None):
    """Forward pallas call.

    heads=None: q (B, Hq, S, D), k/v (B, Hkv, Skv, D) — the conventional API.
    heads=(hq, hkv): q (B, S, Hq*D), k/v (B, Skv, Hkv*D) packed layout; out
    comes back (B, Sq, Hq*D).  Same kernels either way (only index maps
    differ), so parity between the two is structural.
    """
    packed = heads is not None
    if packed:
        hq, hkv = heads
        b, sq = q.shape[0], q.shape[1]
        d = q.shape[2] // hq
        skv = k.shape[1]
    else:
        b, hq, sq, d = q.shape
        hkv, skv = k.shape[1], k.shape[2]
    group = hq // hkv
    nq = pl.cdiv(sq, bq)
    nk = pl.cdiv(skv, bk)
    sq_p, skv_p = nq * bq, nk * bk

    seq_axis = 1 if packed else 2
    qp = _pad_to(q, sq_p, seq_axis) * jnp.asarray(sm_scale, q.dtype)
    kp = _pad_to(k, skv_p, seq_axis)
    vp = _pad_to(v, skv_p, seq_axis)
    if not packed:
        qp = _split_heads(qp, hq)
        kp = _split_heads(kp, hkv)
        vp = _split_heads(vp, hkv)
    bias = _kv_bias(kv_mask, b, skv, skv_p)
    has_bias = bias is not None
    if not has_bias:
        bias = jnp.zeros((b, 1, skv_p), jnp.float32)

    offset_arr = jnp.asarray(offset, jnp.int32).reshape(1)
    kernel = functools.partial(
        _fwd_kernel, causal=causal, has_bias=has_bias, nk=nk, bq=bq, bk=bk,
    )
    q_spec, kv_spec = _qkv_specs(packed, hq, hkv, group, bq, bk, d)
    o_shape = (b, sq_p, hq * d) if packed else (b * hq, sq_p, d)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, hq, nq, nk),
        in_specs=[
            q_spec,
            kv_spec,
            kv_spec,
            pl.BlockSpec((1, 1, bk), lambda b_, h, i, j: (b_, 0, j)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            _qkv_specs(packed, hq, hkv, group, bq, bk, d)[0],
            pl.BlockSpec((1, 1, 8, bq), lambda b_, h, i, j: (b_, h, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(o_shape, q.dtype),
            # Transposed dense stat layout — see _rows8.
            jax.ShapeDtypeStruct((b, hq, 8, sq_p), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, bias, offset_arr)
    if packed:
        out = out[:, :sq]
    else:
        out = out.reshape(b, hq, sq_p, d)[:, :, :sq]
    return out, lse[:, :, 0, :sq], bias, has_bias


def _bwd_impl(
    q, k, v, bias, has_bias, o, lse, do, causal, sm_scale, bq, bk,
    interpret, offset=0, heads=None,
):
    packed = heads is not None
    if packed:
        hq, hkv = heads
        b, sq = q.shape[0], q.shape[1]
        d = q.shape[2] // hq
        skv = k.shape[1]
    else:
        b, hq, sq, d = q.shape
        hkv, skv = k.shape[1], k.shape[2]
    group = hq // hkv
    nq = pl.cdiv(sq, bq)
    nk = pl.cdiv(skv, bk)
    sq_p, skv_p = nq * bq, nk * bk

    seq_axis = 1 if packed else 2
    qp = _pad_to(q, sq_p, seq_axis) * jnp.asarray(sm_scale, q.dtype)
    kp = _pad_to(k, skv_p, seq_axis)
    vp = _pad_to(v, skv_p, seq_axis)
    dop = _pad_to(do, sq_p, seq_axis)
    op = _pad_to(o, sq_p, seq_axis)

    # Transposed dense (B, H, 8, Sp) f32 stats — S minor avoids the 128-lane
    # tile padding that made the naive (..., S, k) forms cost 16x their
    # payload in HBM traffic (see _rows8).
    if packed:
        # Per-head row dot from the (B, S, H*D) layout: reduce each head's
        # 128-lane slice, then move the (small, (B, S, H) f32) result to
        # head-major — the only physical transpose left on this path.
        di = jnp.sum(
            (op.astype(jnp.float32) * dop.astype(jnp.float32)).reshape(
                b, sq_p, hq, d
            ),
            axis=-1,
        ).transpose(0, 2, 1)
    else:
        di = jnp.sum(op.astype(jnp.float32) * dop.astype(jnp.float32), axis=-1)
    di = jnp.broadcast_to(di[:, :, None, :], (b, hq, 8, sq_p))
    lsep = jnp.broadcast_to(
        _pad_to(lse, sq_p, 2)[:, :, None, :], (b, hq, 8, sq_p)
    )

    if not packed:
        qp = _split_heads(qp, hq)
        kp = _split_heads(kp, hkv)
        vp = _split_heads(vp, hkv)
        dop = _split_heads(dop, hq)

    offset_arr = jnp.asarray(offset, jnp.int32).reshape(1)

    # Fused dq+dkv kernel: needs 2 x (skv_p x d) f32 VMEM scratch for the
    # dk/dv accumulators. Use it whenever that scratch is modest; fall back
    # to the separate kernels for very long kv (ring shards stay short, and
    # the production seq is 2048, so the fused path is the common case).
    if packed:
        q_spec5 = pl.BlockSpec(
            (1, bq, d), lambda b_, h, g, i, j, G=group: (b_, i, h * G + g)
        )
        kv_spec5 = pl.BlockSpec((1, bk, d), lambda b_, h, g, i, j: (b_, j, h))
        dkv_spec5 = pl.BlockSpec(
            (1, skv_p, d), lambda b_, h, g, i, j: (b_, 0, h)
        )
        dq_shape = (b, sq_p, hq * d)
        dkv_shape = (b, skv_p, hkv * d)
    else:
        q_spec5 = pl.BlockSpec(
            (1, bq, d),
            lambda b_, h, g, i, j, G=group, H=hq: (b_ * H + h * G + g, i, 0),
        )
        kv_spec5 = pl.BlockSpec(
            (1, bk, d), lambda b_, h, g, i, j, H=hkv: (b_ * H + h, j, 0)
        )
        dkv_spec5 = pl.BlockSpec(
            (1, skv_p, d), lambda b_, h, g, i, j, H=hkv: (b_ * H + h, 0, 0)
        )
        dq_shape = (b * hq, sq_p, d)
        dkv_shape = (b * hkv, skv_p, d)
    stat_spec5 = pl.BlockSpec(
        (1, 1, 8, bq), lambda b_, h, g, i, j, G=group: (b_, h * G + g, 0, i)
    )

    def _unpack(dq, dk, dv):
        if packed:
            return dq[:, :sq], dk[:, :skv], dv[:, :skv]
        return (
            dq.reshape(b, hq, sq_p, d)[:, :, :sq],
            dk.reshape(b, hkv, skv_p, d)[:, :, :skv],
            dv.reshape(b, hkv, skv_p, d)[:, :, :skv],
        )

    if skv_p * d * 8 <= 4 * 1024 * 1024:
        fused_kernel = functools.partial(
            _dq_dkv_kernel, causal=causal, has_bias=has_bias,
            sm_scale=sm_scale, group=group, nq=nq, nk=nk, bq=bq, bk=bk,
        )
        dq, dk, dv = pl.pallas_call(
            fused_kernel,
            grid=(b, hkv, group, nq, nk),
            in_specs=[
                q_spec5,
                kv_spec5,
                kv_spec5,
                pl.BlockSpec((1, 1, bk), lambda b_, h, g, i, j: (b_, 0, j)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                q_spec5,
                stat_spec5,
                stat_spec5,
            ],
            out_specs=[q_spec5, dkv_spec5, dkv_spec5],
            out_shape=[
                jax.ShapeDtypeStruct(dq_shape, q.dtype),
                jax.ShapeDtypeStruct(dkv_shape, k.dtype),
                jax.ShapeDtypeStruct(dkv_shape, v.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, d), jnp.float32),
                pltpu.VMEM((skv_p, d), jnp.float32),
                pltpu.VMEM((skv_p, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "parallel", "parallel", "arbitrary", "arbitrary", "arbitrary",
                ),
            ),
            interpret=interpret,
        )(qp, kp, vp, bias, offset_arr, dop, lsep, di)
        return _unpack(dq, dk, dv)

    q_spec4, kv_spec4 = _qkv_specs(packed, hq, hkv, group, bq, bk, d)
    dq_kernel = functools.partial(
        _dq_kernel, causal=causal, has_bias=has_bias, sm_scale=sm_scale,
        nk=nk, bq=bq, bk=bk,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, hq, nq, nk),
        in_specs=[
            q_spec4,
            kv_spec4,
            kv_spec4,
            pl.BlockSpec((1, 1, bk), lambda b_, h, i, j: (b_, 0, j)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            q_spec4,
            pl.BlockSpec((1, 1, 8, bq), lambda b_, h, i, j: (b_, h, 0, i)),
            pl.BlockSpec((1, 1, 8, bq), lambda b_, h, i, j: (b_, h, 0, i)),
        ],
        out_specs=_qkv_specs(packed, hq, hkv, group, bq, bk, d)[0],
        out_shape=jax.ShapeDtypeStruct(dq_shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, bias, offset_arr, dop, lsep, di)

    # dkv grid is (b, hkv, nk, group, nq) — kv blocks in the PARALLEL slot.
    if packed:
        q_specd = pl.BlockSpec(
            (1, bq, d), lambda b_, h, j, g, i, G=group: (b_, i, h * G + g)
        )
        kv_specd = pl.BlockSpec((1, bk, d), lambda b_, h, j, g, i: (b_, j, h))
    else:
        q_specd = pl.BlockSpec(
            (1, bq, d),
            lambda b_, h, j, g, i, G=group, H=hq: (b_ * H + h * G + g, i, 0),
        )
        kv_specd = pl.BlockSpec(
            (1, bk, d), lambda b_, h, j, g, i, H=hkv: (b_ * H + h, j, 0)
        )
    stat_specd = pl.BlockSpec(
        (1, 1, 8, bq), lambda b_, h, j, g, i, G=group: (b_, h * G + g, 0, i)
    )
    dkv_kernel = functools.partial(
        _dkv_kernel, causal=causal, has_bias=has_bias,
        group=group, nq=nq, bq=bq, bk=bk,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, hkv, nk, group, nq),
        in_specs=[
            q_specd,
            kv_specd,
            kv_specd,
            pl.BlockSpec((1, 1, bk), lambda b_, h, j, g, i: (b_, 0, j)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            q_specd,
            stat_specd,
            stat_specd,
        ],
        out_specs=[kv_specd, kv_specd],
        out_shape=[
            jax.ShapeDtypeStruct(dkv_shape, k.dtype),
            jax.ShapeDtypeStruct(dkv_shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, bias, offset_arr, dop, lsep, di)

    return _unpack(dq, dk, dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash(q, k, v, kv_mask, offset, causal, sm_scale, bq, bk, interpret):
    out, _, _, _ = _fwd_impl(
        q, k, v, kv_mask, causal, sm_scale, bq, bk, interpret, offset
    )
    return out


def _flash_fwd(q, k, v, kv_mask, offset, causal, sm_scale, bq, bk, interpret):
    out, lse, bias, has_bias = _fwd_impl(
        q, k, v, kv_mask, causal, sm_scale, bq, bk, interpret, offset
    )
    # Named so a jax.checkpoint policy (mistral._remat_policy "flash") can
    # SAVE the forward kernel's outputs: with both (out, lse) stored, the
    # backward's residuals are complete and the remat pass never re-runs the
    # flash forward kernel (~92 ms/step at the VLB geometry, round 4).
    out = jax.ad_checkpoint.checkpoint_name(out, "flash_out")
    lse = jax.ad_checkpoint.checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, bias, has_bias, offset, out, lse)


def _flash_bwd(causal, sm_scale, bq, bk, interpret, res, do):
    q, k, v, bias, has_bias, offset, out, lse = res
    dq, dk, dv = _bwd_impl(
        q, k, v, bias, has_bias, out, lse, do, causal, sm_scale, bq, bk,
        interpret, offset,
    )
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _flash_packed(q, k, v, kv_mask, offset, hq, hkv, causal, sm_scale, bq, bk,
                  interpret):
    out, _, _, _ = _fwd_impl(
        q, k, v, kv_mask, causal, sm_scale, bq, bk, interpret, offset,
        heads=(hq, hkv),
    )
    return out


def _flash_packed_fwd(q, k, v, kv_mask, offset, hq, hkv, causal, sm_scale,
                      bq, bk, interpret):
    out, lse, bias, has_bias = _fwd_impl(
        q, k, v, kv_mask, causal, sm_scale, bq, bk, interpret, offset,
        heads=(hq, hkv),
    )
    out = jax.ad_checkpoint.checkpoint_name(out, "flash_out")
    lse = jax.ad_checkpoint.checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, bias, has_bias, offset, out, lse)


def _flash_packed_bwd(hq, hkv, causal, sm_scale, bq, bk, interpret, res, do):
    q, k, v, bias, has_bias, offset, out, lse = res
    dq, dk, dv = _bwd_impl(
        q, k, v, bias, has_bias, out, lse, do, causal, sm_scale, bq, bk,
        interpret, offset, heads=(hq, hkv),
    )
    return dq, dk, dv, None, None


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


def attention_packed(
    q, k, v, num_heads: int, num_kv_heads: int,
    *,
    causal: bool = True,
    sm_scale: float | None = None,
    kv_mask=None,
    block_q: int = 1024,
    block_kv: int = 1024,
    interpret: bool | None = None,
    causal_offset: int = 0,
):
    """GQA flash attention in the packed (B, S, H*D) layout, Pallas only.

    q (B, Sq, Hq*D), k/v (B, Skv, Hkv*D) -> out (B, Sq, Hq*D): the layout the
    surrounding projections produce and consume, so NO physical
    (B,S,H,D)<->(B,H,S,D) transposes exist around the call (see module
    docstring).  Differentiable; numerics identical to :func:`attention`
    (same kernels, different BlockSpec index maps).
    """
    d = q.shape[-1] // num_heads
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bq = min(block_q, max(q.shape[1], 8))
    bk = _pick_kv_block(k.shape[1], block_kv)
    return _flash_packed(
        q, k, v, kv_mask, causal_offset, num_heads, num_kv_heads,
        causal, sm_scale, bq, bk, interpret,
    )


def attention_with_stats(
    q, k, v,
    *,
    causal: bool = True,
    sm_scale: float | None = None,
    kv_mask=None,
    causal_offset: int = 0,
    block_q: int = 1024,
    block_kv: int = 1024,
    interpret: bool | None = None,
):
    """Forward-only attention returning (out, logsumexp) — the partial-result
    form used by ring/context-parallel combination. Not differentiable; use
    :func:`attention` (or ops.context_parallel.ring_attention) for training."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bq = min(block_q, max(q.shape[2], 8))
    bk = _pick_kv_block(k.shape[2], block_kv)
    out, lse, _, _ = _fwd_impl(
        q, k, v, kv_mask, causal, sm_scale, bq, bk, interpret, causal_offset
    )
    return out, lse


def attention(
    q, k, v,
    *,
    causal: bool = True,
    sm_scale: float | None = None,
    kv_mask=None,
    impl: str = "auto",
    block_q: int = 1024,
    block_kv: int = 1024,
    interpret: bool | None = None,
    causal_offset: int = 0,
):
    """Multi-head (GQA) attention; shapes q (B,Hq,S,D), k/v (B,Hkv,S,D).

    Block-size defaults are tuned on v5e at the VLB geometry (BENCHMARKS.md);
    the kv block is additionally snapped to the 128-multiple that minimizes
    sequence padding (e.g. seq 3328 -> bk 1664 exactly, not 1024 -> pad 4096).
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        assert causal_offset == 0, "causal_offset requires the pallas impl"
        return xla_attention(q, k, v, causal=causal, sm_scale=sm_scale, kv_mask=kv_mask)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bq = min(block_q, max(q.shape[2], 8))
    bk = _pick_kv_block(k.shape[2], block_kv)
    return _flash(q, k, v, kv_mask, causal_offset, causal, sm_scale, bq, bk, interpret)


def _pick_kv_block(skv: int, max_block: int) -> int:
    """Largest 128-multiple <= max_block minimizing padded-seq overhead."""
    if skv <= 128:
        return 128
    best_bk, best_pad = 128, None
    for bk in range(128, min(max_block, ((skv + 127) // 128) * 128) + 1, 128):
        padded = -(-skv // bk) * bk
        if best_pad is None or padded < best_pad or (
            padded == best_pad and bk > best_bk
        ):
            best_bk, best_pad = bk, padded
    return best_bk
