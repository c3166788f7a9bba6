"""Fused LoRA adapter-input dropout + rank-r matmul (Pallas TPU).

The adapter path ``mid = dropout(x) @ A`` is the last dropout cost center in
the train step (BENCHMARKS.md round 2): XLA materializes the dropped copy of
``x`` (50-350 MB per site) plus a bits tensor because a matmul operand can't
fuse its elementwise producer.  This kernel generates the mask bits
IN-KERNEL (``pltpu.prng_random_bits``) while streaming ``x`` tile-by-tile
into the rank-r contraction, so HBM sees exactly one read of ``x`` and a
(M, r) write — nothing else.

Mask semantics match ``models/lora.py:adapter_dropout`` with
``dropout_bits=8``: keep iff ``bits8 >= round(p*256)``, survivors rescaled
by the exact realized keep-prob (unbiased).  The PRNG stream is the TPU
hardware generator seeded per ``(seed, tile_i, tile_j)`` — deterministic per
seed, reproducible between forward and backward (both regenerate the same
mask; nothing is stored).

Backward (custom VJP, no residual mask):
  dx = (dmid @ A^T) .* mask / keep_p      (one kernel, regenerates bits)
  dA = (mask .* x / keep_p)^T @ dmid      (one kernel, regenerates bits)

Tests run the ``bits``-input mode (mask supplied as an array) under Pallas
interpret on CPU — identical math, PRNG replaced; scripts/fused_dropout_tpu
checks PRNG-mode fwd/bwd mask consistency on the real chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_dropout_matmul"]

_RP = 128  # rank padded to one lane register; MXU runs >=128 lanes anyway


def _mask(bits_u32, thr):
    return (bits_u32 & 0xFF).astype(jnp.int32) >= thr


def _keep_planes(shape, thr):
    """4 keep-planes of shape (bm, bk//4): byte c of each u32 word masks
    column subtile c.

    The hardware generator produces 32 bits/element; the original kernels
    compared only the LOW byte of a full per-element word — 4x the needed
    PRNG work, and the round-5 trace showed the in-kernel PRNG (not HBM)
    dominating every fused-dropout call (~17 ms at (12288,14336) vs a
    ~0.5 ms read floor).  Element (row, col) now takes byte ``col // q`` of
    word ``(row, col % q)`` — all three kernels use the same (bm, bk) tile
    so the mapping (and therefore the mask) is identical fwd/bwd.
    """
    words = pltpu.prng_random_bits((shape[0], shape[1] // 4))
    return [((words >> (8 * c)) & 0xFF).astype(jnp.int32) >= thr
            for c in range(4)]


def _fwd_kernel(seed_ref, x_ref, a_ref, bits_ref, o_ref, acc_ref,
                *, thr, inv_keep, nk, use_prng):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    scale = jnp.asarray(inv_keep, x.dtype)
    if use_prng:
        pltpu.prng_seed(seed_ref[0], i * pl.num_programs(1) + j)
        q = x.shape[1] // 4
        for c, keep in enumerate(_keep_planes(x.shape, thr)):
            z = jnp.where(keep, x[:, c * q:(c + 1) * q] * scale, 0)
            acc_ref[...] += jax.lax.dot(
                z, a_ref[c * q:(c + 1) * q, :],
                preferred_element_type=jnp.float32,
            )
    else:
        keep = bits_ref[...].astype(jnp.int32) >= thr
        z = jnp.where(keep, x * scale, 0)
        acc_ref[...] += jax.lax.dot(z, a_ref[...],
                                    preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _dx_kernel(seed_ref, dmid_ref, a_ref, bits_ref, dx_ref,
               *, thr, inv_keep, use_prng):
    i, j = pl.program_id(0), pl.program_id(1)
    g = jax.lax.dot_general(
        dmid_ref[...], a_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if use_prng:
        pltpu.prng_seed(seed_ref[0], i * pl.num_programs(1) + j)
        q = g.shape[1] // 4
        for c, keep in enumerate(_keep_planes(g.shape, thr)):
            dx_ref[:, c * q:(c + 1) * q] = jnp.where(
                keep, g[:, c * q:(c + 1) * q] * inv_keep, 0.0
            ).astype(dx_ref.dtype)
    else:
        keep = bits_ref[...].astype(jnp.int32) >= thr
        dx_ref[...] = jnp.where(keep, g * inv_keep, 0.0).astype(dx_ref.dtype)


def _da_kernel(seed_ref, x_ref, dmid_ref, bits_ref, da_ref, acc_ref,
               *, thr, inv_keep, nm, nk_total, use_prng):
    # grid (nk, nm): j outer, i inner; mask tile ids must match the forward's
    # (i, j) seeding so the regenerated bits are identical.
    j, i = pl.program_id(0), pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    scale = jnp.asarray(inv_keep, x.dtype)
    if use_prng:
        # grid here is (nk, nm) with i inner — num_programs(1) is nm, but
        # the TILE id must match the forward's (i * nk + j) numbering.
        pltpu.prng_seed(seed_ref[0], i * nk_total + j)
        q = x.shape[1] // 4
        for c, keep in enumerate(_keep_planes(x.shape, thr)):
            z = jnp.where(keep, x[:, c * q:(c + 1) * q] * scale, 0)
            acc_ref[c * q:(c + 1) * q, :] += jax.lax.dot_general(
                z, dmid_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    else:
        keep = bits_ref[...].astype(jnp.int32) >= thr
        z = jnp.where(keep, x * scale, 0)
        acc_ref[...] += jax.lax.dot_general(
            z, dmid_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == nm - 1)
    def _():
        da_ref[...] = acc_ref[...].astype(da_ref.dtype)


def fused_dropout_matmul(
    x, a, seed, p: float,
    *, bits=None, block_m: int = 512, block_k: int = 1024, interpret=None,
):
    """``dropout(x; p) @ a`` with the mask fused into the contraction.

    x: (M, K); a: (K, r) with r <= 128; seed: int32 scalar (ignored when
    ``bits`` (M, K) uint8 is given — the test path).  Returns (M, r) in
    ``x.dtype``.  Differentiable in x and a.
    """
    # Default tiles are sized for the in-step case: at (1024, 2048) the
    # double-buffered x tile alone is 8 MB and the kernel exceeded the 16 MB
    # scoped-vmem limit by 344 KB when embedded in the remat backward
    # (measured in-step, round 4); (512, 1024) leaves ~4x headroom at the
    # same arithmetic intensity (the contraction is rank-r, HBM-bound).
    m, k = x.shape
    r = a.shape[1]
    thr = int(round(p * 256))
    keep_p = 1.0 - thr / 256.0
    if thr == 0:
        return (x @ a.astype(x.dtype)).astype(x.dtype)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    use_prng = bits is None
    if use_prng and interpret:
        raise NotImplementedError(
            "PRNG mode needs the TPU backend; pass bits= on CPU"
        )

    bm, bk = min(block_m, m), min(block_k, k)
    while m % bm:
        bm //= 2
    while k % bk:
        bk //= 2
    if bm < 8 or bk < 128:
        raise ValueError(f"shapes ({m}, {k}) don't tile; use adapter_dropout")
    nm, nk = m // bm, k // bk

    a_p = jnp.pad(a.astype(x.dtype), ((0, 0), (0, _RP - r)))
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    bits_in = bits if bits is not None else jnp.zeros((1, 1), jnp.uint8)
    bits_spec = (
        pl.BlockSpec((bm, bk), lambda i, j, *_: (i, j)) if bits is not None
        else pl.BlockSpec(memory_space=pl.ANY)
    )
    bits_spec_da = (
        pl.BlockSpec((bm, bk), lambda j, i, *_: (i, j)) if bits is not None
        else pl.BlockSpec(memory_space=pl.ANY)
    )
    common = dict(num_scalar_prefetch=1)

    # seed/bits ride as EXPLICIT arguments: closure-captured tracers leak
    # across flax remat boundaries (UnexpectedTracerError under
    # jax.checkpoint re-tracing).
    @jax.custom_vjp
    def run(x, a_p, seed, bits_in):
        return _fwd(x, a_p, seed, bits_in)

    def _fwd(x, a_p, seed, bits_in):
        out = pl.pallas_call(
            functools.partial(_fwd_kernel, thr=thr, inv_keep=1.0 / keep_p,
                              nk=nk, use_prng=use_prng),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                grid=(nm, nk),
                in_specs=[
                    pl.BlockSpec((bm, bk), lambda i, j, *_: (i, j)),
                    pl.BlockSpec((bk, _RP), lambda i, j, *_: (j, 0)),
                    bits_spec,
                ],
                out_specs=pl.BlockSpec((bm, _RP), lambda i, j, *_: (i, 0)),
                scratch_shapes=[pltpu.VMEM((bm, _RP), jnp.float32)],
                **common,
            ),
            out_shape=jax.ShapeDtypeStruct((m, _RP), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(seed, x, a_p, bits_in)
        return out[:, :r]

    def run_fwd(x, a_p, seed, bits_in):
        return _fwd(x, a_p, seed, bits_in), (x, a_p, seed, bits_in)

    def run_bwd(res, dmid):
        x, a_p, seed, bits_in = res
        dmid_p = jnp.pad(dmid.astype(x.dtype), ((0, 0), (0, _RP - r)))
        dx = pl.pallas_call(
            functools.partial(_dx_kernel, thr=thr, inv_keep=1.0 / keep_p,
                              use_prng=use_prng),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                grid=(nm, nk),
                in_specs=[
                    pl.BlockSpec((bm, _RP), lambda i, j, *_: (i, 0)),
                    pl.BlockSpec((bk, _RP), lambda i, j, *_: (j, 0)),
                    bits_spec,
                ],
                out_specs=pl.BlockSpec((bm, bk), lambda i, j, *_: (i, j)),
                scratch_shapes=[],
                **common,
            ),
            out_shape=jax.ShapeDtypeStruct((m, k), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(seed, dmid_p, a_p, bits_in)
        da = pl.pallas_call(
            functools.partial(_da_kernel, thr=thr, inv_keep=1.0 / keep_p,
                              nm=nm, nk_total=nk, use_prng=use_prng),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                grid=(nk, nm),
                in_specs=[
                    pl.BlockSpec((bm, bk), lambda j, i, *_: (i, j)),
                    pl.BlockSpec((bm, _RP), lambda j, i, *_: (i, 0)),
                    bits_spec_da,
                ],
                out_specs=pl.BlockSpec((bk, _RP), lambda j, i, *_: (j, 0)),
                scratch_shapes=[pltpu.VMEM((bk, _RP), jnp.float32)],
                **common,
            ),
            out_shape=jax.ShapeDtypeStruct((k, _RP), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(seed, x, dmid_p, bits_in)
        import numpy as _np

        dseed = _np.zeros(seed.shape, jax.dtypes.float0)
        dbits = _np.zeros(bits_in.shape, jax.dtypes.float0)
        return dx, da.astype(x.dtype), dseed, dbits

    run.defvjp(run_fwd, run_bwd)
    return run(x, a_p, seed, bits_in)
