"""Fused LoRA rank-r epilogue: ``y + scaling * (z @ B)`` (Pallas TPU).

Round-5 trace finding (BENCHMARKS.md gemm_rate_report): XLA emits the
rank-16 adapter GEMMs as `convolution` fusions running 10-30x off their
bandwidth floors — at the production geometry the z@B forward at N=14336
takes ~17 ms (vs a ~0.9 ms two-stream floor), dz = dy@B^T ~15 ms and
dW_B = z^T@dy ~15 ms (each re-reading the same 352 MB ``dy`` at ~25 GB/s
effective).  The K=16 (or M=16) contraction leaves the MXU 87.5% idle, and
XLA's window configs make it far worse.

This op replaces all three with explicit bandwidth-bound Pallas kernels:

  forward   out = y + scaling * (z @ B)        one y read + one out write
  backward  d(y) = dy                          aliased pass-through, free
            dz   = scaling * dy @ B^T          one dy read
            dB   = scaling * z^T @ dy          one dy read

``z`` is (M, r) with r <= 128 (padded to one lane register in-kernel);
``B`` is (r, N).  Matches the reference adapter math exactly
(peft LoRA: litmodule.py:101-120, scaling = alpha/r, lora.yaml:28-29).

PROBE OUTCOME (2026-08-19, BENCHMARKS.md round 5): standalone the forward
wins (3.80 vs 5.39 ms at N=14336) but the vjp loses (9.95 vs 4.83), and
IN-STEP both modes lose (full Pallas 2673 ms, hybrid fwd-only 2671, off
2644) — the XLA fusions this replaces carry other elementwise work
(residual, silu gating, next-GEMM quant stats) that then runs unfused.
Kept behind ``LoRAConfig.fused_epilogue`` ('' off / 'pallas' / 'fwd') as a
measured-and-rejected probe, default OFF.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lora_epilogue"]

_RP = 128  # rank padded to one lane register


def _fwd_kernel(y_ref, z_ref, b_ref, o_ref, *, scaling):
    o_ref[...] = y_ref[...] + scaling * jax.lax.dot(
        z_ref[...], b_ref[...], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _dz_kernel(dy_ref, b_ref, dz_ref, acc_ref, *, scaling, nn):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # dz_tile += dy_tile @ B_tile^T   (contract the N block)
    acc_ref[...] += jax.lax.dot_general(
        dy_ref[...], b_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nn - 1)
    def _():
        dz_ref[...] = (scaling * acc_ref[...]).astype(dz_ref.dtype)


def _db_kernel(z_ref, dy_ref, db_ref, acc_ref, *, scaling, nm):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # dB_tile += z_tile^T @ dy_tile   (contract the M block)
    acc_ref[...] += jax.lax.dot_general(
        z_ref[...], dy_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == nm - 1)
    def _():
        db_ref[...] = (scaling * acc_ref[...]).astype(db_ref.dtype)


def _tiles(m: int, n: int, block_m: int, block_n: int) -> tuple[int, int]:
    bm, bn = min(block_m, m), min(block_n, n)
    while m % bm:
        bm //= 2
    while n % bn:
        bn //= 2
    return bm, bn


def lora_epilogue(
    y, z, b, scaling: float,
    *, block_m: int = 512, block_n: int = 1024, interpret=None,
    backward: str = "pallas",
):
    """``y + scaling * (z @ b)`` with bandwidth-optimal forward and backward.

    y: (..., N); z: (..., r); b: (r, N), r <= 128.  Differentiable in all
    three tensor args.  Falls back to the plain XLA expression when the
    shapes don't tile or (by default) off-TPU.  ``backward='xla'`` keeps the
    Pallas forward but lets XLA emit dz/dB (the standalone probe measured
    the Pallas fwd faster but the Pallas vjp slower — two extra full dy
    reads; BENCHMARKS.md round 5).
    """
    r, n = b.shape
    lead = y.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bm, bn = _tiles(m, n, block_m, block_n)
    if r > _RP or bm < 8 or bn < 128:
        return y + jnp.asarray(scaling, y.dtype) * (z @ b)
    nm, nn = m // bm, n // bn

    y2 = y.reshape(m, n)
    z2 = z.reshape(m, r)
    b_p = jnp.pad(b, ((0, _RP - r), (0, 0)))
    z_p = jnp.pad(z2, ((0, 0), (0, _RP - r)))

    @jax.custom_vjp
    def run(y2, z_p, b_p):
        return _fwd(y2, z_p, b_p)

    def _fwd(y2, z_p, b_p):
        return pl.pallas_call(
            functools.partial(_fwd_kernel, scaling=scaling),
            grid=(nm, nn),
            in_specs=[
                pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
                pl.BlockSpec((bm, _RP), lambda i, j: (i, 0)),
                pl.BlockSpec((_RP, bn), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m, n), y2.dtype),
            # out overwrites y in place (same tile, read-then-write): the
            # XLA fusion this replaces also reused y's buffer — without the
            # alias the op holds an extra (M, N) live and the 32L w8a8g8
            # step OOMs on one 16 GB chip (measured round 5).
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(y2, z_p, b_p)

    def run_fwd(y2, z_p, b_p):
        return _fwd(y2, z_p, b_p), (z_p, b_p)

    def run_bwd(res, dy):
        z_p, b_p = res
        if backward == "xla":
            s = jnp.asarray(scaling, jnp.float32)
            dz = (s * jax.lax.dot_general(
                dy, b_p, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )).astype(dy.dtype)
            db = (s * jax.lax.dot_general(
                z_p, dy, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )).astype(dy.dtype)
            return dy, dz, db
        dz = pl.pallas_call(
            functools.partial(_dz_kernel, scaling=scaling, nn=nn),
            grid=(nm, nn),
            in_specs=[
                pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
                pl.BlockSpec((_RP, bn), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, _RP), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((m, _RP), dy.dtype),
            scratch_shapes=[pltpu.VMEM((bm, _RP), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(dy, b_p)
        db = pl.pallas_call(
            functools.partial(_db_kernel, scaling=scaling, nm=nm),
            grid=(nn, nm),
            in_specs=[
                pl.BlockSpec((bm, _RP), lambda j, i: (i, 0)),
                pl.BlockSpec((bm, bn), lambda j, i: (i, j)),
            ],
            out_specs=pl.BlockSpec((_RP, bn), lambda j, i: (0, j)),
            out_shape=jax.ShapeDtypeStruct((_RP, n), dy.dtype),
            scratch_shapes=[pltpu.VMEM((_RP, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(z_p, dy)
        # d(y) is an aliased pass-through of the cotangent: zero extra HBM.
        return dy, dz, db

    run.defvjp(run_fwd, run_bwd)
    out = run(y2, z_p, b_p)
    return out.reshape(*lead, n)
