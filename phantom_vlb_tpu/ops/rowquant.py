"""One-pass per-row int8 activation quantization (Pallas TPU kernel).

The w8a8/w8a8g8 paths (ops/quant.py) quantize activations dynamically:
absmax over the feature axis, then scale/round/clip to s8.  Left to XLA at
the production geometry this splits into an abs-reduce stat fusion plus a
clamp-convert fusion that together run at ~10-20x their HBM-bandwidth cost
(BENCHMARKS.md round-3 roofline: ~4.4 + 0.8 ms per (12288, 14336) tensor vs
~0.7 ms of raw traffic) — ~500 ms/step across the 32-layer fwd+recompute+bwd
at batch 6.  This kernel does the whole thing in ONE pass: a row block is
DMA'd to VMEM once, absmax/scale/round/clip happen in-core, and only the s8
tensor plus a tiny scale vector go back to HBM.

Semantics match ops/quant.py exactly (symmetric per-row absmax / 127,
floor 1e-12, round-half-even, clip +-127):

    q, s = row_quant(x)      # x (..., N) bf16/f32 -> q s8 (..., N), s f32 (..., 1)
    dequant ~= q.astype(f32) * s

Used inside the custom-VJP int8 matmul cores, so the kernel itself needs no
gradient (straight-through handling lives in ops/quant.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["row_quant", "row_quant_scaled"]


def _row_quant_kernel(x_ref, q_ref, s_ref):
    x = x_ref[...].astype(jnp.float32)                     # (br, N)
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)                              # (br, 1)
    q_ref[...] = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    # f32 outputs want a 128-lane minor dim; broadcast like the flash
    # kernels' LSE and let the wrapper slice column 0.
    s_ref[...] = jnp.broadcast_to(s, (*s.shape[:-1], 128))


def _row_quant_scaled_kernel(x_ref, w_ref, q_ref, s_ref):
    # Quantize (x * w_scale) without ever materializing the product in HBM
    # (the w8a8g8 backward's ``dy * weight_scale`` pre-multiply).
    x = x_ref[...].astype(jnp.float32) * w_ref[...].astype(jnp.float32)
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q_ref[...] = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    s_ref[...] = jnp.broadcast_to(s, (*s.shape[:-1], 128))


def _pick_block_rows(rows: int, n: int, itemsize: int) -> int:
    # VMEM budget per element: input block (itemsize) + s8 out (1), both
    # double-buffered by the pipeline (x2), plus the in-kernel f32 temp (4).
    budget = 10 * 1024 * 1024
    br = max(8, budget // ((2 * (itemsize + 1) + 4) * n))
    br = min(1 << (br.bit_length() - 1), 1024)
    while rows % br:
        br //= 2
    return max(br, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _row_quant_2d(x, w_scale=None, interpret=False):
    rows, n = x.shape
    if rows % 8 or n % 128:
        # Enforce the documented shape contract at the public API (ADVICE
        # round 3): _pick_block_rows would otherwise degrade br to 1 for odd
        # row counts and Mosaic tiling fails with an opaque compile error.
        raise ValueError(
            f"row_quant requires rows % 8 == 0 and N % 128 == 0, got "
            f"({rows}, {n}); use the jnp path in ops/quant.py for odd shapes"
        )
    br = _pick_block_rows(rows, n, x.dtype.itemsize)
    kernel = _row_quant_kernel if w_scale is None else _row_quant_scaled_kernel
    in_specs = [pl.BlockSpec((br, n), lambda i: (i, 0))]
    operands = [x]
    if w_scale is not None:
        in_specs.append(pl.BlockSpec((1, n), lambda i: (0, 0)))
        operands.append(w_scale.reshape(1, n))
    q, s = pl.pallas_call(
        kernel,
        grid=(rows // br,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((br, n), lambda i: (i, 0)),
            pl.BlockSpec((br, 128), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, n), jnp.int8),
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(*operands)
    return q, s[:, :1]


def row_quant(x, interpret=None):
    """Per-row symmetric int8 quant: (..., N) -> (s8 (..., N), f32 (..., 1)).

    Row count (prod of leading dims) must be a multiple of 8; the VLB
    geometry (batch x 2048 rows) always is.  Falls back to interpret mode
    off-TPU so CPU tests run the same code path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-1]
    n = x.shape[-1]
    q, s = _row_quant_2d(x.reshape(-1, n), interpret=interpret)
    return q.reshape(*lead, n), s.reshape(*lead, 1)


def row_quant_scaled(x, w_scale, interpret=None):
    """Quantize ``x * w_scale`` per row: the fused w8a8g8-backward pre-multiply.

    ``w_scale`` is the (N,)-shaped per-output-channel weight scale; the
    product is formed block-wise in VMEM only.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-1]
    n = x.shape[-1]
    q, s = _row_quant_2d(
        x.reshape(-1, n), w_scale.reshape(-1).astype(jnp.float32),
        interpret=interpret,
    )
    return q.reshape(*lead, n), s.reshape(*lead, 1)
