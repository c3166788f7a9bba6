"""Int8 weight quantization for frozen base parameters.

The frozen 7B backbone is pure inference inside the training step, so its
weights can live in HBM as int8 with per-output-channel scales: 2x less HBM
than bf16 (7.1 GB -> 3.6 GB — the full 32-layer model fits one v5e chip) and
2x less weight bandwidth per matmul, which is the bound for batch-3 decode-
style matmuls.  The matmul computes ``(x @ q) * scale`` — scales commute out
of the contraction, so the dequantized matrix is never materialized; XLA
fuses the int8->bf16 cast into the MXU feed.

The reference never quantizes (bitsandbytes is pinned but unused,
SURVEY.md §2.10); this is a TPU-native addition, disabled by default and
exercised by the benchmark/serving paths.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "quantize_int8",
    "int8_matmul",
    "int8_matmul_w8a8",
    "int8_matmul_w8a8g8",
    "quantize_tree",
]


def quantize_int8(w, axis: int = 0):
    """Per-channel symmetric int8: returns (q int8, scale f32).

    ``axis`` is the contraction (input) axis; scales are per output channel.
    """
    w = np.asarray(w, np.float32)
    absmax = np.max(np.abs(w), axis=axis, keepdims=True)
    scale = (absmax / 127.0).astype(np.float32)
    scale = np.where(scale == 0.0, 1.0, scale)
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return q, np.squeeze(scale, axis=axis)


def int8_matmul(x, q, scale, dtype=jnp.bfloat16):
    """y = (x @ dequant(q)) without materializing the dequantized matrix."""
    y = x.astype(dtype) @ q.astype(dtype)
    return y * scale.astype(dtype)


# One-pass Pallas row quant (ops/rowquant.py) — measured SLOWER than XLA's
# fused absmax+clamp at the production shapes (device-loop timing, round 3:
# 3.5 vs 2.3 ms at (12288, 14336); BENCHMARKS.md "probed and rejected"), so
# the jnp path stays the default.  VLB_ROWQUANT=1 switches the kernel in
# (kept for future Mosaic generations / other geometries).
_USE_ROWQUANT = os.environ.get("VLB_ROWQUANT", "0") == "1"


def _rows_ok(x) -> bool:
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    return rows % 8 == 0 and x.shape[-1] % 128 == 0


def _act_quant(x):
    """(..., N) -> (s8 (..., N), f32 scale (..., 1)): symmetric absmax/127."""
    if _USE_ROWQUANT and _rows_ok(x):
        from phantom_vlb_tpu.ops.rowquant import row_quant

        return row_quant(x)
    xf = x.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s_x = jnp.maximum(s_x, 1e-12)
    return jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8), s_x


def _act_quant_scaled(dy, scale):
    """Quantize ``dy * scale`` per row without materializing the product."""
    if _USE_ROWQUANT and _rows_ok(dy):
        from phantom_vlb_tpu.ops.rowquant import row_quant_scaled

        return row_quant_scaled(dy, scale)
    g = dy.astype(jnp.float32) * scale
    s_g = jnp.max(jnp.abs(g), axis=-1, keepdims=True) / 127.0
    s_g = jnp.maximum(s_g, 1e-12)
    return jnp.clip(jnp.round(g / s_g), -127, 127).astype(jnp.int8), s_g


# The output cast to the model compute dtype lives INSIDE the custom_vjp
# (``dtype`` rides as a nondiff static arg) so the incoming cotangent is
# bf16, not f32.  With the cast outside, JAX upcast the bf16 cotangent to
# f32 at the vjp boundary and every relayout copy between the consumer's
# backward and this bwd ran on the f32 version — the round-4 xplane trace
# showed 4x ~19.5 ms/step f32[6,2048,32,128]/f32[6,2048,4096] copy families
# that are pure dtype-of-transport waste (the upcast adds no information;
# the bwd immediately re-upcasts elementwise inside its own fusion).


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _w8a8_core(x, q, scale, dtype):
    """Forward: dynamic per-token activation quant + int8xint8 MXU matmul.

    The v5e MXU runs int8xint8->int32 at ~2x its bf16 rate (measured 198 vs
    105 TOP/s on this chip), so quantizing the activations on the fly makes
    the frozen-base projections nearly twice as fast.  Per-token symmetric
    absmax scales (the LLM.int8 recipe, no outlier split — post-RMSNorm
    activations are well-conditioned); scales commute out of the contraction:
    ``y = (x8 @ q) * s_x * s_w``.

    The quant step is the jnp absmax+clamp path by default — XLA fuses it
    well enough that the one-pass Pallas row kernel (ops/rowquant.py)
    measured SLOWER at production shapes (BENCHMARKS.md round-3 rejected
    list); the kernel stays opt-in behind VLB_ROWQUANT=1.
    """
    x8, s_x = _act_quant(x)
    y = jax.lax.dot_general(
        x8, q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * s_x * scale).astype(dtype)


def _w8a8_fwd(x, q, scale, dtype):
    # Zero-size carrier for x's dtype (dtypes themselves aren't JAX types).
    return _w8a8_core(x, q, scale, dtype), (q, scale, jnp.zeros((0,), x.dtype))


def _w8a8_bwd(dtype, res, dy):
    # Straight-through: round() is treated as identity, so dx is the exact
    # bf16 dequant backward — dy @ dequant(q)^T — at the same cost as the
    # weight-only int8 path.  The base is frozen: float0/zero for q, scale.
    q, scale, x_proto = res
    # Upcast elementwise inside the fusion: matches the old f32-dy numerics
    # exactly without transporting an f32 tensor.
    dyb = (dy.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    dx = dyb @ q.astype(jnp.bfloat16).T
    return (
        dx.astype(x_proto.dtype),
        np.zeros(q.shape, jax.dtypes.float0),
        jnp.zeros_like(scale),
    )


_w8a8_core.defvjp(_w8a8_fwd, _w8a8_bwd)


def int8_matmul_w8a8(x, q, scale, dtype=jnp.bfloat16):
    """y = dequant(quant(x) @ q): int8 activations x int8 weights on the MXU.

    ~0.4% RMS relative error on the frozen path (the trainable LoRA branch
    stays bf16 and corrects); enable via ``MistralConfig.base_quant='w8a8'``.
    """
    return _w8a8_core(x, q, scale, dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _w8a8g8_core(x, q, scale, dtype):
    x8, s_x = _act_quant(x)
    y = jax.lax.dot_general(
        x8, q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * s_x * scale).astype(dtype)


def _w8a8g8_fwd(x, q, scale, dtype):
    return _w8a8g8_core(x, q, scale, dtype), (q, scale, jnp.zeros((0,), x.dtype))


def _w8a8g8_bwd(dtype, res, dy):
    # int8 backward: dx_n' = sum_n (dy_n * s_w_n) q_nj^T.  The weight scale
    # rides the CONTRACTED axis here (unlike forward), so it is folded into
    # dy before the per-token quant; the per-token scale then commutes out.
    # ~0.4% RMS relative error on dx — gradient noise well below SGD's own;
    # the e2e learnability test runs with this mode to guard quality.
    q, scale, x_proto = res
    # _act_quant_scaled upcasts dy elementwise inside its own fusion, so a
    # bf16 dy is bit-identical to the old materialized-f32 dy here.
    g8, s_g = _act_quant_scaled(dy, scale)
    dx = jax.lax.dot_general(
        g8, q, (((g8.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (
        (dx.astype(jnp.float32) * s_g).astype(x_proto.dtype),
        np.zeros(q.shape, jax.dtypes.float0),
        jnp.zeros_like(scale),
    )


_w8a8g8_core.defvjp(_w8a8g8_fwd, _w8a8g8_bwd)


def int8_matmul_w8a8g8(x, q, scale, dtype=jnp.bfloat16):
    """w8a8 forward + int8 backward dx (``base_quant='w8a8g8'``).

    Both passes of the frozen-base projections run on the int8 MXU; only the
    gradient of the *input* is approximated (the base weights receive no
    gradient at all — they are frozen).
    """
    return _w8a8g8_core(x, q, scale, dtype)


def quantize_tree(params: dict, should_quantize) -> dict:
    """Replace selected ``{'kernel': w}`` leaves by int8 pairs.

    ``should_quantize(path_str, leaf)`` selects 2D (or stacked 3D) kernels;
    the replacement is ``{'kernel_q': int8, 'kernel_scale': f32}``.
    """

    def walk(node, prefix=""):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            path = f"{prefix}/{k}" if prefix else k
            if (
                isinstance(v, dict)
                and "kernel" in v
                and not isinstance(v["kernel"], dict)
                and should_quantize(path, v["kernel"])
            ):
                w = np.asarray(v["kernel"], np.float32)
                if w.ndim == 2:
                    q, s = quantize_int8(w, axis=0)
                elif w.ndim == 3:  # stacked scan layers (L, in, out)
                    qs = [quantize_int8(w[i], axis=0) for i in range(w.shape[0])]
                    q = np.stack([a for a, _ in qs])
                    s = np.stack([b for _, b in qs])
                else:
                    out[k] = walk(v, path)
                    continue
                new_v = {kk: walk(vv, f"{path}/{kk}") for kk, vv in v.items()
                         if kk != "kernel"}
                new_v["kernel_q"] = q
                new_v["kernel_scale"] = s
                out[k] = new_v
            else:
                out[k] = walk(v, path)
        return out

    return walk(params)
