"""LoRA for Flax Dense layers.

Reference behavior (litmodule.py:36-55,101-120 via peft): LoRA adapters with
rank r / scaling alpha/r / dropout on the adapter input, targeting every
linear layer of the LLM except the connector (``mm_projector``), the vision
tower, and ``lm_head``; all base weights frozen (peft ``get_peft_model``).

TPU-native form: :class:`LoRADense` is a drop-in ``nn.Dense`` whose base
kernel is wrapped in ``stop_gradient`` (XLA then dead-code-eliminates the
base-weight backward entirely) and whose adapter path computes
``(dropout(x) @ A) @ B * alpha/r`` — never materializing ``W + AB``.
Adapter params are named ``lora_a``/``lora_b`` so the optimizer's
trainable-label predicate and the adapter-only checkpoint filter
(train/checkpoint.py) can select them by name.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from phantom_vlb_tpu.ops.quant import (
    int8_matmul,
    int8_matmul_w8a8,
    int8_matmul_w8a8g8,
)

__all__ = ["LoRAConfig", "LoRADense", "is_lora_path", "lora_merge"]


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 16          # lora.yaml:28 (r=16)
    alpha: float = 32.0     # lora.yaml:29
    dropout: float = 0.1    # lora.yaml:30
    # peft draws an INDEPENDENT dropout mask per target projection; with
    # shared_dropout the projections reading the same activation (q/k/v;
    # gate/up) reuse one mask. Mask generation at the production geometry
    # costs ~80 ms/step/mask-site even under the rbg PRNG, so this trades a
    # slightly different regularization-noise correlation (each adapter
    # still sees unbiased dropout) for ~3/7 of that cost. Default off =
    # peft-faithful.
    shared_dropout: bool = False
    # Dropout mask arithmetic: 32 = exact peft/bernoulli semantics; 8 uses
    # a uint8-threshold mask (keep iff bits >= round(p*256), rescale by the
    # EXACT realized keep-prob 1-round(p*256)/256, so the estimator stays
    # unbiased).  At p=0.1 the effective rate is 0.1016 — a documented
    # recipe deviation (DEVIATIONS.md) that removes the f32 uniform
    # conversion chain from 224 mask sites/step.
    dropout_bits: int = 32
    # Fuse the adapter-input dropout into the rank-r matmul with a Pallas
    # kernel (ops/lora_fused.py; TPU only, falls back elsewhere). Restores
    # INDEPENDENT per-site masks (peft semantics) at less cost than any
    # mask-materializing variant; mask arithmetic is the u8-threshold form.
    fused_dropout: bool = False
    # Compute ``y + scaling * (z @ B)`` with the Pallas kernels in
    # ops/lora_epilogue.py instead of XLA's K=16/M=16 GEMMs (TPU only; math
    # identical).  '' = off; 'pallas' = Pallas fwd + bwd; 'fwd' = Pallas fwd
    # with XLA dz/dB (the standalone probe measured the Pallas fwd faster
    # but its vjp slower — BENCHMARKS.md round 5).
    fused_epilogue: str = ""

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank

    @property
    def dropout_keep_prob(self) -> float:
        if self.dropout_bits >= 32:
            return 1.0 - self.dropout
        n = 1 << self.dropout_bits
        return 1.0 - round(self.dropout * n) / n


def adapter_dropout(module: nn.Module, x, cfg: "LoRAConfig"):
    """Adapter-input dropout (training path; caller checks deterministic)."""
    if cfg.dropout_bits >= 32:
        return nn.Dropout(cfg.dropout, deterministic=False)(x)
    n = 1 << cfg.dropout_bits
    thr = int(round(cfg.dropout * n))
    keep = 1.0 - thr / n
    key = module.make_rng("dropout")
    # NOTE (round-2 measurements): a straight u8 draw is the FASTEST mask
    # source in-model.  "Save entropy" variants that draw quarter-size u32
    # and unpack 4 bytes/word REGRESS (bitcast+reshape: 4.20 s/step;
    # shift+concat: 3.12 s/step; plain u8 draw: 3.04 s/step) because XLA
    # fuses the plain draw into each consumer while any unpacking forces a
    # materialized bits tensor.  Keep the simple form.
    dtype = {8: jnp.uint8, 16: jnp.uint16}[cfg.dropout_bits]
    bits = jax.random.bits(key, x.shape, dtype)
    return jnp.where(
        bits >= thr, x / jnp.asarray(keep, x.dtype), jnp.zeros((), x.dtype)
    )


class LoRADense(nn.Module):
    features: int
    lora: LoRAConfig
    use_bias: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    # Frozen base stored as int8 + per-channel scales (ops/quant.py):
    # halves HBM footprint/bandwidth of the 7B backbone.
    quantized: bool = False
    # Additionally quantize activations per-token (w8a8): ~2x matmul rate on
    # the v5e int8 MXU; backward stays bf16 (straight-through).
    act_quant: bool = False
    # Also quantize the backward dx matmul (w8a8g8): both passes on the
    # int8 MXU; dx carries ~0.4% RMS quantization noise.
    grad_quant: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, adapter_x=None):
        """``adapter_x``: pre-dropped adapter input (shared_dropout mode) —
        the internal dropout is skipped when it is provided."""
        in_features = x.shape[-1]
        if self.quantized:
            kernel_q = self.param(
                "kernel_q",
                lambda key, shape: jax.random.randint(
                    key, shape, -127, 128, jnp.int8
                ),
                (in_features, self.features),
            )
            kernel_scale = self.param(
                "kernel_scale",
                nn.initializers.constant(1.0 / (127.0 * math.sqrt(in_features))),
                (self.features,),
                jnp.float32,
            )
            if self.grad_quant:
                matmul = int8_matmul_w8a8g8
            elif self.act_quant:
                matmul = int8_matmul_w8a8
            else:
                matmul = int8_matmul
            y = matmul(
                x,
                jax.lax.stop_gradient(kernel_q),
                jax.lax.stop_gradient(kernel_scale),
                self.dtype,
            )
        else:
            kernel = self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                (in_features, self.features),
                self.param_dtype,
            )
            # Base path — frozen (peft semantics); stop_gradient lets XLA drop
            # the base dW computation.
            y = x @ jax.lax.stop_gradient(kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + jax.lax.stop_gradient(bias.astype(self.dtype))

        a = self.param(
            "lora_a",
            nn.initializers.he_uniform(),
            (in_features, self.lora.rank),
            self.param_dtype,
        )
        b = self.param(
            "lora_b",
            nn.initializers.zeros,
            (self.lora.rank, self.features),
            self.param_dtype,
        )
        if (
            adapter_x is None
            and self.lora.fused_dropout
            and self.lora.dropout
            and not deterministic
            and jax.default_backend() == "tpu"
        ):
            # Pallas kernel: mask bits generated in-VMEM during the rank-r
            # contraction — one HBM read of x, no dropped-copy/bits tensors
            # (ops/lora_fused.py; u8-threshold semantics like dropout_bits=8).
            from phantom_vlb_tpu.ops.lora_fused import fused_dropout_matmul

            seed = jax.lax.bitcast_convert_type(
                jax.random.bits(self.make_rng("dropout"), (), jnp.uint32),
                jnp.int32,
            )
            x2d = x.reshape(-1, in_features)
            mid = fused_dropout_matmul(
                x2d, a.astype(self.dtype), seed, self.lora.dropout
            )
            z = mid.reshape(*x.shape[:-1], self.lora.rank)
        else:
            if adapter_x is not None:
                z = adapter_x
            else:
                z = x
                if self.lora.dropout and not deterministic:
                    z = adapter_dropout(self, z, self.lora)
            z = z @ a.astype(self.dtype)
        # The rank-r mid is tiny ((tokens, 16) bf16, ~400 KB at the VLB
        # geometry) but expensive to rematerialize (the fused dropout+rank-r
        # kernel re-reads the full (tokens, K) activation from HBM).  Named
        # so the "flash"/"mids" remat policies store it: ~88 MB for all 32
        # layers buys back the entire rematted adapter-kernel family.
        z = jax.ad_checkpoint.checkpoint_name(z, "lora_mid")
        if self.lora.fused_epilogue and jax.default_backend() == "tpu":
            from phantom_vlb_tpu.ops.lora_epilogue import lora_epilogue

            return lora_epilogue(
                y, z.astype(self.dtype), b.astype(self.dtype),
                self.lora.scaling,
                backward="xla" if self.lora.fused_epilogue == "fwd"
                else "pallas",
            )
        z = z @ b.astype(self.dtype)
        return y + z * jnp.asarray(self.lora.scaling, self.dtype)


class FrozenQuantDense(nn.Module):
    """Adapter-free quantized frozen Dense (for the CLIP tower / connector).

    Same storage layout as :class:`LoRADense`'s quantized base
    (``kernel_q`` int8 + ``kernel_scale``), same matmul dispatch
    (weight-only / w8a8 / w8a8g8), no trainable branch — these modules sit
    entirely under ``stop_gradient`` in the VLB model.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    act_quant: bool = False
    grad_quant: bool = False

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel_q = self.param(
            "kernel_q",
            lambda key, shape: jax.random.randint(key, shape, -127, 128, jnp.int8),
            (in_features, self.features),
        )
        kernel_scale = self.param(
            "kernel_scale",
            nn.initializers.constant(1.0 / (127.0 * math.sqrt(in_features))),
            (self.features,),
            jnp.float32,
        )
        if self.grad_quant:
            matmul = int8_matmul_w8a8g8
        elif self.act_quant:
            matmul = int8_matmul_w8a8
        else:
            matmul = int8_matmul
        y = matmul(
            x,
            jax.lax.stop_gradient(kernel_q),
            jax.lax.stop_gradient(kernel_scale),
            self.dtype,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + jax.lax.stop_gradient(bias.astype(self.dtype))
        return y


def is_lora_path(path: str) -> bool:
    """Adapter selector for optimizer labels / adapter-only checkpoints."""
    return "lora_a" in path or "lora_b" in path


def lora_merge(params, scaling: float):
    """Fold adapters into base kernels (W <- W + scaling * A B) for export.

    Returns a new tree with ``lora_a``/``lora_b`` leaves removed.
    """
    if not isinstance(params, dict):
        return params
    out = {}
    for k, v in params.items():
        if isinstance(v, dict) and {"kernel", "lora_a", "lora_b"} <= set(v.keys()):
            merged = dict(v)
            merged["kernel"] = v["kernel"] + scaling * (v["lora_a"] @ v["lora_b"])
            merged.pop("lora_a")
            merged.pop("lora_b")
            out[k] = merged
        else:
            out[k] = lora_merge(v, scaling)
    return out
