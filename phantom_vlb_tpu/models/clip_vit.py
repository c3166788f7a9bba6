"""CLIP ViT vision tower (ViT-L/14 @ 336px), from scratch in Flax.

The reference loads this frozen tower through VideoLLaMA2's
``build_vision_tower`` (extractfeatures.py:166-176) and never trains it
(litmodule.py:95-99).  Facts pinned by the reference: image size 336, patch
14 -> 24x24 = 576 patch tokens (extractfeatures.py:206-209), feature taken
from the penultimate transformer layer with the CLS token dropped (LLaVA-style
``mm_vision_select_layer=-2`` / ``select_feature='patch'``), encoder width
1024 / 24 layers / 16 heads for ViT-L.

Architecture (OpenAI CLIP vision encoder, as in HF ``CLIPVisionModel``):
conv patch embed (no bias in conv? CLIP uses bias=False) + class embedding +
learned position embeddings -> pre-LN -> N x [LN, MHA, LN, MLP(gelu)] with
residuals.  QuickGELU vs GELU: OpenAI CLIP-ViT-L/14-336 uses quick_gelu;
configurable here, default quick_gelu.

TPU notes: the tower runs frozen under ``stop_gradient``; frames are batched
as (B*T, H, W, C) so the conv and matmuls stay large for the MXU.  Images are
NHWC end-to-end (TPU-native layout); the loader converts from the reference's
NCHW on ingest.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from phantom_vlb_tpu.ops.flash_attention import attention as flash_attention

__all__ = ["CLIPVisionConfig", "CLIPVisionTower"]


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    select_layer: int = -2         # penultimate layer (LLaVA/VideoLLaMA2)
    select_feature: str = "patch"  # drop CLS
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    attention_impl: str = "xla"    # seq 577 — XLA attention is fine here
    # lax.scan over encoder layers (fast compile; stacked params). The
    # layers after select_layer are never computed in either mode (the
    # LLaVA/VideoLLaMA2 feature path discards them).
    scan_layers: bool = False
    # Quantize the (frozen, inference-only) projections like the LLM base:
    # None | 'int8' | 'w8a8' | 'w8a8g8' (ops/quant.py; backward never runs
    # here, the tower sits under stop_gradient).
    base_quant: str | None = None

    @property
    def effective_layers(self) -> int:
        """Number of layers actually run (up to the selected layer)."""
        if self.select_layer < 0:
            return self.num_hidden_layers + self.select_layer + 1
        return self.select_layer

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @staticmethod
    def tiny(**overrides) -> "CLIPVisionConfig":
        base = dict(
            image_size=56, patch_size=14, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, dtype=jnp.float32,
        )
        base.update(overrides)
        return CLIPVisionConfig(**base)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(name)


def _dense(cfg: CLIPVisionConfig, features: int, name: str):
    if cfg.base_quant is not None:
        from phantom_vlb_tpu.models.lora import FrozenQuantDense

        return FrozenQuantDense(
            features, use_bias=True, name=name,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            act_quant=cfg.base_quant in ("w8a8", "w8a8g8"),
            grad_quant=(cfg.base_quant == "w8a8g8"),
        )
    return nn.Dense(features, use_bias=True, name=name,
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype)


class CLIPAttention(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        b, s, e = x.shape
        h = cfg.num_attention_heads
        d = e // h
        dense = lambda name: _dense(cfg, e, name)  # noqa: E731
        q = dense("q_proj")(x).reshape(b, s, h, d).transpose(0, 2, 1, 3)
        k = dense("k_proj")(x).reshape(b, s, h, d).transpose(0, 2, 1, 3)
        v = dense("v_proj")(x).reshape(b, s, h, d).transpose(0, 2, 1, 3)
        out = flash_attention(q, k, v, causal=False, impl=cfg.attention_impl)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, e)
        return dense("out_proj")(out)


class CLIPMLP(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = _dense(cfg, cfg.intermediate_size, "fc1")(x)
        x = _act(cfg.hidden_act)(x)
        return _dense(cfg, cfg.hidden_size, "fc2")(x)


def _clip_layer_forward(cfg: CLIPVisionConfig, x):
    ln = lambda name: nn.LayerNorm(  # noqa: E731
        epsilon=cfg.layer_norm_eps, name=name,
        dtype=cfg.dtype, param_dtype=cfg.param_dtype,
    )
    x = x + CLIPAttention(cfg, name="self_attn")(ln("layer_norm1")(x))
    x = x + CLIPMLP(cfg, name="mlp")(ln("layer_norm2")(x))
    return x


class CLIPEncoderLayer(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        return _clip_layer_forward(self.config, x)


class CLIPScanBlock(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        return _clip_layer_forward(self.config, x), None


class CLIPVisionTower(nn.Module):
    """Returns the selected-layer patch features: (B, grid*grid, hidden)."""

    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """pixel_values: (B, H, W, 3) normalized images, NHWC."""
        cfg = self.config
        b = pixel_values.shape[0]

        patch_embeds = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            name="patch_embedding",
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
        )(pixel_values.astype(cfg.dtype))
        patch_embeds = patch_embeds.reshape(b, cfg.num_patches, cfg.hidden_size)

        class_embedding = self.param(
            "class_embedding",
            nn.initializers.normal(0.02),
            (cfg.hidden_size,),
            cfg.param_dtype,
        )
        cls = jnp.broadcast_to(
            class_embedding.astype(cfg.dtype)[None, None], (b, 1, cfg.hidden_size)
        )
        x = jnp.concatenate([cls, patch_embeds], axis=1)

        position_embedding = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.num_patches + 1, cfg.hidden_size),
            cfg.param_dtype,
        )
        x = x + position_embedding.astype(cfg.dtype)[None]

        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, name="pre_layrnorm",
            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
        )(x)

        stop = cfg.effective_layers
        assert 0 < stop <= cfg.num_hidden_layers, "select_layer out of range"
        if cfg.scan_layers:
            selected, _ = nn.scan(
                CLIPScanBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=stop,
            )(cfg, name="layers_scan")(x)
        else:
            selected = None
            for i in range(stop):
                x = CLIPEncoderLayer(cfg, name=f"layers_{i}")(x)
            selected = x
        # (post_layernorm exists in CLIP but is NOT applied to the selected
        # hidden state in the LLaVA/VideoLLaMA2 feature path.)
        if cfg.select_feature == "patch":
            return selected[:, 1:]
        return selected
