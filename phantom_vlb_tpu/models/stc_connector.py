"""STC connector: spatial-temporal conv downsampler between CLIP and the LLM.

The reference depends on VideoLLaMA2's ``STCConnector`` (submodule empty in
the snapshot).  Hard geometric contract reconstructed from the reference's
comments: "the sampler is a nn.Conv3d over time, height, width with pad=1,
stride=2; e.g. 12, 24, 24 -> 7, 13, 13" (extractfeatures.py:206-209;
lazyloading.py:103-108), producing 169 tokens/frame x 7 frames = 1183 visual
tokens of LLM width 4096 (litmodule.py:242-243).

Architecture (VideoLLaMA2 paper, arXiv:2406.07476, STC = RegStage ->
Conv3d(k=2, s=2, p=1) -> RegStage -> 2-layer MLP):

- ``s1``: RegNet-Y stage (depth 4) per frame, CLIP width (1024) -> LLM width;
- ``sampler``: Conv3d kernel (2,2,2), stride (2,2,2), padding 1 (+SiLU) —
  out_size = floor(in/2)+1 on every axis (12->7, 24->13);
- ``s2``: RegNet-Y stage (depth 4) per downsampled frame;
- ``readout``: Linear -> GELU -> Linear to the LLM hidden size.

RegNet-Y bottleneck block (timm ``RegStage`` with its defaults as invoked by
VideoLLaMA2: bottle_ratio=1, group_size=1 => depthwise 3x3, se_ratio=0.25,
act=SiLU, norm=LayerNorm over channels): 1x1 conv -> depthwise 3x3 -> SE ->
1x1 conv, residual with a 1x1 projection when channels change.

Everything is NHWC / NDHWC (TPU-native); tokens flatten in (t, h, w) order.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["STCConfig", "STCConnector"]


@dataclasses.dataclass(frozen=True)
class STCConfig:
    encoder_hidden_size: int = 1024   # CLIP ViT-L width
    hidden_size: int = 4096           # LLM width (connector internal width)
    output_hidden_size: int = 4096
    depth: int = 4
    mlp_depth: int = 2
    se_ratio: float = 0.25
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @staticmethod
    def tiny(**overrides) -> "STCConfig":
        base = dict(
            encoder_hidden_size=64, hidden_size=96, output_hidden_size=64,
            depth=1, dtype=jnp.float32,
        )
        base.update(overrides)
        return STCConfig(**base)


class ChannelLayerNorm(nn.Module):
    """timm LayerNorm2d equivalent: LN over the channel (last, NHWC) axis."""

    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # eps matches torch nn.LayerNorm (timm LayerNorm2d subclass) default.
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            param_dtype=self.param_dtype)(x)


class SqueezeExcite(nn.Module):
    channels: int
    rd_channels: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        a = nn.Conv(self.rd_channels, (1, 1), name="fc1",
                    dtype=self.dtype, param_dtype=self.param_dtype)(pooled)
        a = nn.silu(a)
        a = nn.Conv(self.channels, (1, 1), name="fc2",
                    dtype=self.dtype, param_dtype=self.param_dtype)(a)
        return x * nn.sigmoid(a)


class RegBottleneck(nn.Module):
    """RegNet-Y bottleneck (timm ``Bottleneck`` at VideoLLaMA2's settings)."""

    in_chs: int
    out_chs: int
    se_ratio: float = 0.25
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda feats, k, name, groups=1: nn.Conv(  # noqa: E731
            feats, (k, k), feature_group_count=groups, use_bias=False,
            padding="SAME", name=name, dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        norm = lambda name: ChannelLayerNorm(  # noqa: E731
            dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )

        shortcut = x
        h = nn.silu(norm("norm1")(conv(self.out_chs, 1, "conv1")(x)))
        # group_size=1 in timm => groups == width => depthwise 3x3.
        h = nn.silu(norm("norm2")(conv(self.out_chs, 3, "conv2", groups=self.out_chs)(h)))
        if self.se_ratio:
            rd = max(1, int(round(self.in_chs * self.se_ratio)))
            h = SqueezeExcite(self.out_chs, rd, self.dtype, self.param_dtype,
                              name="se")(h)
        h = norm("norm3")(conv(self.out_chs, 1, "conv3")(h))
        if self.in_chs != self.out_chs:
            shortcut = norm("downsample_norm")(
                conv(self.out_chs, 1, "downsample_conv")(x)
            )
        return nn.silu(h + shortcut)


class RegStage(nn.Module):
    depth: int
    in_chs: int
    out_chs: int
    se_ratio: float = 0.25
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = RegBottleneck(
                self.in_chs if i == 0 else self.out_chs,
                self.out_chs,
                self.se_ratio,
                self.dtype,
                self.param_dtype,
                name=f"b{i + 1}",
            )(x)
        return x


class STCConnector(nn.Module):
    config: STCConfig

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        """features: (B, T, H, W, C_enc) CLIP patch grid -> (B, T'*H'*W', out)."""
        cfg = self.config
        b, t, h, w, c = features.shape
        x = features.astype(cfg.dtype)

        # s1: per-frame RegNet stage at full resolution.
        x = x.reshape(b * t, h, w, c)
        x = RegStage(cfg.depth, cfg.encoder_hidden_size, cfg.hidden_size,
                     cfg.se_ratio, cfg.dtype, cfg.param_dtype, name="s1")(x)
        x = x.reshape(b, t, h, w, cfg.hidden_size)

        # sampler: Conv3d k=2 s=2 p=1 over (t, h, w)  => floor(n/2)+1.
        x = nn.Conv(
            cfg.hidden_size,
            kernel_size=(2, 2, 2),
            strides=(2, 2, 2),
            padding=((1, 1), (1, 1), (1, 1)),
            name="sampler_conv",
            use_bias=True,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
        )(x)
        x = nn.silu(x)
        _, td, hd, wd, _ = x.shape

        # s2: per-downsampled-frame RegNet stage.
        x = x.reshape(b * td, hd, wd, cfg.hidden_size)
        x = RegStage(cfg.depth, cfg.hidden_size, cfg.hidden_size,
                     cfg.se_ratio, cfg.dtype, cfg.param_dtype, name="s2")(x)

        # readout MLP: Linear (+ GELU Linear) * (mlp_depth - 1).
        x = nn.Dense(cfg.output_hidden_size, name="readout_0",
                     dtype=cfg.dtype, param_dtype=cfg.param_dtype)(x)
        for i in range(1, cfg.mlp_depth):
            x = nn.gelu(x, approximate=False)
            x = nn.Dense(cfg.output_hidden_size, name=f"readout_{i}",
                         dtype=cfg.dtype, param_dtype=cfg.param_dtype)(x)

        # flatten tokens in (t, h, w) order.
        return x.reshape(b, td * hd * wd, cfg.output_hidden_size)
