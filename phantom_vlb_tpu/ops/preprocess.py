"""Fused on-device image preprocessing (square-pad + resize + normalize).

The reference preprocesses frames per-TR on the CPU with PIL + the HF CLIP
processor (expand2square + resize + normalize; extractfeatures.py:345-348) —
the extraction throughput bottleneck after decode.  Here the whole chain runs
as ONE jitted XLA program on device: uint8 frames in, normalized NCHW float
out. XLA fuses pad/scale/normalize into the resize gather; batching many
frames per call keeps the TPU busy while the C++ decoder streams.

Parity: the host path (data/video.py::clip_preprocess, PIL bicubic) remains
the byte-parity reference; the device path matches within ~1/255 (both use
Keys cubic a=-0.5 with antialiasing; PIL and XLA differ in edge handling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from phantom_vlb_tpu.data.video import CLIP_MEAN, CLIP_STD

__all__ = ["device_preprocess", "DevicePreprocessor"]


@functools.partial(jax.jit, static_argnums=(1,))
def _preprocess_jit(frames: jnp.ndarray, image_size: int) -> jnp.ndarray:
    """(N, H, W, 3) uint8 -> (N, 3, S, S) float32 normalized."""
    n, h, w, _ = frames.shape
    x = frames.astype(jnp.float32) / 255.0

    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)

    # Square-pad with the CLIP mean fill (expand2square semantics: centered;
    # fill color = uint8-rounded mean, as the reference computes
    # tuple(int(m*255)) then renormalizes it).
    side = max(h, w)
    fill = jnp.floor(mean * 255.0) / 255.0
    if h != w:
        pad_total = side - min(h, w)
        lo = pad_total // 2
        hi = pad_total - lo
        if w > h:
            pad_width = ((0, 0), (lo, hi), (0, 0), (0, 0))
        else:
            pad_width = ((0, 0), (0, 0), (lo, hi), (0, 0))
        x = jnp.stack(
            [
                jnp.pad(x[..., c], pad_width[:-1], constant_values=fill[c])
                for c in range(3)
            ],
            axis=-1,
        )

    x = jax.image.resize(
        x, (n, image_size, image_size, 3), method="bicubic", antialias=True
    )
    x = (x - mean) / std
    return jnp.transpose(x, (0, 3, 1, 2))


def _bucket(n: int, step: int = 64) -> int:
    return max(step, ((n + step - 1) // step) * step)


def device_preprocess(frames: np.ndarray, image_size: int) -> np.ndarray:
    """One-shot helper; batch is padded to a size bucket so varying unique-
    frame counts reuse one compiled program instead of recompiling."""
    n = frames.shape[0]
    m = _bucket(n)
    if m != n:
        frames = np.concatenate(
            [frames, np.zeros((m - n, *frames.shape[1:]), frames.dtype)]
        )
    out = np.asarray(_preprocess_jit(jnp.asarray(frames), image_size))
    return out[:n]


class DevicePreprocessor:
    """Callable preprocessor for the extraction pipeline (device path).

    Pass as ``preprocess=DevicePreprocessor(geom.image_size)`` where a
    ``clip_preprocess``-shaped callable is expected.
    """

    def __init__(self, image_size: int):
        self.image_size = image_size

    def __call__(self, images) -> np.ndarray:
        batch = np.stack([np.asarray(img) for img in images])
        return device_preprocess(batch, self.image_size)
