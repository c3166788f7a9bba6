"""HRF weight-mask construction — vectorized, jit-compatible.

The reference builds the per-sample weight mask with a pure-Python loop on the
host every step (``make_weight_mask``, litmodule.py:178-203) — a secondary hot
spot called out in SURVEY.md §3.1.  Here the same layout is produced entirely
with vectorized gathers inside jit, so it fuses into the training step.

Layout (positions within the ``feature_len`` multimodal sequence, per sample)::

    [pad_left zeros]
    [num_vis_tokens vision weights: vis_weights[f] repeated tokens_per_frame x]
    [2 + inst_len zeros]                  (joiner + instruction tokens)
    [diag_len language weights]
    [4 + pad_len zeros]                   ([/INST] joiner + right padding)

with ``pad_left = feature_len - (num_vis + 2 + inst + diag + 4 + pad)``.
The +2/+4 constants are the chat-template joiner token counts
(extractfeatures.py:278-281).
"""

from __future__ import annotations

import jax.numpy as jnp

from phantom_vlb_tpu.core.geometry import VLBGeometry

__all__ = ["build_weight_mask", "JOINER_PRE", "JOINER_POST"]

JOINER_PRE = 2
JOINER_POST = 4


def build_weight_mask(
    padvals: jnp.ndarray,       # (B, 3) int  [pad_len, inst_len, diag_len]
    vis_weights: jnp.ndarray,   # (B, num_ds_frames) float
    lang_weights: jnp.ndarray,  # (B, onsets_width) float
    geom: VLBGeometry,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Return the (B, feature_len) HRF weight mask."""
    L = geom.feature_len
    V = geom.num_vis_tokens
    tpf = geom.tokens_per_frame
    D = geom.num_ds_frames
    W = geom.onsets_width

    padvals = padvals.astype(jnp.int32)
    pad_len = padvals[:, 0:1]
    inst_len = padvals[:, 1:2]
    diag_len = padvals[:, 2:3]

    pos = jnp.arange(L, dtype=jnp.int32)[None, :]              # (1, L)
    trial_len = V + JOINER_PRE + inst_len + diag_len + JOINER_POST + pad_len
    pad_left = L - trial_len                                   # (B, 1)

    # Vision segment.
    vis_off = pos - pad_left                                   # (B, L)
    in_vis = (vis_off >= 0) & (vis_off < V)
    frame_idx = jnp.clip(vis_off // tpf, 0, D - 1)
    vis_gather = jnp.take_along_axis(
        vis_weights.astype(dtype), frame_idx, axis=1
    )

    # Language segment.
    lang_start = pad_left + V + JOINER_PRE + inst_len
    lang_off = pos - lang_start
    in_lang = (lang_off >= 0) & (lang_off < diag_len)
    lang_gather = jnp.take_along_axis(
        lang_weights.astype(dtype), jnp.clip(lang_off, 0, W - 1), axis=1
    )

    zero = jnp.zeros((), dtype)
    return jnp.where(in_vis, vis_gather, zero) + jnp.where(in_lang, lang_gather, zero)
