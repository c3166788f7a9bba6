"""Feature-cache path: head-only training on precomputed backbone features.

In the frozen-backbone baseline regime (freeze_backbone=True, the
train_run_baseline.sh recipe) the 7B backbone's hidden states per sample
never change, yet the reference recomputes them every epoch x every val pass
(litmodule.py:229-256).  Here the backbone runs ONCE per sample and only the
positions that can ever receive nonzero HRF weight are cached:

  support = [vis segment: pad_left .. pad_left+num_vis_tokens)
             (weights = vis_weights repeat-interleaved tokens_per_frame)] +
            [lang segment: lang_start .. lang_start+onsets_width)
             (weights = lang_weights; zero beyond diag_len)]

K = num_vis_tokens + onsets_width positions (1247 at production geometry,
~10 MB/sample in f16 vs 93 TFLOP to recompute).  Head training over the cache
is EXACTLY equal to the full forward: zero-weight positions contribute
nothing to the HRF pooling, and LN1 acts per token (models/heads.py), so
dropping them changes no math.  This implements BASELINE.md config #2
("ridge/linear BOLD head on precomputed features") and makes the baseline
recipe ~max_epochs x cheaper.
"""

from __future__ import annotations

from pathlib import Path

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from phantom_vlb_tpu.core.geometry import VLBGeometry
from phantom_vlb_tpu.ops.weight_mask import JOINER_PRE, JOINER_POST

__all__ = [
    "support_gather",
    "build_feature_cache",
    "CachedFeatureLoader",
    "head_forward_fn",
]


def support_gather(hidden, padvals, vis_weights, lang_weights, geom: VLBGeometry):
    """(hidden (B,S,E), mask inputs) -> (features (B,K,E), weights (B,K)).

    K = num_vis_tokens + onsets_width; layout [vis support, lang window].
    """
    b, s, e = hidden.shape
    V = geom.num_vis_tokens
    W = geom.onsets_width
    tpf = geom.tokens_per_frame

    padvals = padvals.astype(jnp.int32)
    pad_len = padvals[:, 0:1]
    inst_len = padvals[:, 1:2]
    diag_len = padvals[:, 2:3]
    trial_len = V + JOINER_PRE + inst_len + diag_len + JOINER_POST + pad_len
    pad_left = geom.feature_len - trial_len              # (B,1)
    lang_start = pad_left + V + JOINER_PRE + inst_len    # (B,1)

    vis_pos = pad_left + jnp.arange(V, dtype=jnp.int32)[None, :]      # (B,V)
    lang_pos = lang_start + jnp.arange(W, dtype=jnp.int32)[None, :]   # (B,W)
    # The lang window may run past the sequence for large diag/pad combos;
    # clamp (those positions carry zero weight anyway).
    pos = jnp.clip(jnp.concatenate([vis_pos, lang_pos], axis=1), 0, s - 1)

    features = jnp.take_along_axis(hidden, pos[..., None], axis=1)

    vis_w = jnp.repeat(vis_weights.astype(jnp.float32), tpf, axis=1)  # (B,V)
    lang_idx = jnp.arange(W, dtype=jnp.int32)[None, :]
    lang_w = jnp.where(lang_idx < diag_len, lang_weights.astype(jnp.float32), 0.0)
    weights = jnp.concatenate([vis_w, lang_w], axis=1)
    return features, weights


def build_feature_cache(model, params, loader, path: str | Path,
                        geom: VLBGeometry, dtype=jnp.bfloat16) -> int:
    """Sweep ``loader`` through the frozen backbone; write the cache file.

    HDF5 layout: per sample ``{i}_features`` (K, E) bf16-as-f16-bytes,
    ``{i}_weights`` (K,) f32, ``{i}_timeseries`` (P,) f32; root ``dset_len``.
    """
    path = Path(path)

    @jax.jit
    def encode(language, vision, padvals, vis_w, lang_w):
        hidden, _ = model.apply(
            {"params": params}, language, vision,
            method=lambda m, l, v: m.backbone(l, v),
        )
        feats, weights = support_gather(hidden, padvals, vis_w, lang_w, geom)
        return feats.astype(dtype), weights

    idx = 0
    with h5py.File(path, "w") as f:
        for batch in loader:
            feats, weights = encode(
                jnp.asarray(batch.language), jnp.asarray(batch.vision),
                jnp.asarray(batch.padvals), jnp.asarray(batch.vis_weights),
                jnp.asarray(batch.lang_weights),
            )
            feats = np.asarray(feats.astype(jnp.float16))
            weights = np.asarray(weights)
            ts = np.asarray(batch.timeseries, np.float32)
            for row in range(feats.shape[0]):
                if batch.row_mask[row] <= 0:
                    continue
                g = f.create_group(f"{idx}")
                g.create_dataset(f"{idx}_features", data=feats[row])
                g.create_dataset(f"{idx}_weights", data=weights[row])
                g.create_dataset(f"{idx}_timeseries", data=ts[row])
                idx += 1
        f.create_dataset("dset_len", data=[idx])
    return idx


class CachedFeatureLoader:
    """Batches over a feature-cache file (fixed shapes + row mask)."""

    def __init__(self, path: str | Path, batch_size: int,
                 shuffle: bool = True, seed: int = 0):
        self.path = str(path)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0
        with h5py.File(self.path, "r") as f:
            self.length = int(np.asarray(f["dset_len"])[0])

    def __len__(self):
        return (self.length + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        idx = np.arange(self.length)
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idx)
        self._epoch += 1
        with h5py.File(self.path, "r") as f:
            for i in range(0, self.length, self.batch_size):
                rows = idx[i : i + self.batch_size]
                feats = np.stack([
                    np.asarray(f[f"{j}"][f"{j}_features"]) for j in rows
                ]).astype(np.float32)
                weights = np.stack([
                    np.asarray(f[f"{j}"][f"{j}_weights"]) for j in rows
                ])
                ts = np.stack([
                    np.asarray(f[f"{j}"][f"{j}_timeseries"]) for j in rows
                ])
                pad = self.batch_size - len(rows)
                if pad:
                    feats = np.concatenate([feats, np.repeat(feats[-1:], pad, 0)])
                    weights = np.concatenate([weights, np.repeat(weights[-1:], pad, 0)])
                    ts = np.concatenate([ts, np.repeat(ts[-1:], pad, 0)])
                yield {
                    "hidden": feats,
                    "weights": weights,
                    "timeseries": ts,
                    "row_mask": np.concatenate(
                        [np.ones(len(rows), np.float32), np.zeros(pad, np.float32)]
                    ),
                }


def head_forward_fn(head_module):
    """ForwardFn over cached batches (train/step.py signature)."""

    def forward(params, batch, rng, train):
        return head_module.apply(
            {"params": params},
            batch["hidden"],
            batch["weights"],
            deterministic=not train,
            rngs={"dropout": rng} if train else {},
        )

    return forward
