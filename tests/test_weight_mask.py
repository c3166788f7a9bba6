"""Vectorized weight mask vs a direct transliteration of the reference loop."""

import numpy as np
import jax.numpy as jnp

from phantom_vlb_tpu.core.geometry import REFERENCE_GEOMETRY
from phantom_vlb_tpu.data.synthetic import TEST_GEOMETRY
from phantom_vlb_tpu.ops.weight_mask import build_weight_mask


def reference_weight_mask(padvals, vis_weights, lang_weights, geom):
    """Numpy port of the semantics of litmodule.py:178-203."""
    feature_len = vis_weights.shape[1] * geom.tokens_per_frame + lang_weights.shape[0] * 0 + geom.max_lang_tokens - 1
    assert feature_len == geom.feature_len
    rows = []
    for i in range(padvals.shape[0]):
        pad_len, inst_len, diag_len = padvals[i]
        trial = np.concatenate(
            [
                np.repeat(vis_weights[i], geom.tokens_per_frame),
                np.zeros(2 + inst_len),
                lang_weights[i][:diag_len],
                np.zeros(4 + pad_len),
            ]
        )
        pad_left = feature_len - trial.shape[0]
        rows.append(np.concatenate([np.zeros(pad_left), trial]))
    return np.stack(rows)


def _random_inputs(geom, batch, seed=0):
    rng = np.random.default_rng(seed)
    inst_len = 4
    padvals = []
    for _ in range(batch):
        diag_len = int(rng.integers(2, geom.onsets_width))
        budget = geom.max_lang_tokens - 1 - 2 - inst_len - diag_len - 4
        pad_len = int(rng.integers(0, budget))
        padvals.append([pad_len, inst_len, diag_len])
    padvals = np.array(padvals, np.int32)
    vis_w = rng.standard_normal((batch, geom.num_ds_frames)).astype(np.float32)
    lang_w = rng.standard_normal((batch, geom.onsets_width)).astype(np.float32)
    return padvals, vis_w, lang_w


def test_mask_parity_tiny():
    geom = TEST_GEOMETRY
    padvals, vis_w, lang_w = _random_inputs(geom, batch=6)
    ours = np.asarray(build_weight_mask(jnp.asarray(padvals), jnp.asarray(vis_w), jnp.asarray(lang_w), geom))
    ref = reference_weight_mask(padvals, vis_w, lang_w, geom)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_mask_parity_reference_geometry():
    geom = REFERENCE_GEOMETRY
    padvals, vis_w, lang_w = _random_inputs(geom, batch=3, seed=1)
    ours = np.asarray(build_weight_mask(jnp.asarray(padvals), jnp.asarray(vis_w), jnp.asarray(lang_w), geom))
    assert ours.shape == (3, 2048)
    ref = reference_weight_mask(padvals, vis_w, lang_w, geom)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_mask_zero_diag():
    geom = TEST_GEOMETRY
    padvals = np.array([[5, 4, 0]], np.int32)
    vis_w = np.ones((1, geom.num_ds_frames), np.float32)
    lang_w = np.full((1, geom.onsets_width), 7.0, np.float32)
    out = np.asarray(build_weight_mask(jnp.asarray(padvals), jnp.asarray(vis_w), jnp.asarray(lang_w), geom))
    # No language contribution at all; vision sums to num_vis_tokens.
    assert out.sum() == geom.num_vis_tokens
    assert not np.any(out == 7.0)
