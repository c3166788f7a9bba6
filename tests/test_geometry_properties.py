"""Property tests: geometry invariants + weight-mask layout across random
geometries (the 866/1183/2048 arithmetic family, SURVEY.md §4c)."""

import numpy as np
import jax.numpy as jnp
import pytest

from phantom_vlb_tpu.core.geometry import VLBGeometry
from phantom_vlb_tpu.ops.weight_mask import JOINER_POST, JOINER_PRE, build_weight_mask


def random_geometries(n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    while len(out) < n:
        frames_per_tr = int(rng.integers(1, 5))
        window = int(rng.integers(2, 5))
        patch_mult = int(rng.integers(2, 8))  # image_size = 14 * patch_mult
        g_try = VLBGeometry(
            frames_per_tr=frames_per_tr,
            window=window,
            delay=int(rng.integers(1, 4)),
            model_max_length=0,  # fixed below
            image_size=14 * patch_mult,
            onsets_width=int(rng.integers(8, 64)),
            num_parcels=int(rng.integers(4, 32)),
        )
        # Choose a text budget, then the consistent model_max_length.
        max_lang = int(rng.integers(16, 256))
        import dataclasses

        g = dataclasses.replace(
            g_try, model_max_length=g_try.num_vis_tokens + max_lang - 1
        )
        if g.num_ds_frames >= 2 and g.max_lang_tokens > 10:
            g.validate()
            out.append(g)
    return out


@pytest.mark.parametrize("geom", random_geometries(12))
def test_geometry_invariants(geom):
    # The litmodule.py:180-181 assertion family.
    assert geom.feature_len == geom.model_max_length
    assert geom.num_vis_tokens == geom.num_ds_frames * geom.ds_grid**2
    assert geom.max_lang_tokens == geom.model_max_length - geom.num_vis_tokens + 1
    # Conv3d k2 s2 p1 arithmetic.
    assert geom.num_ds_frames == geom.num_frames // 2 + 1
    assert geom.ds_grid == geom.patch_grid // 2 + 1
    # HRF window geometry.
    deltas = geom.vision_onset_deltas()
    assert len(deltas) == geom.num_ds_frames
    assert deltas[0] == pytest.approx(geom.tr * geom.abs_tr_delay)
    assert np.all(np.diff(deltas) < 0)  # strictly walking toward the TR


@pytest.mark.parametrize("geom", random_geometries(6, seed=1))
def test_weight_mask_budget(geom):
    """Sum of the mask equals vis total + selected lang weights, any geometry."""
    rng = np.random.default_rng(3)
    B = 3
    inst_len = 4
    padvals = []
    for _ in range(B):
        diag = int(rng.integers(1, min(geom.onsets_width, geom.max_lang_tokens
                                        - 1 - JOINER_PRE - inst_len - JOINER_POST - 1)))
        budget = geom.max_lang_tokens - 1 - JOINER_PRE - inst_len - diag - JOINER_POST
        pad = int(rng.integers(0, budget + 1))
        padvals.append([pad, inst_len, diag])
    padvals = np.array(padvals, np.int32)
    vis_w = rng.uniform(0.1, 1.0, (B, geom.num_ds_frames)).astype(np.float32)
    lang_w = rng.uniform(0.1, 1.0, (B, geom.onsets_width)).astype(np.float32)

    mask = np.asarray(
        build_weight_mask(jnp.asarray(padvals), jnp.asarray(vis_w),
                          jnp.asarray(lang_w), geom)
    )
    assert mask.shape == (B, geom.feature_len)
    for b in range(B):
        expected = (
            vis_w[b].sum() * geom.tokens_per_frame
            + lang_w[b, : padvals[b, 2]].sum()
        )
        np.testing.assert_allclose(mask[b].sum(), expected, rtol=1e-5)
