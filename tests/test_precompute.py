"""Feature-cache path: exact equality with the full forward (baseline regime)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phantom_vlb_tpu.data.lazyload_build import LazyloadBuildConfig, build_lazyload_dsets
from phantom_vlb_tpu.data.loader import BatchLoader, LazyDataset
from phantom_vlb_tpu.data.synthetic import (
    TEST_GEOMETRY,
    write_synthetic_bold_file,
    write_synthetic_features_file,
)
from phantom_vlb_tpu.models.heads import BrainReadoutHead
from phantom_vlb_tpu.models.videollama2 import VLBConfig, VideoLLaMA2VLB
from phantom_vlb_tpu.ops.weight_mask import build_weight_mask
from phantom_vlb_tpu.train.precompute import (
    CachedFeatureLoader,
    build_feature_cache,
    head_forward_fn,
    support_gather,
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("cache")
    eps = {"s01e01a": 10, "s01e01b": 9}
    write_synthetic_features_file(root / "f.h5", eps, TEST_GEOMETRY, seed=0)
    write_synthetic_bold_file(root / "b.h5", eps, TEST_GEOMETRY, seed=1)
    (root / "lazy").mkdir()
    paths = build_lazyload_dsets(
        LazyloadBuildConfig(
            str(root / "f.h5"), str(root / "b.h5"), str(root / "lazy"),
            "sub-01", "s1", 1, TEST_GEOMETRY,
        )
    )
    cfg = VLBConfig.tiny(dropout_rate=0.0)
    model = VideoLLaMA2VLB(cfg)
    loader = BatchLoader(LazyDataset(paths), batch_size=4, shuffle=False, prefetch=0)
    b0 = next(iter(loader))
    params = model.init(
        jax.random.key(0),
        jnp.asarray(b0.language), jnp.asarray(b0.vision), jnp.asarray(b0.padvals),
        jnp.asarray(b0.vis_weights), jnp.asarray(b0.lang_weights),
    )["params"]
    return root, cfg, model, params, loader


def test_support_gather_pooling_identity(setup):
    """Pooling over the gathered support == pooling over the full sequence."""
    _, cfg, model, params, loader = setup
    g = cfg.geometry
    b = next(iter(loader))
    hidden, _ = model.apply(
        {"params": params}, jnp.asarray(b.language), jnp.asarray(b.vision),
        method=lambda m, l, v: m.backbone(l, v),
    )
    full_mask = build_weight_mask(
        jnp.asarray(b.padvals), jnp.asarray(b.vis_weights),
        jnp.asarray(b.lang_weights), g,
    )
    pooled_full = jnp.einsum("bse,bs->be", hidden.astype(jnp.float32), full_mask)

    feats, weights = support_gather(
        hidden, jnp.asarray(b.padvals), jnp.asarray(b.vis_weights),
        jnp.asarray(b.lang_weights), g,
    )
    pooled_support = jnp.einsum("bke,bk->be", feats.astype(jnp.float32), weights)
    np.testing.assert_allclose(
        np.asarray(pooled_full), np.asarray(pooled_support), rtol=1e-4, atol=1e-4
    )


def test_cache_head_prediction_equality(setup):
    """Head predictions from the cache match the full model forward (f16 cache)."""
    root, cfg, model, params, loader = setup
    cache_path = root / "cache.h5"
    n = build_feature_cache(model, params, loader, cache_path, cfg.geometry)
    assert n == len(loader.dataset)

    head = BrainReadoutHead(
        hidden_size=cfg.mistral.hidden_size, num_target=cfg.num_target,
        l2_lambda=cfg.l2_lambda, dropout_rate=0.0,
    )
    fwd = head_forward_fn(head)

    cached = CachedFeatureLoader(cache_path, batch_size=4, shuffle=False)
    cache_preds = []
    for cb in cached:
        pred, _ = fwd({k: v for k, v in params["head"].items()},
                      {k: jnp.asarray(v) for k, v in cb.items()},
                      jax.random.key(0), False)
        cache_preds.append(np.asarray(pred)[cb["row_mask"] > 0])
    cache_preds = np.concatenate(cache_preds)

    full_preds = []
    for b in loader:
        pred, _ = model.apply(
            {"params": params},
            jnp.asarray(b.language), jnp.asarray(b.vision), jnp.asarray(b.padvals),
            jnp.asarray(b.vis_weights), jnp.asarray(b.lang_weights),
        )
        full_preds.append(np.asarray(pred)[b.row_mask > 0])
    full_preds = np.concatenate(full_preds)

    assert cache_preds.shape == full_preds.shape
    # f16 cache quantization is the only difference.
    np.testing.assert_allclose(cache_preds, full_preds, atol=2e-2, rtol=2e-2)
