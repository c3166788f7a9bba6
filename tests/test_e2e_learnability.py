"""End-to-end learnability: the full multimodal pipeline recovers a planted
linear brain code.

Synthetic BOLD is generated THROUGH the actual frozen backbone: for every
lazy-load sample we compute the HRF-pooled backbone representation (with the
same init params used for training) and set
``timeseries = pooled @ W_true + noise``.  Training only the head must then
reach high validation Pearson r — evidence that splice, masking, HRF pooling
and the metrics stack are wired correctly end to end (the tiny-scale analog
of the reference's voxelwise-parity goal, SURVEY.md §6).
"""

import h5py
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
from phantom_vlb_tpu.models.videollama2 import (
    VLBConfig,
    VideoLLaMA2VLB,
    trainable_predicate,
    vlb_forward_fn,
)
from phantom_vlb_tpu.ops.weight_mask import build_weight_mask
from phantom_vlb_tpu.train.loop import TrainLoopConfig, VLBTrainer
from phantom_vlb_tpu.train.optim import OptimConfig, trainable_labels


@pytest.mark.slow
def test_full_pipeline_learns_planted_code(tmp_path):
    g = TEST_GEOMETRY
    eps = {"s01e01a": 48, "s01e01b": 44, "s01e02a": 24}
    write_synthetic_features_file(tmp_path / "f.h5", eps, g, seed=0)
    write_synthetic_bold_file(tmp_path / "b.h5", eps, g, seed=1)
    (tmp_path / "lazy").mkdir()
    paths = build_lazyload_dsets(
        LazyloadBuildConfig(
            str(tmp_path / "f.h5"), str(tmp_path / "b.h5"),
            str(tmp_path / "lazy"), "sub-01", "s1", 2, g,
        )
    )

    cfg = VLBConfig.tiny(use_lora=False, dropout_rate=0.0)
    model = VideoLLaMA2VLB(cfg)
    ds = LazyDataset(paths)
    probe = BatchLoader(ds, batch_size=4, shuffle=False, prefetch=0)
    first = next(iter(probe))
    params = model.init(
        jax.random.key(0),
        jnp.asarray(first.language), jnp.asarray(first.vision),
        jnp.asarray(first.padvals), jnp.asarray(first.vis_weights),
        jnp.asarray(first.lang_weights),
    )["params"]

    # Plant the code THROUGH the head's own init-state transform
    # (LN1 -> HRF pool -> LN2), so `ridge` only needs to learn W_true.
    def _ln(x):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-6)

    @jax.jit
    def pooled_rep(batch_lang, batch_vid, padvals, vis_w, lang_w):
        hidden, _ = model.apply(
            {"params": params}, batch_lang, batch_vid,
            method=lambda m, l, v: m.backbone(l, v),
        )
        mask = build_weight_mask(padvals, vis_w, lang_w, cfg.geometry)
        pooled = jnp.einsum(
            "bse,bs->be", _ln(hidden.astype(jnp.float32)), mask
        )
        return _ln(pooled)

    rng = np.random.default_rng(7)
    w_true = rng.standard_normal(
        (cfg.mistral.hidden_size, g.num_parcels)
    ).astype(np.float32)

    all_pooled = []
    for b in BatchLoader(ds, batch_size=4, shuffle=False, prefetch=0):
        rep = pooled_rep(
            jnp.asarray(b.language), jnp.asarray(b.vision),
            jnp.asarray(b.padvals), jnp.asarray(b.vis_weights),
            jnp.asarray(b.lang_weights),
        )
        all_pooled.append(np.asarray(rep)[b.row_mask > 0])
    pooled = np.concatenate(all_pooled)
    scale = 1.0 / (np.abs(pooled).mean() + 1e-9)
    targets = (pooled * scale) @ w_true
    targets += 0.05 * targets.std() * rng.standard_normal(targets.shape).astype(np.float32)

    # Overwrite the lazy-load timeseries in file order (== probe order).
    ds.close()
    row = 0
    for path in paths:
        with h5py.File(path, "a") as f:
            n = int(np.asarray(f["dset_len"])[0])
            for i in range(n):
                del f[f"{i}"][f"{i}_timeseries"]
                f[f"{i}"].create_dataset(f"{i}_timeseries", data=targets[row])
                row += 1
    assert row == len(targets)

    train_loader = BatchLoader(LazyDataset(paths[:1]), batch_size=4, seed=0, prefetch=0)
    val_loader = BatchLoader(LazyDataset(paths[1:]), batch_size=4, shuffle=False, prefetch=0)

    labels = trainable_labels(params, trainable_predicate)
    trainer = VLBTrainer(
        vlb_forward_fn(model),
        params,
        OptimConfig(lr=3e-2, t_max=5000),
        TrainLoopConfig(
            max_epochs=40, val_check_interval=0.0, log_every_n_steps=50,
            output_dir=str(tmp_path / "run"), run_name="learn",
            num_target=g.num_parcels, checkpoint=False,
        ),
        trainable_label_tree=labels,
    )
    final = trainer.fit(train_loader, val_loader)
    # Val split is a *different* file: generalization, not memorization.
    assert final["val_corr_avg"] > 0.8, final["val_corr_avg"]
