"""LoRA adapters reach through the backbone; a head alone cannot.

Teacher = the student backbone with a rank-2 perturbation added to every
q_proj kernel; BOLD targets come from the teacher's pooled representation.
A linear head on the *unperturbed* backbone can only partially fit those
targets; LoRA adapters (rank 4 >= 2) can represent the teacher exactly, so
the LoRA regime fits the training split far better — direct evidence that
adapter gradients flow through the frozen backbone (splice, scan, attention)
and that the two reference regimes (baseline.yaml vs lora.yaml) differ in
exactly the intended way.

At this toy scale (~50 training clips, adapters on every projection) the
LoRA run overfits, so we assert on the mechanical claim (training-split fit)
plus sanity floors on validation Pearson r, not on a val-set win.
"""

import h5py
import numpy as np
import pandas as pd
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


def _strip_lora(tree):
    if isinstance(tree, dict):
        return {
            k: _strip_lora(v)
            for k, v in tree.items()
            if k not in ("lora_a", "lora_b")
        }
    return tree


@pytest.mark.slow
def test_lora_fits_lowrank_delta_head_cannot(tmp_path):
    g = TEST_GEOMETRY
    eps = {"s01e01a": 44, "s01e01b": 40, "s01e02a": 22}
    write_synthetic_features_file(tmp_path / "f.h5", eps, g, seed=0)
    write_synthetic_bold_file(tmp_path / "b.h5", eps, g, seed=1)
    (tmp_path / "lazy").mkdir()
    paths = build_lazyload_dsets(
        LazyloadBuildConfig(
            str(tmp_path / "f.h5"), str(tmp_path / "b.h5"),
            str(tmp_path / "lazy"), "sub-01", "s1", 2, g,
        )
    )

    lora_cfg = VLBConfig.tiny(use_lora=True, dropout_rate=0.0)
    base_cfg = VLBConfig.tiny(use_lora=False, dropout_rate=0.0)
    lora_model = VideoLLaMA2VLB(lora_cfg)
    base_model = VideoLLaMA2VLB(base_cfg)

    ds = LazyDataset(paths)
    probe = BatchLoader(ds, batch_size=4, shuffle=False, prefetch=0)
    first = next(iter(probe))
    args0 = (
        jnp.asarray(first.language), jnp.asarray(first.vision),
        jnp.asarray(first.padvals), jnp.asarray(first.vis_weights),
        jnp.asarray(first.lang_weights),
    )
    # lora_b inits to zero, so stripping the adapters gives a base model with
    # the identical forward function — both regimes start from the same point.
    lora_params = lora_model.init(jax.random.key(0), *args0)["params"]
    base_params = jax.tree.map(np.asarray, _strip_lora(lora_params))

    # Teacher: base + rank-2 delta on every q_proj.
    rng = np.random.default_rng(5)
    teacher = jax.tree.map(np.copy, base_params)
    for name, layer in teacher["model"].items():
        if not name.startswith("layers_"):
            continue
        w = layer["self_attn"]["q_proj"]["kernel"]
        u = rng.standard_normal((w.shape[0], 2)).astype(np.float32)
        vv = rng.standard_normal((2, w.shape[1])).astype(np.float32)
        delta = u @ vv
        delta *= 1.5 * np.abs(w).mean() / (np.abs(delta).mean() + 1e-9)
        layer["self_attn"]["q_proj"]["kernel"] = w + delta
    teacher_params = jax.tree.map(jnp.asarray, teacher)

    def _ln(x):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-6)

    @jax.jit
    def teacher_rep(lang, vid, padvals, vis_w, lang_w):
        hidden, _ = base_model.apply(
            {"params": teacher_params}, lang, vid,
            method=lambda m, l, v: m.backbone(l, v),
        )
        mask = build_weight_mask(padvals, vis_w, lang_w, g)
        return _ln(jnp.einsum("bse,bs->be", _ln(hidden.astype(jnp.float32)), mask))

    w_true = rng.standard_normal((lora_cfg.mistral.hidden_size, g.num_parcels))
    w_true = w_true.astype(np.float32)
    reps = []
    for b in BatchLoader(ds, batch_size=4, shuffle=False, prefetch=0):
        r = teacher_rep(
            jnp.asarray(b.language), jnp.asarray(b.vision), jnp.asarray(b.padvals),
            jnp.asarray(b.vis_weights), jnp.asarray(b.lang_weights),
        )
        reps.append(np.asarray(r)[b.row_mask > 0])
    targets = np.concatenate(reps) @ w_true
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

    def train(model, params, run_name):
        labels = trainable_labels(params, trainable_predicate)
        trainer = VLBTrainer(
            vlb_forward_fn(model), params,
            OptimConfig(lr=5e-3, t_max=50000),
            TrainLoopConfig(
                max_epochs=25, val_check_interval=0.0,
                log_every_n_steps=10, output_dir=str(tmp_path / run_name),
                run_name=run_name, num_target=g.num_parcels, checkpoint=False,
            ),
            trainable_label_tree=labels,
        )
        tl = BatchLoader(LazyDataset(paths[:1]), batch_size=4, seed=0, prefetch=0)
        vl = BatchLoader(LazyDataset(paths[1:]), batch_size=4, shuffle=False, prefetch=0)
        corr = trainer.fit(tl, vl)["val_corr_avg"]
        df = pd.read_csv(trainer.csv_logger.path)
        train_loss = df["train/brain_loss"].dropna().to_numpy()[-5:].mean()
        return corr, train_loss

    head_corr, head_loss = train(base_model, jax.tree.map(jnp.asarray, base_params), "head")
    lora_corr, lora_loss = train(lora_model, lora_params, "lora")

    # Mechanical claim: the adapters fit the planted delta, the head cannot
    # (measured ratio ~0.25x; generous margin for numerics drift).
    assert lora_loss < 0.6 * head_loss, (head_loss, lora_loss)
    # Sanity floors: both regimes train stably and transfer something.
    assert head_corr > 0.5, head_corr
    assert lora_corr > 0.25, lora_corr


def test_adapter_dropout_u8_semantics():
    """u8-threshold dropout: realized rate == round(p*256)/256, unbiased."""
    import flax.linen as nn
    from phantom_vlb_tpu.models.lora import LoRAConfig, adapter_dropout

    cfg = LoRAConfig(dropout=0.1, dropout_bits=8)
    assert abs(cfg.dropout_keep_prob - (1 - 26 / 256)) < 1e-9

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return adapter_dropout(self, x, cfg)

    x = jnp.ones((64, 4096), jnp.float32)
    out = M().apply({}, x, rngs={"dropout": jax.random.key(0)})
    drop_rate = float((out == 0).mean())
    assert abs(drop_rate - 26 / 256) < 5e-3
    # Unbiased: surviving entries are rescaled by the exact keep prob.
    nz = np.asarray(out)[np.asarray(out) != 0]
    np.testing.assert_allclose(nz, 1 / cfg.dropout_keep_prob, rtol=1e-6)
    np.testing.assert_allclose(float(out.mean()), 1.0, atol=5e-3)
