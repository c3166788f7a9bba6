"""End-to-end VLB model tests at tiny geometry: splice, freezing, LoRA, training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phantom_vlb_tpu.core.geometry import VIDEO_TOKEN_ID
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
    splice_multimodal,
    trainable_predicate,
    vlb_forward_fn,
)
from phantom_vlb_tpu.train.optim import OptimConfig, make_optimizer, trainable_labels
from phantom_vlb_tpu.train.step import init_train_state, make_eval_step, make_train_step


def test_splice_semantics():
    rng = np.random.default_rng(0)
    B, Lt, V, E = 2, 10, 4, 8
    ids = rng.integers(1, 50, (B, Lt))
    ids[0, 3] = VIDEO_TOKEN_ID
    ids[1, 7] = VIDEO_TOKEN_ID
    ids[0, -2:] = 0  # padding
    text_emb = rng.standard_normal((B, Lt, E)).astype(np.float32)
    vid_emb = rng.standard_normal((B, V, E)).astype(np.float32)

    out, valid = splice_multimodal(
        jnp.asarray(text_emb), jnp.asarray(ids), jnp.asarray(vid_emb)
    )
    out = np.asarray(out)
    valid = np.asarray(valid)
    assert out.shape == (B, Lt - 1 + V, E)

    # Sample 0: text[0:3], video[0:4], text[4:10]
    np.testing.assert_array_equal(out[0, :3], text_emb[0, :3])
    np.testing.assert_array_equal(out[0, 3:7], vid_emb[0])
    np.testing.assert_array_equal(out[0, 7:], text_emb[0, 4:])
    # Padding ids stay masked after splice; video positions valid.
    assert valid[0, 3:7].all()
    assert (valid[0, -2:] == 0).all()
    # Sample 1 at a different position.
    np.testing.assert_array_equal(out[1, 7:11], vid_emb[1])


@pytest.fixture(scope="module")
def tiny_batches(tmp_path_factory):
    root = tmp_path_factory.mktemp("vlbm")
    eps = {"s01e01a": 8, "s01e01b": 7}
    write_synthetic_features_file(root / "f.h5", eps, TEST_GEOMETRY, seed=0)
    write_synthetic_bold_file(root / "b.h5", eps, TEST_GEOMETRY, seed=1)
    (root / "lazy").mkdir()
    paths = build_lazyload_dsets(
        LazyloadBuildConfig(
            str(root / "f.h5"), str(root / "b.h5"), str(root / "lazy"),
            "sub-01", "s1", 2, TEST_GEOMETRY,
        )
    )
    ds = LazyDataset(paths)
    loader = BatchLoader(ds, batch_size=3, shuffle=False, prefetch=0)
    return list(loader)


def _init(config, batch):
    model = VideoLLaMA2VLB(config)
    params = model.init(
        jax.random.key(0),
        jnp.asarray(batch.language),
        jnp.asarray(batch.vision),
        jnp.asarray(batch.padvals),
        jnp.asarray(batch.vis_weights),
        jnp.asarray(batch.lang_weights),
    )["params"]
    return model, params


def test_forward_shapes(tiny_batches):
    cfg = VLBConfig.tiny()
    model, params = _init(cfg, tiny_batches[0])
    b = tiny_batches[0]
    pred, l2 = model.apply(
        {"params": params},
        jnp.asarray(b.language), jnp.asarray(b.vision), jnp.asarray(b.padvals),
        jnp.asarray(b.vis_weights), jnp.asarray(b.lang_weights),
    )
    assert pred.shape == (3, cfg.num_target)
    assert np.isfinite(np.asarray(pred)).all()
    assert float(l2) >= 0


def test_frozen_backbone_grads(tiny_batches):
    """Baseline regime: only head params receive nonzero gradients."""
    cfg = VLBConfig.tiny(use_lora=False)
    model, params = _init(cfg, tiny_batches[0])
    fwd = vlb_forward_fn(model)
    b = tiny_batches[0]
    batch = {k: jnp.asarray(v) for k, v in b.as_dict().items()}

    def loss(p):
        pred, l2 = fwd(p, batch, jax.random.key(1), True)
        return jnp.mean(pred.astype(jnp.float32) ** 2) + l2

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, g in flat:
        names = [getattr(p, "key", str(p)) for p in path]
        norm = float(jnp.linalg.norm(g.astype(jnp.float32)))
        if names[0] == "head":
            continue  # head may have zero or nonzero grads; checked below
        assert norm == 0.0, f"frozen param {'/'.join(names)} got grad {norm}"
    head_norm = sum(
        float(jnp.linalg.norm(g))
        for path, g in flat
        if getattr(path[0], "key", "") == "head"
    )
    assert head_norm > 0


def test_lora_grads(tiny_batches):
    """LoRA regime: head + adapters trainable, base frozen."""
    cfg = VLBConfig.tiny(use_lora=True)
    model, params = _init(cfg, tiny_batches[0])
    fwd = vlb_forward_fn(model)
    b = tiny_batches[0]
    batch = {k: jnp.asarray(v) for k, v in b.as_dict().items()}

    def loss(p):
        pred, l2 = fwd(p, batch, jax.random.key(1), True)
        return jnp.mean(pred.astype(jnp.float32) ** 2) + l2

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, g in flat:
        names = [getattr(p, "key", str(p)) for p in path]
        norm = float(jnp.linalg.norm(g.astype(jnp.float32)))
        # Base kernels, embeddings, vision tower, connector must be cut.
        # (Norm weights do receive grads through the adapter path — the
        # optimizer label mask zeroes their updates, matching peft's
        # requires_grad=False end behavior.)
        if (
            "kernel" in names
            and "lora_a" not in names
            and "lora_b" not in names
            and names[0] in ("model", "vision_tower", "mm_projector")
        ) or "embedding" in names:
            assert norm == 0.0, f"frozen param {'/'.join(names)} got grad {norm}"
    # lora_b is zero-init so lora_a grads are zero on step 0 — but lora_b
    # grads must flow (dL/dB = A^T X^T dY != 0).
    lora_b_norm = sum(
        float(jnp.linalg.norm(g))
        for path, g in flat
        if "lora_b" in [getattr(p, "key", "") for p in path]
    )
    assert lora_b_norm > 0


def test_train_steps_run(tiny_batches):
    cfg = VLBConfig.tiny(use_lora=True)
    model, params = _init(cfg, tiny_batches[0])
    fwd = vlb_forward_fn(model)
    labels = trainable_labels(params, trainable_predicate)
    tx = make_optimizer(OptimConfig(lr=1e-3, t_max=100))
    state, frozen = init_train_state(params, tx, labels)
    step = make_train_step(fwd, tx, labels, donate=False)
    eval_step = make_eval_step(fwd)

    losses = []
    for i, b in enumerate(tiny_batches * 3):
        batch = {k: jnp.asarray(v) for k, v in b.as_dict().items()}
        state, metrics = step(state, frozen, batch, jax.random.key(i))
        losses.append(float(metrics["brain_loss"]))
    assert all(np.isfinite(losses))
    # Frozen params live outside the optimized state and never change.
    base_before = params["model"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    base_after = frozen["model"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    np.testing.assert_array_equal(np.asarray(base_before), np.asarray(base_after))
    head_before = params["head"]["ridge"]["linear"]["kernel"]
    head_after = state.params["head"]["ridge"]["linear"]["kernel"]
    assert not np.allclose(np.asarray(head_before), np.asarray(head_after))


def test_lora_merge_equivalence(tiny_batches):
    """lora_merge folds adapters into base: merged plain model == LoRA model."""
    import dataclasses

    from phantom_vlb_tpu.models.lora import lora_merge

    cfg = VLBConfig.tiny(use_lora=True)
    model, params = _init(cfg, tiny_batches[0])
    # Give adapters nonzero effect.
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: x + 0.05 if any(
            getattr(k, "key", "") == "lora_b" for k in p
        ) else x,
        params,
    )
    b = tiny_batches[0]
    args = (
        jnp.asarray(b.language), jnp.asarray(b.vision), jnp.asarray(b.padvals),
        jnp.asarray(b.vis_weights), jnp.asarray(b.lang_weights),
    )
    pred_lora, _ = model.apply({"params": params}, *args)

    scaling = cfg.mistral.lora.scaling
    merged = lora_merge(jax.tree.map(np.asarray, params), scaling)
    plain_cfg = VLBConfig.tiny(use_lora=False)
    plain_cfg = dataclasses.replace(
        plain_cfg, mistral=dataclasses.replace(plain_cfg.mistral, lora=None)
    )
    plain = VideoLLaMA2VLB(plain_cfg)
    pred_merged, _ = plain.apply(
        {"params": jax.tree.map(jnp.asarray, merged)}, *args
    )
    np.testing.assert_allclose(
        np.asarray(pred_lora), np.asarray(pred_merged), atol=1e-4, rtol=1e-4
    )
