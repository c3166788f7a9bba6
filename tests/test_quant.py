"""Int8 frozen-base quantization tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from phantom_vlb_tpu.models.lora import LoRAConfig
from phantom_vlb_tpu.models.mistral import MistralConfig, MistralModel
from phantom_vlb_tpu.ops.quant import (
    int8_matmul,
    int8_matmul_w8a8,
    quantize_int8,
    quantize_tree,
)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 32)).astype(np.float32) * 0.02
    q, s = quantize_int8(w)
    deq = q.astype(np.float32) * s
    # Per-channel int8: relative error bounded by ~1/254 of channel absmax.
    err = np.abs(deq - w).max(axis=0)
    bound = np.abs(w).max(axis=0) / 127
    assert (err <= bound + 1e-7).all()


def test_int8_matmul_matches_dequant():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((32, 16)).astype(np.float32) * 0.05
    x = rng.standard_normal((4, 32)).astype(np.float32)
    q, s = quantize_int8(w)
    y = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s),
                               dtype=jnp.float32))
    expected = x @ (q.astype(np.float32) * s)
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-5)


def test_quantize_tree_structure():
    rng = np.random.default_rng(2)
    params = {
        "self_attn": {"q_proj": {"kernel": rng.standard_normal((8, 8)).astype(np.float32)}},
        "norm": {"weight": np.ones(8, np.float32)},
    }
    out = quantize_tree(params, lambda p, w: "q_proj" in p)
    assert "kernel_q" in out["self_attn"]["q_proj"]
    assert out["self_attn"]["q_proj"]["kernel_q"].dtype == np.int8
    assert "kernel" not in out["self_attn"]["q_proj"]
    assert "weight" in out["norm"]


def test_quantized_model_close_to_fp():
    """Quantized frozen base ~= fp base (small weights => small quant error)."""
    lora = LoRAConfig(rank=2, alpha=4.0, dropout=0.0)
    cfg = MistralConfig.tiny(num_hidden_layers=2, lora=lora)
    cfg_q = dataclasses.replace(cfg, base_quant="int8")

    model = MistralModel(cfg)
    model_q = MistralModel(cfg_q)
    rng = np.random.default_rng(3)
    embeds = jnp.asarray(rng.standard_normal((1, 8, cfg.hidden_size)) * 0.1, jnp.float32)

    params = jax.tree.map(np.asarray, model.init(jax.random.key(0), embeds)["params"])
    params_q = quantize_tree(
        params,
        lambda p, w: any(
            t in p for t in ("q_proj", "k_proj", "v_proj", "o_proj",
                             "gate_proj", "up_proj", "down_proj")
        ),
    )
    out = np.asarray(model.apply({"params": jax.tree.map(jnp.asarray, params)}, embeds))
    out_q = np.asarray(model_q.apply({"params": jax.tree.map(jnp.asarray, params_q)}, embeds))
    # int8 error accumulates through 2 layers + norms; loose but meaningful.
    rel = np.abs(out - out_q).mean() / (np.abs(out).mean() + 1e-9)
    assert rel < 0.05, rel


def test_w8a8_matmul_close_to_fp():
    """Dynamic activation quant: small relative error vs the fp matmul."""
    rng = np.random.default_rng(5)
    w = rng.standard_normal((64, 48)).astype(np.float32) * 0.05
    x = rng.standard_normal((3, 8, 64)).astype(np.float32)
    q, s = quantize_int8(w)
    y = np.asarray(int8_matmul_w8a8(
        jnp.asarray(x), jnp.asarray(q), jnp.asarray(s), dtype=jnp.float32))
    expected = x @ (q.astype(np.float32) * s)
    rel = np.abs(y - expected).mean() / (np.abs(expected).mean() + 1e-9)
    assert rel < 0.01, rel


def test_w8a8_backward_is_dequant_matmul():
    """Straight-through dx == dy @ dequant(q)^T (same as the w8-only path)."""
    rng = np.random.default_rng(6)
    w = rng.standard_normal((32, 16)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    q, s = quantize_int8(w)
    qj, sj = jnp.asarray(q), jnp.asarray(s)
    cot = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)

    _, vjp = jax.vjp(lambda a: int8_matmul_w8a8(a, qj, sj, jnp.float32), x)
    (dx,) = vjp(cot)
    deq = (q.astype(np.float32) * s).astype(np.float32)
    expected = np.asarray(cot) @ deq.T
    # Backward runs in bf16 (matches the production int8 path's precision).
    np.testing.assert_allclose(np.asarray(dx), expected, rtol=2e-2, atol=2e-2)


def test_w8a8g8_backward_close_to_dequant():
    """int8 backward dx ~= exact dequant backward (small relative error)."""
    from phantom_vlb_tpu.ops.quant import int8_matmul_w8a8g8

    rng = np.random.default_rng(9)
    w = rng.standard_normal((64, 48)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((5, 64)), jnp.float32)
    q, s = quantize_int8(w)
    qj, sj = jnp.asarray(q), jnp.asarray(s)
    cot = jnp.asarray(rng.standard_normal((5, 48)), jnp.float32)

    _, vjp = jax.vjp(lambda a: int8_matmul_w8a8g8(a, qj, sj, jnp.float32), x)
    (dx,) = vjp(cot)
    deq = q.astype(np.float32) * s
    expected = np.asarray(cot) @ deq.T
    rel = np.abs(np.asarray(dx) - expected).mean() / (np.abs(expected).mean() + 1e-9)
    assert rel < 0.01, rel


def test_w8a8_model_close_to_fp():
    """Full tiny Mistral with base_quant='w8a8' ~= fp model."""
    lora = LoRAConfig(rank=2, alpha=4.0, dropout=0.0)
    cfg = MistralConfig.tiny(num_hidden_layers=2, lora=lora)
    cfg_q = dataclasses.replace(cfg, base_quant="w8a8")

    model = MistralModel(cfg)
    model_q = MistralModel(cfg_q)
    rng = np.random.default_rng(7)
    embeds = jnp.asarray(rng.standard_normal((1, 8, cfg.hidden_size)) * 0.1, jnp.float32)

    params = jax.tree.map(np.asarray, model.init(jax.random.key(0), embeds)["params"])
    params_q = quantize_tree(
        params,
        lambda p, w: any(
            t in p for t in ("q_proj", "k_proj", "v_proj", "o_proj",
                             "gate_proj", "up_proj", "down_proj")
        ),
    )
    out = np.asarray(model.apply({"params": jax.tree.map(jnp.asarray, params)}, embeds))
    out_q = np.asarray(model_q.apply({"params": jax.tree.map(jnp.asarray, params_q)}, embeds))
    rel = np.abs(out - out_q).mean() / (np.abs(out).mean() + 1e-9)
    assert rel < 0.06, rel


def test_w8a8_grads_flow_to_adapters():
    lora = LoRAConfig(rank=2, alpha=4.0, dropout=0.0)
    cfg = MistralConfig.tiny(num_hidden_layers=1, lora=lora, base_quant="w8a8")
    model = MistralModel(cfg)
    rng = np.random.default_rng(8)
    embeds = jnp.asarray(rng.standard_normal((1, 8, cfg.hidden_size)), jnp.float32)
    params = model.init(jax.random.key(0), embeds)["params"]

    from phantom_vlb_tpu.train.step import combine_params, partition_params
    from phantom_vlb_tpu.train.optim import trainable_labels

    labels = trainable_labels(params, lambda p, l: any(
        getattr(k, "key", "") in ("lora_a", "lora_b") for k in p
    ))
    trainable, frozen = partition_params(params, labels)

    def loss(t):
        p = combine_params(t, frozen)
        return jnp.sum(model.apply({"params": p}, embeds) ** 2)

    grads = jax.grad(loss)(trainable)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    total = sum(float(jnp.abs(g).sum()) for _, g in flat)
    assert np.isfinite(total) and total > 0


def test_quantized_baseline_regime_close_to_fp():
    """No-LoRA Mistral with base_quant (frozen-baseline regime) ~= fp model."""
    cfg = MistralConfig.tiny(num_hidden_layers=2)
    cfg_q = dataclasses.replace(cfg, base_quant="w8a8")

    model = MistralModel(cfg)
    model_q = MistralModel(cfg_q)
    rng = np.random.default_rng(13)
    embeds = jnp.asarray(rng.standard_normal((1, 8, cfg.hidden_size)) * 0.1, jnp.float32)

    params = jax.tree.map(np.asarray, model.init(jax.random.key(0), embeds)["params"])
    params_q = quantize_tree(
        params,
        lambda p, w: any(
            t in p for t in ("q_proj", "k_proj", "v_proj", "o_proj",
                             "gate_proj", "up_proj", "down_proj")
        ),
    )
    out = np.asarray(model.apply({"params": jax.tree.map(jnp.asarray, params)}, embeds))
    out_q = np.asarray(model_q.apply({"params": jax.tree.map(jnp.asarray, params_q)}, embeds))
    rel = np.abs(out - out_q).mean() / (np.abs(out).mean() + 1e-9)
    assert rel < 0.06, rel


def test_quantized_clip_tower_close_to_fp():
    """CLIP tower with base_quant='w8a8' ~= fp tower (frozen inference path)."""
    from phantom_vlb_tpu.models.clip_vit import CLIPVisionConfig, CLIPVisionTower

    cfg = CLIPVisionConfig.tiny(image_size=56)
    cfg_q = dataclasses.replace(cfg, base_quant="w8a8")
    tower = CLIPVisionTower(cfg)
    tower_q = CLIPVisionTower(cfg_q)

    rng = np.random.default_rng(12)
    imgs = jnp.asarray(rng.standard_normal((2, 56, 56, 3)) * 0.5, jnp.float32)
    params = jax.tree.map(np.asarray, tower.init(jax.random.key(0), imgs)["params"])
    params_q = quantize_tree(
        params,
        lambda p, w: any(t in p for t in
                         ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2")),
    )
    out = np.asarray(tower.apply({"params": jax.tree.map(jnp.asarray, params)}, imgs))
    out_q = np.asarray(tower_q.apply({"params": jax.tree.map(jnp.asarray, params_q)}, imgs))
    rel = np.abs(out - out_q).mean() / (np.abs(out).mean() + 1e-9)
    assert rel < 0.06, rel


def test_w8a8g8_adapter_grads_match_exact_backward():
    """Adapter gradients under the int8 backward ~= exact-backward gradients.

    Same quantized base params, same input; only the dx matmuls differ
    (int8 vs bf16 dequant). Per-leaf cosine similarity must stay ~1: the
    int8 gradient noise (~0.4% RMS) is the same order as bf16's own rounding.
    """
    lora = LoRAConfig(rank=4, alpha=8.0, dropout=0.0)
    cfg_exact = MistralConfig.tiny(num_hidden_layers=2, lora=lora, base_quant="int8")
    cfg_g8 = dataclasses.replace(cfg_exact, base_quant="w8a8g8")
    model_exact = MistralModel(cfg_exact)
    model_g8 = MistralModel(cfg_g8)

    rng = np.random.default_rng(10)
    embeds = jnp.asarray(rng.standard_normal((2, 16, cfg_exact.hidden_size)), jnp.float32)
    params = model_exact.init(jax.random.key(0), embeds)["params"]
    # Non-zero lora_b so adapter grads flow on both branches.
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: x + 0.01 * np.float32(any(
            getattr(k, "key", "") == "lora_b" for k in p)),
        params,
    )

    from phantom_vlb_tpu.train.step import combine_params, partition_params
    from phantom_vlb_tpu.train.optim import trainable_labels

    labels = trainable_labels(params, lambda p, l: any(
        getattr(k, "key", "") in ("lora_a", "lora_b") for k in p
    ))
    trainable, frozen = partition_params(params, labels)

    def grads_for(model):
        def loss(t):
            p = combine_params(t, frozen)
            return jnp.mean(model.apply({"params": p}, embeds) ** 2)
        return jax.grad(loss)(trainable)

    g_exact = grads_for(model_exact)
    g_g8 = grads_for(model_g8)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_exact)[0],
        jax.tree_util.tree_flatten_with_path(g_g8)[0],
    ):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na < 1e-12 and nb < 1e-12:
            continue
        cos = float(a @ b / (na * nb + 1e-30))
        name = "/".join(getattr(k, "key", "?") for k in path)
        assert cos > 0.98, (name, cos)


def test_w8a8g8_training_reduces_loss():
    """A few steps of LoRA training with the all-int8 base reduce the loss."""
    import optax

    lora = LoRAConfig(rank=4, alpha=8.0, dropout=0.0)
    cfg = MistralConfig.tiny(num_hidden_layers=2, lora=lora, base_quant="w8a8g8")
    model = MistralModel(cfg)
    rng = np.random.default_rng(11)
    embeds = jnp.asarray(rng.standard_normal((2, 16, cfg.hidden_size)), jnp.float32)
    params = model.init(jax.random.key(0), embeds)["params"]

    # Realizable target: the same model with non-zero adapters (teacher
    # reachable exactly by the rank-4 student).
    def perturb(p, x):
        if any(getattr(k, "key", "") in ("lora_a", "lora_b") for k in p):
            return x + 0.05 * jnp.asarray(rng.standard_normal(x.shape), x.dtype)
        return x

    teacher = jax.tree_util.tree_map_with_path(perturb, params)
    target = model.apply({"params": teacher}, embeds)

    from phantom_vlb_tpu.train.step import combine_params, partition_params
    from phantom_vlb_tpu.train.optim import trainable_labels

    labels = trainable_labels(params, lambda p, l: any(
        getattr(k, "key", "") in ("lora_a", "lora_b") for k in p
    ))
    trainable, frozen = partition_params(params, labels)
    tx = optax.adam(1e-2)
    opt_state = tx.init(trainable)

    @jax.jit
    def step(t, opt_state):
        def loss(t):
            p = combine_params(t, frozen)
            return jnp.mean((model.apply({"params": p}, embeds) - target) ** 2)
        l, g = jax.value_and_grad(loss)(t)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(t, updates), opt_state, l

    losses = []
    for _ in range(20):
        trainable, opt_state, l = step(trainable, opt_state)
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.7 * losses[0], (losses[0], losses[-1])


def test_quantized_grads_only_adapters():
    lora = LoRAConfig(rank=2, alpha=4.0, dropout=0.0)
    cfg = MistralConfig.tiny(num_hidden_layers=1, lora=lora, base_quant="int8")
    model = MistralModel(cfg)
    rng = np.random.default_rng(4)
    embeds = jnp.asarray(rng.standard_normal((1, 8, cfg.hidden_size)), jnp.float32)
    params = model.init(jax.random.key(0), embeds)["params"]

    from phantom_vlb_tpu.train.step import combine_params, partition_params
    from phantom_vlb_tpu.models.videollama2 import trainable_predicate
    from phantom_vlb_tpu.train.optim import trainable_labels

    labels = trainable_labels(params, lambda p, l: any(
        getattr(k, "key", "") in ("lora_a", "lora_b") for k in p
    ))
    trainable, frozen = partition_params(params, labels)

    def loss(t):
        p = combine_params(t, frozen)
        return jnp.sum(model.apply({"params": p}, embeds) ** 2)

    grads = jax.grad(loss)(trainable)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    names = {"/".join(getattr(k, "key", "?") for k in path) for path, _ in flat}
    assert all("lora_" in n for n in names)
    assert any(float(jnp.abs(g).sum()) > 0 for _, g in flat)
