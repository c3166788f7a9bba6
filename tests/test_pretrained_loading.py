"""Pretrained-weight loading: safetensors (VideoLLaMA2 layout) -> live params."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phantom_vlb_tpu.models.clip_vit import CLIPVisionConfig
from phantom_vlb_tpu.models.mistral import MistralConfig
from phantom_vlb_tpu.models.stc_connector import STCConfig
from phantom_vlb_tpu.models.videollama2 import VLBConfig, VideoLLaMA2VLB
from phantom_vlb_tpu.data.synthetic import TEST_GEOMETRY
from phantom_vlb_tpu.train.builder import init_model_params, load_pretrained_params


def _tiny_cfg(scan: bool):
    g = TEST_GEOMETRY
    clip = CLIPVisionConfig.tiny(image_size=g.image_size, scan_layers=scan)
    stc = STCConfig.tiny(encoder_hidden_size=clip.hidden_size,
                         hidden_size=96, output_hidden_size=64)
    mistral = MistralConfig.tiny(vocab_size=1000, scan_layers=scan)
    cfg = VLBConfig(clip=clip, stc=stc, mistral=mistral, geometry=g,
                    num_target=g.num_parcels)
    cfg.validate()
    return cfg


def _make_checkpoint(tmp_path, cfg):
    """Synthetic safetensors shard with the VideoLLaMA2-7B key layout."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    m = cfg.mistral
    c = cfg.clip
    sd = {}

    def w(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    sd["model.embed_tokens.weight"] = w(m.vocab_size, m.hidden_size)
    sd["model.norm.weight"] = np.ones(m.hidden_size, np.float32)
    for i in range(m.num_hidden_layers):
        p = f"model.layers.{i}."
        hd = m.head_dim
        sd[p + "self_attn.q_proj.weight"] = w(m.num_attention_heads * hd, m.hidden_size)
        sd[p + "self_attn.k_proj.weight"] = w(m.num_key_value_heads * hd, m.hidden_size)
        sd[p + "self_attn.v_proj.weight"] = w(m.num_key_value_heads * hd, m.hidden_size)
        sd[p + "self_attn.o_proj.weight"] = w(m.hidden_size, m.num_attention_heads * hd)
        sd[p + "mlp.gate_proj.weight"] = w(m.intermediate_size, m.hidden_size)
        sd[p + "mlp.up_proj.weight"] = w(m.intermediate_size, m.hidden_size)
        sd[p + "mlp.down_proj.weight"] = w(m.hidden_size, m.intermediate_size)
        sd[p + "input_layernorm.weight"] = np.ones(m.hidden_size, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(m.hidden_size, np.float32)

    vp = "model.vision_tower.vision_tower.vision_model."
    sd[vp + "embeddings.patch_embedding.weight"] = w(c.hidden_size, 3, c.patch_size, c.patch_size)
    sd[vp + "embeddings.class_embedding"] = w(c.hidden_size)
    sd[vp + "embeddings.position_embedding.weight"] = w(c.num_patches + 1, c.hidden_size)
    sd[vp + "pre_layrnorm.weight"] = np.ones(c.hidden_size, np.float32)
    sd[vp + "pre_layrnorm.bias"] = np.zeros(c.hidden_size, np.float32)
    n_clip = cfg.clip.effective_layers if cfg.clip.scan_layers else c.num_hidden_layers
    for i in range(max(n_clip, c.num_hidden_layers)):
        p = vp + f"encoder.layers.{i}."
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[p + f"self_attn.{name}.weight"] = w(c.hidden_size, c.hidden_size)
            sd[p + f"self_attn.{name}.bias"] = w(c.hidden_size)
        for ln in ("layer_norm1", "layer_norm2"):
            sd[p + f"{ln}.weight"] = np.ones(c.hidden_size, np.float32)
            sd[p + f"{ln}.bias"] = np.zeros(c.hidden_size, np.float32)
        sd[p + "mlp.fc1.weight"] = w(c.intermediate_size, c.hidden_size)
        sd[p + "mlp.fc1.bias"] = w(c.intermediate_size)
        sd[p + "mlp.fc2.weight"] = w(c.hidden_size, c.intermediate_size)
        sd[p + "mlp.fc2.bias"] = w(c.hidden_size)

    s = cfg.stc
    mp = "model.mm_projector."
    for stage, in_chs in (("s1", s.encoder_hidden_size), ("s2", s.hidden_size)):
        for j in range(s.depth):
            b = f"{mp}{stage}.b{j + 1}"
            chs = s.hidden_size
            sd[f"{b}.conv1.conv.weight"] = w(chs, in_chs, 1, 1)
            sd[f"{b}.conv2.conv.weight"] = w(chs, 1, 3, 3)
            sd[f"{b}.conv3.conv.weight"] = w(chs, chs, 1, 1)
            rd = max(1, int(round(in_chs * s.se_ratio)))
            sd[f"{b}.se.fc1.weight"] = w(rd, chs, 1, 1)
            sd[f"{b}.se.fc1.bias"] = w(rd)
            sd[f"{b}.se.fc2.weight"] = w(chs, rd, 1, 1)
            sd[f"{b}.se.fc2.bias"] = w(chs)
            for part in ("conv1", "conv2", "conv3"):
                sd[f"{b}.{part}.bn.weight"] = np.ones(chs, np.float32)
                sd[f"{b}.{part}.bn.bias"] = np.zeros(chs, np.float32)
            if in_chs != chs:
                sd[f"{b}.downsample.conv.weight"] = w(chs, in_chs, 1, 1)
                sd[f"{b}.downsample.bn.weight"] = np.ones(chs, np.float32)
                sd[f"{b}.downsample.bn.bias"] = np.zeros(chs, np.float32)
    sd[f"{mp}sampler.0.weight"] = w(s.hidden_size, s.hidden_size, 2, 2, 2)
    sd[f"{mp}sampler.0.bias"] = w(s.hidden_size)
    sd[f"{mp}readout.0.weight"] = w(s.output_hidden_size, s.hidden_size)
    sd[f"{mp}readout.0.bias"] = w(s.output_hidden_size)
    sd[f"{mp}readout.2.weight"] = w(s.output_hidden_size, s.output_hidden_size)
    sd[f"{mp}readout.2.bias"] = w(s.output_hidden_size)

    save_file(sd, tmp_path / "model-00001-of-00001.safetensors")
    return sd


@pytest.mark.parametrize("scan", [False, True])
def test_safetensors_loading(tmp_path, scan):
    cfg = _tiny_cfg(scan)
    model = VideoLLaMA2VLB(cfg)
    params = init_model_params(model, cfg.geometry, cfg.mistral.vocab_size, 0)
    sd = _make_checkpoint(tmp_path, cfg)

    loaded = load_pretrained_params(cfg, str(tmp_path), params)

    # Spot-check: embeddings and a projection kernel match the checkpoint.
    np.testing.assert_allclose(
        np.asarray(loaded["model"]["embed_tokens"]["embedding"]),
        sd["model.embed_tokens.weight"],
        atol=1e-6,
    )
    if scan:
        q = np.asarray(loaded["model"]["layers_scan"]["self_attn"]["q_proj"]["kernel"])
        np.testing.assert_allclose(
            q[1], sd["model.layers.1.self_attn.q_proj.weight"].T, atol=1e-6
        )
    else:
        q = np.asarray(loaded["model"]["layers_0"]["self_attn"]["q_proj"]["kernel"])
        np.testing.assert_allclose(
            q, sd["model.layers.0.self_attn.q_proj.weight"].T, atol=1e-6
        )
    # Vision + connector subtrees converted too.
    np.testing.assert_allclose(
        np.asarray(loaded["vision_tower"]["class_embedding"]),
        sd["model.vision_tower.vision_tower.vision_model.embeddings.class_embedding"],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(loaded["mm_projector"]["readout_0"]["kernel"]),
        sd["model.mm_projector.readout.0.weight"].T,
        atol=1e-6,
    )
    # Head stays at its init (not in the checkpoint).
    np.testing.assert_array_equal(
        np.asarray(loaded["head"]["ridge"]["linear"]["kernel"]),
        np.asarray(params["head"]["ridge"]["linear"]["kernel"]),
    )

    # The loaded model runs.
    from __graft_entry__ import _example_batch

    batch = _example_batch(cfg.geometry, 2, cfg.mistral.vocab_size)
    pred, _ = model.apply(
        {"params": jax.tree.map(jnp.asarray, loaded)},
        batch["language"], batch["vision"], batch["padvals"],
        batch["vis_weights"], batch["lang_weights"],
    )
    assert np.isfinite(np.asarray(pred)).all()


def test_safetensors_loading_quantized(tmp_path):
    """base_quant config: converted fp kernels are quantized before merge, and
    the quantized model's output tracks the fp model's on the same weights."""
    import dataclasses

    cfg = _tiny_cfg(scan=False)
    cfg_q = dataclasses.replace(
        cfg,
        mistral=dataclasses.replace(cfg.mistral, base_quant="w8a8"),
        clip=dataclasses.replace(cfg.clip, base_quant="w8a8"),
    )
    model = VideoLLaMA2VLB(cfg)
    model_q = VideoLLaMA2VLB(cfg_q)
    params = init_model_params(model, cfg.geometry, cfg.mistral.vocab_size, 0)
    params_q = init_model_params(model_q, cfg.geometry, cfg.mistral.vocab_size, 0)
    sd = _make_checkpoint(tmp_path, cfg)

    loaded = load_pretrained_params(cfg, str(tmp_path), params)
    loaded_q = load_pretrained_params(cfg_q, str(tmp_path), params_q)

    # The quantized layout got real (quantized) weights, not its random init.
    q_layer = loaded_q["model"]["layers_0"]["self_attn"]["q_proj"]
    assert "kernel_q" in q_layer and "kernel_scale" in q_layer
    deq = np.asarray(q_layer["kernel_q"], np.float32) * np.asarray(q_layer["kernel_scale"])
    ref = sd["model.layers.0.self_attn.q_proj.weight"].T
    rel = np.abs(deq - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.01, rel

    # Same forward inputs -> closely matching outputs (fp vs quantized).
    from __graft_entry__ import _example_batch

    batch = _example_batch(cfg.geometry, 1, cfg.mistral.vocab_size)
    args = (batch["language"], batch["vision"], batch["padvals"],
            batch["vis_weights"], batch["lang_weights"])
    out = np.asarray(model.apply({"params": loaded}, *args)[0])
    out_q = np.asarray(model_q.apply({"params": loaded_q}, *args)[0])
    rel = np.abs(out - out_q).mean() / (np.abs(out).mean() + 1e-9)
    assert rel < 0.1, rel
