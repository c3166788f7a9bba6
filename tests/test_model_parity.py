"""Activation parity: our Flax models vs HF transformers (tiny random configs).

transformers is available offline (no weights download needed): we build tiny
randomly-initialized HF models on CPU, convert their state dicts with
``models.convert``, and require logit/feature parity. This validates RoPE,
GQA, RMSNorm, QuickGELU, pre/post-LN and hidden-states conventions against
the exact stack the reference runs (SURVEY.md §7, build step 3).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from phantom_vlb_tpu.models.clip_vit import CLIPVisionConfig, CLIPVisionTower
from phantom_vlb_tpu.models.convert import (
    convert_clip_vision,
    convert_mistral,
    state_dict_to_numpy,
)
from phantom_vlb_tpu.models.mistral import MistralConfig, MistralForCausalLM


@pytest.fixture(scope="module")
def hf_mistral():
    from transformers import MistralConfig as HFConfig, MistralForCausalLM as HFModel

    torch.manual_seed(0)
    cfg = HFConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=512,
        rms_norm_eps=1e-5,
        rope_theta=1e6,
        sliding_window=None,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    model = HFModel(cfg)
    model.eval()
    return model


def test_mistral_logits_parity(hf_mistral):
    ours_cfg = MistralConfig.tiny()
    ours = MistralForCausalLM(ours_cfg)
    params = jax.tree.map(
        jnp.asarray,
        convert_mistral(state_dict_to_numpy(hf_mistral.state_dict()), ours_cfg.num_hidden_layers),
    )

    ids = np.random.default_rng(0).integers(0, 128, size=(2, 24))
    with torch.no_grad():
        ref = hf_mistral(torch.tensor(ids)).logits.numpy()

    out = ours.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


def test_mistral_hidden_states_parity(hf_mistral):
    ours_cfg = MistralConfig.tiny()
    ours = MistralForCausalLM(ours_cfg)
    params = jax.tree.map(
        jnp.asarray,
        convert_mistral(state_dict_to_numpy(hf_mistral.state_dict()), ours_cfg.num_hidden_layers),
    )

    ids = np.random.default_rng(1).integers(0, 128, size=(1, 16))
    with torch.no_grad():
        ref = hf_mistral(torch.tensor(ids), output_hidden_states=True)
    ref_hidden = [h.numpy() for h in ref.hidden_states]

    _, hidden = ours.apply(
        {"params": params}, jnp.asarray(ids), output_hidden_states=True
    )
    assert len(hidden) == len(ref_hidden) == ours_cfg.num_hidden_layers + 1
    for i, (a, b) in enumerate(zip(hidden, ref_hidden)):
        np.testing.assert_allclose(
            np.asarray(a), b, atol=2e-4, rtol=2e-4, err_msg=f"hidden_states[{i}]"
        )


def test_mistral_attention_mask_parity(hf_mistral):
    """Padding-mask parity (the reference masks with lang.ne(0))."""
    ours_cfg = MistralConfig.tiny()
    ours = MistralForCausalLM(ours_cfg)
    params = jax.tree.map(
        jnp.asarray,
        convert_mistral(state_dict_to_numpy(hf_mistral.state_dict()), ours_cfg.num_hidden_layers),
    )
    ids = np.random.default_rng(2).integers(1, 128, size=(2, 16))
    mask = np.ones_like(ids)
    mask[:, 12:] = 0
    with torch.no_grad():
        ref = hf_mistral(
            torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()
    out = ours.apply({"params": params}, jnp.asarray(ids), kv_mask=jnp.asarray(mask))
    # Only positions with mask=1 are meaningful.
    np.testing.assert_allclose(
        np.asarray(out)[:, :12], ref[:, :12], atol=2e-4, rtol=2e-4
    )


@pytest.fixture(scope="module")
def hf_clip():
    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModel as HFModel

    torch.manual_seed(1)
    cfg = HFCfg(
        image_size=56,
        patch_size=14,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        hidden_act="quick_gelu",
        attn_implementation="eager",
    )
    model = HFModel(cfg)
    model.eval()
    return model


def test_clip_feature_parity(hf_clip):
    ours_cfg = CLIPVisionConfig.tiny()
    ours = CLIPVisionTower(ours_cfg)
    params = jax.tree.map(
        jnp.asarray,
        convert_clip_vision(
            state_dict_to_numpy(hf_clip.state_dict()), ours_cfg.num_hidden_layers
        ),
    )

    rng = np.random.default_rng(3)
    images = rng.standard_normal((3, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf_clip(
            torch.tensor(images.transpose(0, 3, 1, 2)), output_hidden_states=True
        )
    # VideoLLaMA2 feature path: hidden_states[select_layer][:, 1:].
    ref_feat = ref.hidden_states[-2][:, 1:].numpy()

    out = ours.apply({"params": params}, jnp.asarray(images))
    assert out.shape == ref_feat.shape
    np.testing.assert_allclose(np.asarray(out), ref_feat, atol=2e-4, rtol=2e-4)
