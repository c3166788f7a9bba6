"""VideoLLaMA2-VLB: the full vision-language-brain model.

Composition (reference: videollama2_vlb_litmodule.py:206-256 + the empty
VideoLLaMA2 submodule's documented behavior, SURVEY.md §2.4):

  frames (B,T,3,H,W) -> CLIP ViT-L/14-336 (frozen) -> (B,T,24,24,1024)
    -> STC connector (frozen) -> (B, 1183, 4096) video tokens
  text ids (B, 866) with one <video> sentinel (id -201)
    -> embed -> splice video tokens at the sentinel -> (B, 2048, 4096)
  -> Mistral-7B decoder (frozen / LoRA) -> last hidden states
  -> brain readout head (LN -> HRF pool -> LN -> dropout -> ridge)
  -> (predictions (B, num_parcels), l2 penalty)

Splice semantics (extractfeatures.py:236,430-436): the single -201 token is
replaced by the ``num_vis_tokens`` video embeddings, so the final length is
``len(text) - 1 + num_vis_tokens == model_max_length``.  The attention mask
marks video positions valid and text positions by ``id != 0`` — including the
reference's quirk that a genuine <unk> (id 0) is masked (litmodule.py:271).

Freezing (litmodule.py:86-99 + peft semantics): vision tower and connector
are always frozen; the LLM is frozen in the baseline regime or LoRA-adapted
(base frozen) in the LoRA regime; only the head (+ adapters) train.
Frozen paths are cut with ``stop_gradient`` so XLA never builds their
backward graphs.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from phantom_vlb_tpu.core.geometry import VIDEO_TOKEN_ID, VLBGeometry
from phantom_vlb_tpu.data.synthetic import TEST_GEOMETRY
from phantom_vlb_tpu.models.clip_vit import CLIPVisionConfig, CLIPVisionTower
from phantom_vlb_tpu.models.heads import BrainReadoutHead
from phantom_vlb_tpu.models.lora import LoRAConfig
from phantom_vlb_tpu.models.mistral import MistralConfig, MistralModel
from phantom_vlb_tpu.models.stc_connector import STCConfig, STCConnector
from phantom_vlb_tpu.ops.weight_mask import build_weight_mask

__all__ = ["VLBConfig", "VideoLLaMA2VLB", "splice_multimodal"]


@dataclasses.dataclass(frozen=True)
class VLBConfig:
    clip: CLIPVisionConfig = dataclasses.field(default_factory=CLIPVisionConfig)
    stc: STCConfig = dataclasses.field(default_factory=STCConfig)
    mistral: MistralConfig = dataclasses.field(default_factory=MistralConfig)
    geometry: VLBGeometry = dataclasses.field(default_factory=VLBGeometry)
    num_target: int = 1000
    l2_lambda: float = 0.001
    dropout_rate: float = 0.1
    freeze_backbone: bool = True    # baseline regime (baseline.yaml:26)
    train_backbone: bool = False    # full fine-tune (beyond reference scope)

    def validate(self) -> None:
        g = self.geometry
        g.validate()
        assert self.clip.image_size == g.image_size
        assert self.clip.grid == g.patch_grid
        assert self.stc.encoder_hidden_size == self.clip.hidden_size
        assert self.stc.output_hidden_size == self.mistral.hidden_size

    @staticmethod
    def full(use_lora: bool = False, **overrides) -> "VLBConfig":
        """The production VideoLLaMA2-7B geometry."""
        mistral = MistralConfig(
            lora=LoRAConfig() if use_lora else None,
            scan_layers=True,
        )
        clip = CLIPVisionConfig(scan_layers=True)
        cfg = VLBConfig(clip=clip, mistral=mistral,
                        freeze_backbone=not use_lora, **overrides)
        cfg.validate()
        return cfg

    @staticmethod
    def tiny(use_lora: bool = False, **overrides) -> "VLBConfig":
        """Tiny config on TEST_GEOMETRY (56px images, 64-token sequences)."""
        g = TEST_GEOMETRY
        clip = CLIPVisionConfig.tiny(image_size=g.image_size)
        stc = STCConfig.tiny(encoder_hidden_size=clip.hidden_size,
                             hidden_size=96, output_hidden_size=64)
        mistral = MistralConfig.tiny(
            vocab_size=1000,
            lora=LoRAConfig(rank=4, alpha=8.0, dropout=0.0) if use_lora else None,
        )
        cfg = VLBConfig(
            clip=clip, stc=stc, mistral=mistral, geometry=g,
            num_target=g.num_parcels, freeze_backbone=not use_lora,
            **overrides,
        )
        cfg.validate()
        return cfg


def splice_multimodal(
    text_embeds: jnp.ndarray,   # (B, Lt, E)
    text_ids: jnp.ndarray,      # (B, Lt) int (contains one VIDEO_TOKEN_ID)
    video_embeds: jnp.ndarray,  # (B, V, E)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Replace the sentinel token by the video embeddings (static shapes).

    Returns (embeds (B, Lt-1+V, E), valid_mask (B, Lt-1+V)).
    """
    b, lt, e = text_embeds.shape
    v = video_embeds.shape[1]
    l_out = lt - 1 + v

    p = jnp.argmax(text_ids == VIDEO_TOKEN_ID, axis=1).astype(jnp.int32)  # (B,)
    pos = jnp.arange(l_out, dtype=jnp.int32)[None, :]                     # (1, L)
    p_col = p[:, None]

    in_video = (pos >= p_col) & (pos < p_col + v)
    text_idx = jnp.where(pos < p_col, pos, pos - v + 1)
    text_idx = jnp.clip(text_idx, 0, lt - 1)
    video_idx = jnp.clip(pos - p_col, 0, v - 1)

    gathered_text = jnp.take_along_axis(text_embeds, text_idx[..., None], axis=1)
    gathered_video = jnp.take_along_axis(video_embeds, video_idx[..., None], axis=1)
    embeds = jnp.where(in_video[..., None], gathered_video, gathered_text)

    # attention mask: video positions valid; text positions valid iff id != 0
    # (the ne(0) quirk, litmodule.py:271).
    text_valid = (text_ids != 0).astype(jnp.int32)
    gathered_valid = jnp.take_along_axis(text_valid, text_idx, axis=1)
    valid = jnp.where(in_video, 1, gathered_valid)
    return embeds, valid


class VideoLLaMA2VLB(nn.Module):
    config: VLBConfig

    def setup(self):
        cfg = self.config
        self.vision_tower = CLIPVisionTower(cfg.clip, name="vision_tower")
        self.connector = STCConnector(cfg.stc, name="mm_projector")
        self.llm = MistralModel(cfg.mistral, name="model")
        self.head = BrainReadoutHead(
            hidden_size=cfg.mistral.hidden_size,
            num_target=cfg.num_target,
            l2_lambda=cfg.l2_lambda,
            dropout_rate=cfg.dropout_rate,
            name="head",
        )

    def encode_video(self, video: jnp.ndarray) -> jnp.ndarray:
        """(B, T, 3, H, W) float frames -> (B, num_vis_tokens, E) tokens."""
        cfg = self.config
        b, t = video.shape[:2]
        # NCHW (HDF5 byte-compat layout) -> NHWC (TPU-native).
        frames = jnp.transpose(video, (0, 1, 3, 4, 2)).reshape(
            b * t, cfg.clip.image_size, cfg.clip.image_size, 3
        )
        feats = self.vision_tower(frames)                    # (B*T, P, C)
        feats = jax.lax.stop_gradient(feats)                 # always frozen
        g = cfg.clip.grid
        feats = feats.reshape(b, t, g, g, cfg.clip.hidden_size)
        tokens = self.connector(feats)                       # (B, V, E)
        return jax.lax.stop_gradient(tokens)                 # frozen (peft)

    def backbone(self, language, video, deterministic: bool = True):
        """Returns (last_hidden (B, S, E), valid_mask (B, S)).

        ``video`` is either raw frames (B, T, 3, H, W) or PRECOMPUTED video
        tokens (B, num_vis_tokens, E) from the vision-token cache
        (data/token_cache.py).  Both reference regimes freeze the vision
        tower AND mm_projector (litmodule.py:86-99 + peft), so the tokens
        are a pure function of the clip; the rank-3 path skips the frozen
        CLIP+STC forward entirely.
        """
        cfg = self.config
        ids = language.astype(jnp.int32)
        safe_ids = jnp.where(ids == VIDEO_TOKEN_ID, 0, ids)
        text_embeds = self.llm.embed(jnp.clip(safe_ids, 0, cfg.mistral.vocab_size - 1))
        if not cfg.train_backbone:
            # peft freezes embed_tokens; cutting here avoids materializing a
            # (vocab, hidden) gradient buffer (~512 MB at 7B scale).
            text_embeds = jax.lax.stop_gradient(text_embeds)
        if video.ndim == 3:
            video_tokens = jax.lax.stop_gradient(
                video.astype(cfg.mistral.dtype)
            )
        else:
            video_tokens = self.encode_video(video)
        embeds, valid = splice_multimodal(text_embeds, ids, video_tokens)
        # The reference pools hidden_states[-1] == the post-final-norm output
        # (litmodule.py:240,245), which is exactly what the default forward
        # returns — no hidden-states collection needed.
        hidden = self.llm(
            embeds,
            kv_mask=valid,
            deterministic=deterministic,
        )
        if cfg.freeze_backbone and not cfg.train_backbone:
            hidden = jax.lax.stop_gradient(hidden)
        return hidden, valid

    def __call__(
        self,
        language: jnp.ndarray,      # (B, max_lang_tokens) int
        video: jnp.ndarray,         # (B, T, 3, H, W) float
        padvals: jnp.ndarray,       # (B, 3) int
        vis_weights: jnp.ndarray,   # (B, num_ds_frames)
        lang_weights: jnp.ndarray,  # (B, onsets_width)
        deterministic: bool = True,
    ):
        cfg = self.config
        hidden, _ = self.backbone(language, video, deterministic)
        weight_mask = build_weight_mask(
            padvals, vis_weights, lang_weights, cfg.geometry
        )
        return self.head(hidden, weight_mask, deterministic=deterministic)


def vlb_forward_fn(model: VideoLLaMA2VLB):
    """Adapter to the train-step ForwardFn signature (train/step.py)."""

    def forward(params, batch, rng, train):
        return model.apply(
            {"params": params},
            batch["language"],
            batch["vision"],
            batch["padvals"],
            batch["vis_weights"],
            batch["lang_weights"],
            deterministic=not train,
            rngs={"dropout": rng} if train else {},
        )

    return forward


def trainable_predicate(path_parts: tuple, leaf) -> bool:
    """Trainable = head params + LoRA adapters (reference regimes)."""
    names = [getattr(p, "key", str(p)) for p in path_parts]
    if names and names[0] == "head":
        return True
    return any(n in ("lora_a", "lora_b") for n in names)
