"""Mistral-7B-Instruct decoder, from scratch in Flax.

The reference consumes Mistral through the (empty) VideoLLaMA2 submodule
(``Videollama2MistralForCausalLM``, litmodule.py:18-20,74-82); architecture
facts are reconstructed from the reference's numeric contracts (hidden 4096,
32 layers + embeddings = 33 hidden states, vocab 32000, litmodule.py:239-243)
and the public Mistral-7B-v0.2 configuration (GQA 32/8 heads, head dim 128,
SwiGLU MLP 14336, RMSNorm, rotary theta 1e6, no sliding window in v0.2).

TPU design:
- attention runs through :mod:`phantom_vlb_tpu.ops.flash_attention`
  (Pallas on TPU, XLA fallback elsewhere);
- layers carry explicit ``kernel_axes`` metadata (via
  ``flax.linen.with_partitioning``-free plain logical names) consumed by
  ``parallel.sharding`` to build FSDP/TP NamedShardings;
- ``remat='block'`` wraps each decoder block in ``jax.checkpoint`` — the
  reference's activation-checkpointing-per-MistralDecoderLayer
  (train_dev_nohydra.py:87-90);
- the stack is iterated with a Python loop (32 static layers, one HLO each);
  weights stay bf16-castable via ``dtype``/``param_dtype`` separation.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.ad_checkpoint
import jax.numpy as jnp

from phantom_vlb_tpu.models.lora import LoRAConfig, LoRADense
from phantom_vlb_tpu.ops.flash_attention import attention as flash_attention
from phantom_vlb_tpu.ops.flash_attention import attention_packed

__all__ = ["MistralConfig", "MistralModel", "MistralForCausalLM"]


@dataclasses.dataclass(frozen=True)
class MistralConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-5
    rope_theta: float = 1e6
    max_position_embeddings: int = 32768
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    attention_impl: str = "auto"   # 'auto'|'pallas'|'xla'|'ring'|'ring_flash'|'ring_fused'
    remat: bool = True
    # 'nothing' recomputes everything in backward (min memory);
    # 'attn' additionally saves attention outputs (~50 MB/layer at the VLB
    # geometry) so backward skips the flash-attention recompute;
    # 'dots' saves all matmul outputs (fastest backward, most HBM).
    remat_policy: str = "nothing"
    # lax.scan over the 32 decoder layers: one compiled layer body (fast
    # compile, stacked (L, ...) params). The unrolled stack remains for
    # hidden-states introspection / HF-parity tests.
    scan_layers: bool = False
    # Partial unrolling of the layer scan (lax.scan unroll): reduces per-step
    # scan overhead (~13 ms/layer measured) at modest compile-time cost.
    scan_unroll: int = 1
    # Layer grouping for the scan: scan over L/G groups whose body runs G
    # distinct layers under ONE remat. Divides both the scan-boundary
    # activation-carry traffic (the 64x50 MB/step copy pairs seen in the
    # round-1 xplane trace) and the per-iteration stacked-weight slicing by
    # G, at the cost of holding G layers' backward residuals at once.
    scan_group: int = 1
    # LoRA on every projection (the reference's find_all_linear_names targets,
    # litmodule.py:36-55); None disables.
    lora: LoRAConfig | None = None
    # 'int8' stores the frozen base projections quantized (ops/quant.py);
    # only meaningful with LoRA (base is frozen there).
    base_quant: str | None = None

    @staticmethod
    def tiny(**overrides) -> "MistralConfig":
        """A tiny config for tests (parity vs transformers MistralModel)."""
        base = dict(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, dtype=jnp.float32,
            remat=False, attention_impl="xla",
        )
        base.update(overrides)
        return MistralConfig(**base)


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        x = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps)
        weight = self.param(
            "weight", nn.initializers.ones, (x.shape[-1],), self.param_dtype
        )
        # HF order (modeling_mistral.py MistralRMSNorm.forward): normalize in
        # f32, cast back to the input dtype, THEN multiply by the weight in
        # that dtype — `self.weight * hidden_states.to(input_dtype)`. Keeping
        # the weight multiply in f32 both deviates from HF and keeps an f32
        # (B,S,E) cotangent alive through the backward (xplane round 3).
        return x.astype(dtype) * weight.astype(dtype)


def rope_frequencies(head_dim: int, theta: float) -> jnp.ndarray:
    return 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )


def rope_tables(positions: jnp.ndarray, head_dim: int, theta: float):
    """(cos, sin) tables (B, 1, S, D/2), computed once per forward.

    Hoisted out of the layer stack: inside the scanned/rematted layers these
    would be recomputed 32x in forward and again in backward.
    """
    inv_freq = rope_frequencies(head_dim, theta)          # (D/2,)
    angles = positions[:, None, :, None].astype(jnp.float32) * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, rope, theta: float | None = None) -> jnp.ndarray:
    """Rotary embedding, HF 'split-half' convention.

    x: (B, H, S, D); ``rope`` is either precomputed ``(cos, sin)`` tables or
    a (B, S) positions array (tables are then built on the fly).
    """
    if isinstance(rope, tuple):
        cos, sin = rope
    else:
        cos, sin = rope_tables(rope, x.shape[-1], theta)
    # HF applies the rotation in the model compute dtype: cos/sin are built in
    # f32 but cast to x.dtype before the multiply (modeling_mistral.py,
    # apply_rotary_pos_emb / MistralRotaryEmbedding.forward). Matching that —
    # rather than upcasting x to f32 — is both HF-faithful and removes the
    # f32 (B,S,H,D) cotangent tensors + their per-layer layout copies that
    # the round-3 xplane trace showed (~100 ms/step at production geometry).
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )


def apply_rope_packed(x: jnp.ndarray, rope, num_heads: int,
                      theta: float | None = None) -> jnp.ndarray:
    """Rotary embedding on the packed (B, S, H*D) layout.

    The head split is the MINOR dim, so the (B, S, H, D) view is a bitcast
    and the rotation stays a pure elementwise fusion — no physical
    (B,H,S,D) transpose is ever materialized (the packed attention path,
    see ops/flash_attention.attention_packed).  Numerics identical to
    :func:`apply_rope` (same HF split-half convention and dtypes).
    """
    b, s, hd = x.shape
    d = hd // num_heads
    if isinstance(rope, tuple):
        cos, sin = rope                        # (B|1, 1, S, D/2)
    else:
        cos, sin = rope_tables(rope, d, theta)
    # (B|1, 1, S, D/2) -> (B|1, S, 1, D/2): swapping a size-1 axis is a
    # reshape, not a transpose.
    cos = jnp.swapaxes(cos, 1, 2).astype(x.dtype)
    sin = jnp.swapaxes(sin, 1, 2).astype(x.dtype)
    x4 = x.reshape(b, s, num_heads, d)
    x1, x2 = jnp.split(x4, 2, axis=-1)
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )
    return out.reshape(b, s, hd)


def _remat_policy(name: str):
    if name == "nothing":
        return jax.checkpoint_policies.nothing_saveable
    if name == "attn":
        return jax.checkpoint_policies.save_only_these_names("attn_out")
    if name == "mids":
        # Save only the (tokens, r) LoRA mids (~88 MB total at 32L): the
        # backward skips re-running every fused dropout+rank-r kernel.
        return jax.checkpoint_policies.save_only_these_names("lora_mid")
    if name == "flash":
        # Save the flash kernel outputs (out + logsumexp, ~3.6 GB at 32L)
        # and the LoRA mids: the backward never re-runs the flash forward
        # or the adapter kernels — only projections/norms rematerialize.
        return jax.checkpoint_policies.save_only_these_names(
            "flash_out", "flash_lse", "lora_mid"
        )
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f"unknown remat_policy {name!r}")


def _proj(cfg: MistralConfig, feats: int, name: str):
    """Projection factory: Dense, LoRADense (adapters), or FrozenQuantDense
    (quantized base without adapters — the frozen-baseline regime)."""
    if cfg.lora is not None:
        return LoRADense(feats, cfg.lora, use_bias=False,
                         dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                         quantized=cfg.base_quant in ("int8", "w8a8", "w8a8g8"),
                         act_quant=cfg.base_quant in ("w8a8", "w8a8g8"),
                         grad_quant=(cfg.base_quant == "w8a8g8"), name=name)
    if cfg.base_quant is not None:
        from phantom_vlb_tpu.models.lora import FrozenQuantDense

        return FrozenQuantDense(
            feats, use_bias=False, name=name,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            act_quant=cfg.base_quant in ("w8a8", "w8a8g8"),
            grad_quant=(cfg.base_quant == "w8a8g8"),
        )
    return nn.Dense(feats, use_bias=False, name=name,
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype)


def _call_proj(cfg: MistralConfig, proj, x, deterministic, adapter_x=None):
    if cfg.lora is not None:
        return proj(x, deterministic, adapter_x)
    return proj(x)


def _shared_adapter_input(module, cfg: MistralConfig, x, deterministic):
    """One dropout mask for all adapters reading ``x`` (shared_dropout)."""
    if (
        cfg.lora is not None
        and cfg.lora.shared_dropout
        and cfg.lora.dropout
        and not deterministic
    ):
        from phantom_vlb_tpu.models.lora import adapter_dropout

        return adapter_dropout(module, x, cfg.lora)
    return None


class MistralAttention(nn.Module):
    config: MistralConfig

    @nn.compact
    def __call__(self, x, rope, kv_mask=None, deterministic: bool = True):
        cfg = self.config
        b, s, _ = x.shape
        h, hkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

        def proj(feats, name, y, adapter_y=None):
            return _call_proj(cfg, _proj(cfg, feats, name), y, deterministic,
                              adapter_y)

        x_adapter = _shared_adapter_input(self, cfg, x, deterministic)

        impl = cfg.attention_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if impl == "pallas":
            # Packed transpose-free path: projections already emit
            # (B, S, H*D), the packed kernel consumes/produces it directly,
            # and rope is applied on the (B, S, H, D) VIEW (bitcast — the
            # head split is the minor dim, so no physical relayout).  This
            # removes every (B,S,H,D)<->(B,H,S,D) copy XLA otherwise
            # inserts around attention — measured ~150 ms/step at the VLB
            # production geometry (BENCHMARKS.md round 4).
            q = proj(h * d, "q_proj", x, x_adapter)
            k = proj(hkv * d, "k_proj", x, x_adapter)
            v = proj(hkv * d, "v_proj", x, x_adapter)
            q = apply_rope_packed(q, rope, h, cfg.rope_theta)
            k = apply_rope_packed(k, rope, hkv, cfg.rope_theta)
            out = attention_packed(q, k, v, h, hkv, causal=True, kv_mask=kv_mask)
            out = jax.ad_checkpoint.checkpoint_name(out, "attn_out")
            return proj(cfg.hidden_size, "o_proj", out)

        q = proj(h * d, "q_proj", x, x_adapter).reshape(b, s, h, d).transpose(0, 2, 1, 3)
        k = proj(hkv * d, "k_proj", x, x_adapter).reshape(b, s, hkv, d).transpose(0, 2, 1, 3)
        v = proj(hkv * d, "v_proj", x, x_adapter).reshape(b, s, hkv, d).transpose(0, 2, 1, 3)

        q = apply_rope(q, rope, cfg.rope_theta)
        k = apply_rope(k, rope, cfg.rope_theta)

        if cfg.attention_impl in ("ring", "ring_flash", "ring_fused"):
            from phantom_vlb_tpu.ops.context_parallel import (
                get_sequence_mesh,
                ring_attention,
                ring_flash_attention,
            )

            if cfg.attention_impl == "ring_fused":
                # Fused-RDMA forward (ops/ring_fused.py): one Pallas kernel
                # owns the whole ring pass, forwarding KV chunks with async
                # remote copies while computing; backward = the exact
                # per-step ring (shared flash decomposition).
                from phantom_vlb_tpu.ops.ring_fused import ring_flash_fused

                out = ring_flash_fused(
                    q, k, v, get_sequence_mesh().mesh,
                    causal=True, kv_mask=kv_mask,
                )
            else:
                ring = (
                    ring_flash_attention
                    if cfg.attention_impl == "ring_flash"
                    else ring_attention
                )
                out = ring(
                    q, k, v, get_sequence_mesh(), causal=True, kv_mask=kv_mask
                )
        else:
            out = flash_attention(
                q, k, v, causal=True, kv_mask=kv_mask, impl=impl
            )
        out = jax.ad_checkpoint.checkpoint_name(out, "attn_out")
        out = out.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return proj(cfg.hidden_size, "o_proj", out)


class MistralMLP(nn.Module):
    config: MistralConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config

        def proj(feats, name, y, adapter_y=None):
            return _call_proj(cfg, _proj(cfg, feats, name), y, deterministic,
                              adapter_y)

        x_adapter = _shared_adapter_input(self, cfg, x, deterministic)
        gate = proj(cfg.intermediate_size, "gate_proj", x, x_adapter)
        up = proj(cfg.intermediate_size, "up_proj", x, x_adapter)
        return proj(cfg.hidden_size, "down_proj", nn.silu(gate) * up)


def _decoder_forward(cfg: MistralConfig, x, rope, kv_mask, deterministic):
    """Shared decoder-layer body (instantiated inside a compact context)."""
    h = x + MistralAttention(cfg, name="self_attn")(
        RMSNorm(cfg.rms_norm_eps, cfg.dtype, cfg.param_dtype,
                name="input_layernorm")(x),
        rope,
        kv_mask,
        deterministic,
    )
    out = h + MistralMLP(cfg, name="mlp")(
        RMSNorm(cfg.rms_norm_eps, cfg.dtype, cfg.param_dtype,
                name="post_attention_layernorm")(h),
        deterministic,
    )
    return out


class MistralDecoderLayer(nn.Module):
    config: MistralConfig

    @nn.compact
    def __call__(self, x, rope, kv_mask=None, deterministic: bool = True):
        return _decoder_forward(self.config, x, rope, kv_mask, deterministic)


class MistralScanBlock(nn.Module):
    """Scan body: same params subtree as a layer; returns (carry, ys)."""

    config: MistralConfig
    collect_inputs: bool = False

    @nn.compact
    def __call__(self, x, rope, kv_mask=None, deterministic: bool = True):
        out = _decoder_forward(self.config, x, rope, kv_mask, deterministic)
        return out, (x if self.collect_inputs else None)


class MistralGroupBlock(nn.Module):
    """Scan body running ``group`` distinct layers (param subtrees
    ``sub_0..sub_{group-1}``, each stacked (L/group, ...) under the scan)."""

    config: MistralConfig
    group: int

    @nn.compact
    def __call__(self, x, rope, kv_mask=None, deterministic: bool = True):
        for i in range(self.group):
            x = MistralDecoderLayer(self.config, name=f"sub_{i}")(
                x, rope, kv_mask, deterministic
            )
        return x, None


class MistralModel(nn.Module):
    """Decoder stack over *embeddings* (the multimodal splice feeds embeds)."""

    config: MistralConfig

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, name="embed_tokens",
            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
        )
        if cfg.scan_layers:
            # One compiled layer body iterated with lax.scan: 32x less HLO
            # than unrolling, the TPU-idiomatic big-model layout. Per-layer
            # params gain a leading (num_layers,) axis under 'layers_scan'.
            if cfg.scan_group > 1:
                if cfg.num_hidden_layers % cfg.scan_group:
                    raise ValueError(
                        f"scan_group={cfg.scan_group} must divide "
                        f"num_hidden_layers={cfg.num_hidden_layers}"
                    )
                body = MistralGroupBlock
                if cfg.remat:
                    body = nn.remat(
                        MistralGroupBlock,
                        policy=_remat_policy(cfg.remat_policy),
                        static_argnums=(4,),
                    )
                self.layers_scan = nn.scan(
                    body,
                    variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                    length=cfg.num_hidden_layers // cfg.scan_group,
                    unroll=cfg.scan_unroll,
                )(cfg, cfg.scan_group, name="layers_scan")
            else:
                body = MistralScanBlock
                if cfg.remat:
                    body = nn.remat(
                        MistralScanBlock,
                        policy=_remat_policy(cfg.remat_policy),
                        static_argnums=(4,),
                    )
                self.layers_scan = nn.scan(
                    body,
                    variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                    length=cfg.num_hidden_layers,
                    unroll=cfg.scan_unroll,
                )(cfg, name="layers_scan")
        else:
            block = MistralDecoderLayer
            if cfg.remat:
                block = nn.remat(
                    MistralDecoderLayer,
                    policy=_remat_policy(cfg.remat_policy),
                    static_argnums=(4,),
                )
            self.layers = [
                block(cfg, name=f"layers_{i}")
                for i in range(cfg.num_hidden_layers)
            ]
        self.final_norm = RMSNorm(
            cfg.rms_norm_eps, cfg.dtype, cfg.param_dtype, name="norm"
        )

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    def __call__(
        self,
        inputs_embeds: jnp.ndarray,        # (B, S, E)
        positions: jnp.ndarray | None = None,
        kv_mask: jnp.ndarray | None = None,
        output_hidden_states: bool = False,
        deterministic: bool = True,
    ):
        cfg = self.config
        b, s, _ = inputs_embeds.shape
        if positions is None:
            # (1, S), not (B, S): every row uses identity positions, so the
            # (cos, sin) tables broadcast over batch — the scanned layers
            # then carry one 3 MB table copy per step instead of six
            # (xplane round 2: per-layer f32[6,1,2048,64] copy pairs).
            positions = jnp.arange(s, dtype=jnp.int32)[None]

        x = inputs_embeds.astype(cfg.dtype)
        rope = rope_tables(positions, cfg.head_dim, cfg.rope_theta)

        if cfg.scan_layers:
            if output_hidden_states:
                raise NotImplementedError(
                    "output_hidden_states needs the unrolled stack "
                    "(scan_layers=False); the scanned path returns the "
                    "post-norm output directly, which equals "
                    "hidden_states[-1] (litmodule.py:245)."
                )
            x, _ = self.layers_scan(x, rope, kv_mask, deterministic)
            return self.final_norm(x)

        # HF semantics (the reference pools ``hidden_states[-1]``,
        # litmodule.py:245): the tuple holds the INPUT of every decoder layer
        # (embeddings first) plus, last, the post-final-norm output — 33
        # entries for 32 layers (litmodule.py:240).
        hidden_states = [] if output_hidden_states else None

        for layer in self.layers:
            if output_hidden_states:
                hidden_states.append(x)
            x = layer(x, rope, kv_mask, deterministic)

        x = self.final_norm(x)
        if output_hidden_states:
            hidden_states.append(x)
            return x, hidden_states
        return x


class MistralForCausalLM(nn.Module):
    config: MistralConfig

    def setup(self):
        self.model = MistralModel(self.config)
        self.lm_head = nn.Dense(
            self.config.vocab_size, use_bias=False, name="lm_head_dense",
            dtype=self.config.dtype, param_dtype=self.config.param_dtype,
        )

    def __call__(self, input_ids, kv_mask=None, output_hidden_states=False):
        embeds = self.model.embed(input_ids)
        out = self.model(
            embeds, kv_mask=kv_mask, output_hidden_states=output_hidden_states
        )
        if output_hidden_states:
            x, hidden_states = out
            return self.lm_head(x), hidden_states
        return self.lm_head(out)
