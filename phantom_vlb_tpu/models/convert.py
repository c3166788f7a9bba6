"""Torch/HF checkpoint -> Flax parameter conversion.

The torch->JAX weight converter named in SURVEY.md §7 (build step 3).  Works
from a flat ``state_dict``-style mapping of numpy arrays, so it accepts either
a live ``torch.nn.Module.state_dict()`` (tests: tiny random HF models) or
safetensors shards of the real VideoLLaMA2-7B / CLIP checkpoints.

Conventions: HF Linear ``weight`` is (out, in) -> Flax Dense ``kernel``
(in, out): transpose.  HF Conv2d (out, in, kh, kw) -> Flax (kh, kw, in, out).
HF Conv3d (out, in, kt, kh, kw) -> Flax (kt, kh, kw, in, out).  LayerNorm
weight/bias -> scale/bias; RMSNorm weight -> weight; Embedding -> embedding.
"""

from __future__ import annotations

from pathlib import Path
from typing import Mapping

import numpy as np

__all__ = [
    "state_dict_to_numpy",
    "load_safetensors_dir",
    "LazySafetensorsDir",
    "convert_mistral",
    "convert_clip_vision",
    "convert_stc_connector",
]


def state_dict_to_numpy(state_dict) -> dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        out[k] = v.detach().to("cpu").float().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def load_safetensors_dir(path: str | Path, prefix: str = "") -> dict[str, np.ndarray]:
    """Load all ``*.safetensors`` shards under ``path`` into one flat dict."""
    from safetensors import safe_open

    tensors: dict[str, np.ndarray] = {}
    for shard in sorted(Path(path).glob("*.safetensors")):
        with safe_open(shard, framework="numpy") as f:
            for key in f.keys():
                if key.startswith(prefix):
                    tensors[key[len(prefix):]] = f.get_tensor(key)
    return tensors


class LazySafetensorsDir:
    """Read-on-demand mapping over ``*.safetensors`` shards.

    Stream-conversion support for full-width checkpoints (~14 GB at 7B):
    tensors are read one at a time from the owning shard, so converting the
    real VideoLLaMA2-7B shards peaks at (output tree + one tensor) of RAM
    instead of (input + output).  Drop-in for the dict that
    :func:`load_safetensors_dir` returns (the converters only use
    ``__getitem__``/``__contains__``/iteration).
    """

    def __init__(self, path: str | Path, prefix: str = ""):
        from safetensors import safe_open

        self._prefix = prefix
        self._index: dict[str, Path] = {}
        for shard in sorted(Path(path).glob("*.safetensors")):
            with safe_open(shard, framework="numpy") as f:
                for key in f.keys():
                    if key.startswith(prefix):
                        self._index[key[len(prefix):]] = shard

    def __getitem__(self, key: str) -> np.ndarray:
        from safetensors import safe_open

        with safe_open(self._index[key], framework="numpy") as f:
            return f.get_tensor(self._prefix + key)

    def __contains__(self, key: str) -> bool:
        return key in self._index

    def __iter__(self):
        return iter(self._index)

    def keys(self):
        return self._index.keys()

    def __len__(self) -> int:
        return len(self._index)


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def stack_layer_params(model_params: dict, num_layers: int, group: int = 1) -> dict:
    """Fold ``layers_0..N-1`` subtrees into a stacked ``layers_scan`` subtree.

    For ``MistralConfig(scan_layers=True)``: every leaf gains a leading
    (num_layers,) axis.  With ``group=G`` (``MistralConfig(scan_group=G)``)
    the subtree instead holds ``sub_0..sub_{G-1}`` with leading
    (num_layers/G,) axes, where ``sub_i`` stacks layers ``g*G + i``.
    """

    def stack(trees: list) -> dict:
        out = {}
        for k in trees[0]:
            vals = [t[k] for t in trees]
            if isinstance(vals[0], dict):
                out[k] = stack(vals)
            else:
                out[k] = np.stack([np.asarray(v) for v in vals])
        return out

    layers = [model_params[f"layers_{i}"] for i in range(num_layers)]
    rest = {
        k: v for k, v in model_params.items() if not k.startswith("layers_")
    }
    if group > 1:
        if num_layers % group:
            raise ValueError(f"group={group} must divide num_layers={num_layers}")
        rest["layers_scan"] = {
            f"sub_{i}": stack(layers[i::group]) for i in range(group)
        }
    else:
        rest["layers_scan"] = stack(layers)
    return rest


def convert_mistral(
    sd: Mapping[str, np.ndarray],
    num_layers: int,
    prefix: str = "model.",
    lm_head: bool = True,
    scan: bool = False,
    scan_group: int = 1,
) -> dict:
    """HF ``MistralForCausalLM`` weights -> our ``MistralForCausalLM`` params."""
    model: dict = {
        "embed_tokens": {"embedding": sd[f"{prefix}embed_tokens.weight"]},
        "norm": {"weight": sd[f"{prefix}norm.weight"]},
    }
    for i in range(num_layers):
        p = f"{prefix}layers.{i}."
        model[f"layers_{i}"] = {
            "self_attn": {
                name: {"kernel": _t(sd[f"{p}self_attn.{name}.weight"])}
                for name in ("q_proj", "k_proj", "v_proj", "o_proj")
            },
            "mlp": {
                name: {"kernel": _t(sd[f"{p}mlp.{name}.weight"])}
                for name in ("gate_proj", "up_proj", "down_proj")
            },
            "input_layernorm": {"weight": sd[f"{p}input_layernorm.weight"]},
            "post_attention_layernorm": {
                "weight": sd[f"{p}post_attention_layernorm.weight"]
            },
        }
    if scan:
        model = stack_layer_params(model, num_layers, group=scan_group)
    if not lm_head:
        return {"model": model}
    return {
        "model": model,
        "lm_head_dense": {"kernel": _t(sd["lm_head.weight"])},
    }


def convert_clip_vision(
    sd: Mapping[str, np.ndarray],
    num_layers: int,
    prefix: str = "vision_model.",
    scan: bool = False,
    scan_group: int = 1,
) -> dict:
    """HF ``CLIPVisionModel`` weights -> our ``CLIPVisionTower`` params."""
    def ln(key):
        return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}

    params: dict = {
        "patch_embedding": {
            # (out, in, kh, kw) -> (kh, kw, in, out)
            "kernel": np.ascontiguousarray(
                np.transpose(sd[f"{prefix}embeddings.patch_embedding.weight"], (2, 3, 1, 0))
            )
        },
        "class_embedding": sd[f"{prefix}embeddings.class_embedding"],
        "position_embedding": sd[f"{prefix}embeddings.position_embedding.weight"],
        # (sic) HF's attribute really is spelled ``pre_layrnorm``.
        "pre_layrnorm": ln(f"{prefix}pre_layrnorm"),
    }
    for i in range(num_layers):
        p = f"{prefix}encoder.layers.{i}."
        params[f"layers_{i}"] = {
            "self_attn": {
                name: {
                    "kernel": _t(sd[f"{p}self_attn.{name}.weight"]),
                    "bias": sd[f"{p}self_attn.{name}.bias"],
                }
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "layer_norm1": ln(f"{p}layer_norm1"),
            "layer_norm2": ln(f"{p}layer_norm2"),
            "mlp": {
                "fc1": {
                    "kernel": _t(sd[f"{p}mlp.fc1.weight"]),
                    "bias": sd[f"{p}mlp.fc1.bias"],
                },
                "fc2": {
                    "kernel": _t(sd[f"{p}mlp.fc2.weight"]),
                    "bias": sd[f"{p}mlp.fc2.bias"],
                },
            },
        }
    if scan:
        params = stack_layer_params(params, num_layers, group=scan_group)
    return params


def _conv2d(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def convert_stc_connector(
    sd: Mapping[str, np.ndarray],
    depth: int = 4,
    mlp_depth: int = 2,
    prefix: str = "model.mm_projector.",
) -> dict:
    """VideoLLaMA2 ``STCConnector`` (timm RegStage naming) -> our params.

    timm Bottleneck naming: ``s{1,2}.b{j}.conv1.conv/bn``, ``conv2.conv/bn``,
    ``se.fc1/fc2``, ``conv3.conv/bn``, ``downsample.conv/bn`` (LayerNorm2d as
    'bn'); sampler ``sampler.0``; readout ``readout.0/2``.
    """
    def ln(key):
        return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}

    def block(p):
        out = {
            "conv1": {"kernel": _conv2d(sd[f"{p}.conv1.conv.weight"])},
            "norm1": {"LayerNorm_0": ln(f"{p}.conv1.bn")},
            "conv2": {"kernel": _conv2d(sd[f"{p}.conv2.conv.weight"])},
            "norm2": {"LayerNorm_0": ln(f"{p}.conv2.bn")},
            "conv3": {"kernel": _conv2d(sd[f"{p}.conv3.conv.weight"])},
            "norm3": {"LayerNorm_0": ln(f"{p}.conv3.bn")},
            "se": {
                "fc1": {
                    "kernel": _conv2d(sd[f"{p}.se.fc1.weight"]),
                    "bias": sd[f"{p}.se.fc1.bias"],
                },
                "fc2": {
                    "kernel": _conv2d(sd[f"{p}.se.fc2.weight"]),
                    "bias": sd[f"{p}.se.fc2.bias"],
                },
            },
        }
        if f"{p}.downsample.conv.weight" in sd:
            out["downsample_conv"] = {"kernel": _conv2d(sd[f"{p}.downsample.conv.weight"])}
            out["downsample_norm"] = {"LayerNorm_0": ln(f"{p}.downsample.bn")}
        return out

    params: dict = {}
    for stage in ("s1", "s2"):
        params[stage] = {
            f"b{j + 1}": block(f"{prefix}{stage}.b{j + 1}") for j in range(depth)
        }
    params["sampler_conv"] = {
        # (out, in, kt, kh, kw) -> (kt, kh, kw, in, out)
        "kernel": np.ascontiguousarray(
            np.transpose(sd[f"{prefix}sampler.0.weight"], (2, 3, 4, 1, 0))
        ),
        "bias": sd[f"{prefix}sampler.0.bias"],
    }
    params["readout_0"] = {
        "kernel": _t(sd[f"{prefix}readout.0.weight"]),
        "bias": sd[f"{prefix}readout.0.bias"],
    }
    for i in range(1, mlp_depth):
        params[f"readout_{i}"] = {
            "kernel": _t(sd[f"{prefix}readout.{2 * i}.weight"]),
            "bias": sd[f"{prefix}readout.{2 * i}.bias"],
        }
    return params
