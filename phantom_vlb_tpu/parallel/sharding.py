"""GSPMD parameter partitioning: FSDP + tensor-parallel rules.

The reference's distributed capability is Lightning/Accelerate FSDP
(FULL_SHARD over MistralDecoderLayer, fsdp.yaml:3-14; SURVEY.md §2.2).  The
TPU-native equivalent is declarative: every parameter leaf gets a
``PartitionSpec`` over the ('data','fsdp','tensor','sequence') mesh and XLA
emits all collectives (all-gather for FSDP params, psum for grads) over ICI.

Rule table (matched on the '/'-joined param path, first match wins):
- attention/MLP input-side kernels  (in, out): P('fsdp', 'tensor')
- attention/MLP output-side kernels (in, out): P('tensor', 'fsdp')
- embeddings (vocab, hidden): P('fsdp', None) — vocab is the big axis
- LoRA: A (in, r) P('fsdp', None); B (r, out) P(None, 'tensor')
- everything else: largest divisible axis over 'fsdp' when the leaf is big,
  else replicated (ZeRO-3 default).

Specs are validated against actual shapes: any axis that doesn't divide is
dropped (falls back to replication on that axis) so tiny test configs shard
cleanly on the 8-device CPU mesh.
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from phantom_vlb_tpu.core.mesh import MeshEnv

__all__ = ["DEFAULT_RULES", "infer_param_shardings", "shard_params", "batch_spec"]


DEFAULT_RULES: list[tuple[str, P]] = [
    (r"(q_proj|k_proj|v_proj|gate_proj|up_proj)/kernel(_q)?$", P("fsdp", "tensor")),
    (r"(o_proj|down_proj)/kernel(_q)?$", P("tensor", "fsdp")),
    # Per-output-channel scales of quantized bases follow the kernel's output
    # axis so scale and weight shards land on the same devices.
    (r"(q_proj|k_proj|v_proj|gate_proj|up_proj)/kernel_scale$", P("tensor")),
    (r"(o_proj|down_proj)/kernel_scale$", P("fsdp")),
    (r"lora_a$", P("fsdp", None)),
    (r"lora_b$", P(None, "tensor")),
    (r"embed_tokens/embedding$", P("fsdp", None)),
    (r"lm_head_dense/kernel$", P("fsdp", "tensor")),
    (r"head/ridge/linear/kernel$", P("fsdp", None)),
    # CLIP / connector dense kernels: shard the input axis.
    (r"(fc1|fc2|out_proj|readout_\d+)/kernel$", P("fsdp", None)),
]

# Leaves smaller than this stay replicated under the fallback rule.
MIN_SIZE_TO_SHARD = 2**15


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def _fit_spec(spec: P, shape: tuple[int, ...], mesh_shape: dict) -> P:
    """Drop mesh axes that don't divide the corresponding dim.

    A spec shorter than the array rank is right-aligned (leading axes
    replicated) — scanned layer stacks carry a leading (num_layers,) axis
    over the same 2D kernel rules.
    """
    if len(spec) < len(shape):
        spec = P(*([None] * (len(shape) - len(spec)) + list(spec)))
    out = []
    for i, entry in enumerate(spec):
        if entry is None or i >= len(shape):
            out.append(None)
            continue
        axes = entry if isinstance(entry, tuple) else (entry,)
        size = int(np.prod([mesh_shape.get(a, 1) for a in axes]))
        out.append(entry if size > 0 and shape[i] % size == 0 else None)
    while out and out[-1] is None:
        out.pop()
    return P(*out)


def _fallback_spec(shape: tuple[int, ...], mesh_shape: dict) -> P:
    if int(np.prod(shape)) < MIN_SIZE_TO_SHARD:
        return P()
    fsdp = mesh_shape.get("fsdp", 1)
    if fsdp <= 1:
        return P()
    # Shard the largest divisible axis over fsdp.
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % fsdp == 0:
            spec = [None] * len(shape)
            spec[i] = "fsdp"
            return P(*spec)
    return P()


def infer_param_shardings(
    params,
    env: MeshEnv,
    rules: Sequence[tuple[str, P]] = tuple(DEFAULT_RULES),
):
    """PartitionSpec tree (same structure as ``params``)."""
    compiled = [(re.compile(pat), spec) for pat, spec in rules]
    mesh_shape = dict(env.mesh.shape)

    def leaf_spec(path, leaf) -> P:
        shape = tuple(getattr(leaf, "shape", ()))
        if len(shape) <= 0:
            return P()
        name = _path_str(path)
        for pat, spec in compiled:
            if pat.search(name):
                return _fit_spec(spec, shape, mesh_shape)
        return _fit_spec(_fallback_spec(shape, mesh_shape), shape, mesh_shape)

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def shard_params(params, env: MeshEnv, rules=tuple(DEFAULT_RULES)):
    """device_put the tree with inferred NamedShardings."""
    specs = infer_param_shardings(params, env, rules)
    shardings = jax.tree.map(
        lambda s: NamedSharding(env.mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(params, shardings), shardings


def batch_spec() -> P:
    """Batch arrays: leading dim over (data, fsdp)."""
    return P(("data", "fsdp"))
