"""Multi-chip sharding tests on the 8-device virtual CPU platform."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from phantom_vlb_tpu.core.mesh import MeshConfig, build_mesh
from phantom_vlb_tpu.models.videollama2 import VLBConfig, VideoLLaMA2VLB
from phantom_vlb_tpu.parallel.sharding import infer_param_shardings, shard_params


def test_rules_applied(cpu_devices):
    env = build_mesh(MeshConfig(data=1, fsdp=4, tensor=2))
    cfg = VLBConfig.tiny(use_lora=True)
    model = VideoLLaMA2VLB(cfg)
    from __graft_entry__ import _example_batch

    batch = _example_batch(cfg.geometry, 4, cfg.mistral.vocab_size)
    params = model.init(
        jax.random.key(0), batch["language"], batch["vision"],
        batch["padvals"], batch["vis_weights"], batch["lang_weights"],
    )["params"]
    specs = infer_param_shardings(params, env)
    # Attention kernels follow the fsdp/tensor rule (64x64 tiny dims divide).
    q_spec = specs["model"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert q_spec == P("fsdp", "tensor")
    o_spec = specs["model"]["layers_0"]["self_attn"]["o_proj"]["kernel"]
    assert o_spec == P("tensor", "fsdp")
    # Tiny norm weights stay replicated.
    assert specs["model"]["norm"]["weight"] == P()


def test_sharded_params_consistent(cpu_devices):
    env = build_mesh(MeshConfig(data=1, fsdp=8, tensor=1))
    cfg = VLBConfig.tiny()
    model = VideoLLaMA2VLB(cfg)
    from __graft_entry__ import _example_batch

    batch = _example_batch(cfg.geometry, 2, cfg.mistral.vocab_size)
    params = model.init(
        jax.random.key(0), batch["language"], batch["vision"],
        batch["padvals"], batch["vis_weights"], batch["lang_weights"],
    )["params"]
    sharded, _ = shard_params(params, env)
    # Values survive the scatter.
    a = jax.tree.leaves(params)[0]
    b = jax.tree.leaves(sharded)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Sharded forward == replicated forward.
    pred_r, _ = model.apply(
        {"params": params}, batch["language"], batch["vision"],
        batch["padvals"], batch["vis_weights"], batch["lang_weights"],
    )
    pred_s, _ = jax.jit(
        lambda p: model.apply(
            {"params": p}, batch["language"], batch["vision"],
            batch["padvals"], batch["vis_weights"], batch["lang_weights"],
        )
    )(sharded)
    np.testing.assert_allclose(
        np.asarray(pred_r), np.asarray(pred_s), atol=1e-4, rtol=1e-4
    )


def test_dryrun_multichip(cpu_devices):
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_dryrun_multichip_4dev(cpu_devices):
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(4)
