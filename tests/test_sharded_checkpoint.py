"""Sharded checkpoint portability: save under one mesh, restore under another.

The reference's FSDP experiments used sharded state dicts pinned to world
size (fsdp.yaml:12; graveyard). With Orbax + GSPMD the checkpoint is
mesh-agnostic: restoring against a target with different NamedShardings
reshards transparently.
"""

import numpy as np
import jax
import jax.numpy as jnp

from phantom_vlb_tpu.core.mesh import MeshConfig, build_mesh
from phantom_vlb_tpu.models.videollama2 import VLBConfig, VideoLLaMA2VLB
from phantom_vlb_tpu.parallel.sharding import shard_params
from phantom_vlb_tpu.train.checkpoint import CheckpointManager


def _params(cfg):
    from __graft_entry__ import _example_batch

    model = VideoLLaMA2VLB(cfg)
    batch = _example_batch(cfg.geometry, 2, cfg.mistral.vocab_size)
    return model.init(
        jax.random.key(0), batch["language"], batch["vision"],
        batch["padvals"], batch["vis_weights"], batch["lang_weights"],
    )["params"]


def test_cross_mesh_restore(tmp_path, cpu_devices):
    cfg = VLBConfig.tiny()
    params = _params(cfg)

    env8 = build_mesh(MeshConfig(data=1, fsdp=8, tensor=1))
    sharded8, _ = shard_params(params, env8)
    cm = CheckpointManager(tmp_path)
    cm.save("ckpt", sharded8)

    # Restore into a 2x2(+tensor) mesh: different device placement entirely.
    env4 = build_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    target4, _ = shard_params(jax.tree.map(jnp.zeros_like, params), env4)
    restored = cm.restore("ckpt", target4)

    a = jax.tree.leaves(params)
    b = jax.tree.leaves(restored)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # Restored arrays carry the TARGET sharding.
    leaf = restored["model"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert leaf.sharding.mesh.shape == env4.mesh.shape
