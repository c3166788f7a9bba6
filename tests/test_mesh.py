"""Mesh construction + sharding smoke tests on the 8-device CPU platform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from phantom_vlb_tpu.core.mesh import MeshConfig, build_mesh


def test_default_mesh_absorbs_devices(cpu_devices):
    env = build_mesh()
    assert env.n_devices == 8
    assert env.mesh.shape["fsdp"] == 8
    assert env.mesh.shape["data"] == 1


def test_explicit_mesh(cpu_devices):
    env = build_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    assert env.mesh.shape == {"data": 2, "fsdp": 2, "tensor": 2, "sequence": 1}


def test_bad_mesh_raises(cpu_devices):
    with pytest.raises(ValueError):
        build_mesh(MeshConfig(data=3, fsdp=-1))
    with pytest.raises(ValueError):
        build_mesh(MeshConfig(data=-1, fsdp=-1))


def test_sharded_matmul_runs(cpu_devices):
    env = build_mesh(MeshConfig(data=1, fsdp=4, tensor=2))
    x = jnp.ones((8, 16), jnp.float32)
    w = jnp.ones((16, 32), jnp.float32)
    xs = jax.device_put(x, env.batch())
    ws = jax.device_put(w, env.sharding(None, "tensor"))

    @jax.jit
    def f(x, w):
        return x @ w

    out = f(xs, ws)
    np.testing.assert_allclose(np.asarray(out), 16.0)
    assert out.sharding.is_equivalent_to(env.batch("tensor"), ndim=2)
