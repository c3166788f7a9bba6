"""Device mesh and named-axis policy.

The reference scales with NCCL data-parallel / FSDP via Lightning & Accelerate
(SURVEY.md §2.2-2.3; fsdp.yaml, script_graveyard/train_dev_nohydra.py:80-97).
TPU-native equivalent: one ``jax.sharding.Mesh`` with named axes; GSPMD emits
all collectives over ICI/DCN from sharding annotations — no hand-written
communication layer.

Axis conventions (stable public API; keep names even at size 1 so configs and
checkpoints stay portable as topology grows):

- ``data``     pure data parallelism (batch replication of params).
- ``fsdp``     ZeRO-3-style parameter/optimizer sharding (batch is also
               split over this axis; params are all-gathered per layer).
- ``tensor``   tensor parallelism for attention/MLP matmuls.
- ``sequence`` reserved for context parallelism (unused by the reference's
               2048-token geometry, SURVEY.md §5.7, but part of the API).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["MeshConfig", "MeshEnv", "build_mesh", "batch_sharding", "replicated"]

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
SEQUENCE_AXIS = "sequence"
AXIS_NAMES = (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS, SEQUENCE_AXIS)
# Axes over which a batch is split.
BATCH_AXES = (DATA_AXIS, FSDP_AXIS)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Mesh shape; ``-1`` on one axis absorbs the remaining devices."""

    data: int = 1
    fsdp: int = -1
    tensor: int = 1
    sequence: int = 1

    def sizes(self, n_devices: int) -> tuple[int, int, int, int]:
        sizes = [self.data, self.fsdp, self.tensor, self.sequence]
        n_auto = sum(1 for s in sizes if s == -1)
        if n_auto > 1:
            raise ValueError("at most one mesh axis may be -1")
        fixed = int(np.prod([s for s in sizes if s != -1]))
        if n_auto == 1:
            if n_devices % fixed:
                raise ValueError(
                    f"{n_devices} devices not divisible by fixed axes {fixed}"
                )
            sizes = [n_devices // fixed if s == -1 else s for s in sizes]
        elif fixed != n_devices:
            raise ValueError(
                f"mesh {sizes} needs {fixed} devices, have {n_devices}"
            )
        return tuple(sizes)  # type: ignore[return-value]


@dataclasses.dataclass
class MeshEnv:
    """A built mesh plus convenience sharding constructors."""

    mesh: Mesh

    @property
    def n_devices(self) -> int:
        return int(np.prod(self.mesh.devices.shape))

    @property
    def batch_divisor(self) -> int:
        return int(
            np.prod([self.mesh.shape[a] for a in BATCH_AXES if a in self.mesh.shape])
        )

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def batch(self, *trailing) -> NamedSharding:
        """Leading dim split over (data, fsdp); trailing dims per ``trailing``."""
        return NamedSharding(self.mesh, P(BATCH_AXES, *trailing))


def build_mesh(
    config: MeshConfig | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> MeshEnv:
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    sizes = config.sizes(len(devices))
    dev_array = np.asarray(devices).reshape(sizes)
    return MeshEnv(Mesh(dev_array, AXIS_NAMES))


def batch_sharding(env: MeshEnv) -> NamedSharding:
    return env.batch()


def replicated(env: MeshEnv) -> NamedSharding:
    return env.replicated()
