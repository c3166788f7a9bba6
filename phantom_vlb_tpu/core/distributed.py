"""Multi-host initialization (SURVEY.md §2.3).

The reference initializes NCCL process groups through torchrun env vars
(RANK/WORLD_SIZE/MASTER_ADDR; train_debug.py:23-43).  The TPU-native
equivalent is ``jax.distributed.initialize``: on Cloud TPU pods/slices it
auto-discovers peers from the TPU metadata; elsewhere it honours explicit
coordinator env vars.  After initialization every host sees the global device
set and the same GSPMD mesh code runs unchanged — collectives ride ICI within
a slice and DCN across slices.
"""

from __future__ import annotations

import os

import jax

__all__ = ["maybe_initialize_distributed", "is_multihost", "process_info"]

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Initialize multi-host JAX when the environment calls for it.

    Triggers when ``VLB_COORDINATOR`` (host:port) is set, or when running on
    a Cloud TPU pod slice (auto-discovery).  Safe to call repeatedly; no-op
    for single-host runs.
    """
    global _initialized
    if _initialized:
        return True

    coordinator = os.environ.get("VLB_COORDINATOR")
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(os.environ["VLB_NUM_PROCESSES"]),
            process_id=int(os.environ["VLB_PROCESS_ID"]),
        )
        _initialized = True
        return True

    # Cloud TPU pod slices: auto-discovery needs no arguments.
    if os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0:
        jax.distributed.initialize()
        _initialized = True
        return True
    return False


def is_multihost() -> bool:
    return jax.process_count() > 1


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
