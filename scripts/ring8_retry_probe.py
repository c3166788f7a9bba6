"""Retry the 8-device interpret-mode ring with eager DMA execution
(VERDICT r4 ask 8 / Weak #5).

The documented 4-device cap (`__graft_entry__.py` dryrun mesh B): mosaic
interpret mode deadlocks at exactly 8 concurrently-blocked kernels on this
host — all CPU-client callback threads block in DMA-semaphore waits whose
producing computations can then never be scheduled.  The default
``InterpretParams.dma_execution_mode`` is ``"on_wait"``, which is exactly
the blocking mechanism; ``"eager"`` executes each DMA as soon as it is
issued, so no kernel thread ever parks on a semaphore that another parked
kernel must signal.

This probe runs the fused-RDMA ring forward (`ops/ring_fused.py
ring_fwd_sharded`) over a FULL 8-device ring (mesh sequence=8) in interpret
mode with eager DMAs, checks the result against single-device flash
attention on the gathered sequence, and prints PASS/DEADLOCK-style timing.
Bounded by the caller's `timeout`; a hang = the workaround failed.

Run:  JAX_PLATFORMS=cpu timeout 900 python scripts/ring8_retry_probe.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh

from phantom_vlb_tpu.ops.ring_fused import ring_fwd_sharded


def main() -> int:
    n = 8
    b, hq, hkv, d = 1, 4, 2, 128
    s_loc = 256                     # small per-device footprint
    s = n * s_loc
    devs = np.array(jax.devices()[:n]).reshape(n)
    mesh = Mesh(devs, ("sequence",))

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, hq, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    kv_mask = jnp.ones((b, s), jnp.int32)

    params = pltpu.InterpretParams(dma_execution_mode="eager")
    print(f"[ring8] launching {n}-device ring (s_loc={s_loc}, eager DMA)...",
          flush=True)
    t0 = time.time()
    out, lse = ring_fwd_sharded(
        q, k, v, kv_mask, mesh, "sequence", causal=True, interpret=params,
        block_q=128,
    )
    out = jax.block_until_ready(out)
    dt = time.time() - t0
    print(f"[ring8] ring fwd completed in {dt:.1f}s", flush=True)

    # Reference: plain softmax attention with causal + GQA on one device.
    qf = np.asarray(q, np.float64)
    kf = np.asarray(k, np.float64).repeat(hq // hkv, axis=1)
    vf = np.asarray(v, np.float64).repeat(hq // hkv, axis=1)
    logits = np.einsum("bhqd,bhkd->bhqk", qf, kf) / np.sqrt(d)
    mask = np.tril(np.ones((s, s), bool))
    logits = np.where(mask, logits, -1e30)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", p, vf)

    got = np.asarray(out, np.float64)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    print(f"[ring8] rel_err vs dense reference: {rel:.2e}", flush=True)
    assert rel < 2e-5, rel
    print(f"[ring8] 8-DEVICE RING PASS (eager DMA, {dt:.1f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
