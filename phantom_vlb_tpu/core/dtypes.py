"""Mixed-precision dtype policy.

The reference trains ``bf16-mixed`` (baseline.yaml:43) with the head also in
bf16 (litmodule.py:155-157).  TPU policy (documented deviation, SURVEY.md §7
hard-part 6): backbone params/activations bf16 for MXU throughput; the brain
readout head, loss, and Pearson metrics run in float32 so ridge numerics and
correlation accumulation stay stable.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = ["DtypePolicy", "POLICIES"]


@dataclasses.dataclass(frozen=True)
class DtypePolicy:
    param_dtype: jnp.dtype = jnp.float32      # master params
    compute_dtype: jnp.dtype = jnp.bfloat16   # backbone matmuls/activations
    head_dtype: jnp.dtype = jnp.float32       # readout head + loss
    metric_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_head(self, x):
        return jnp.asarray(x, self.head_dtype)


POLICIES = {
    "bf16_mixed": DtypePolicy(),
    "f32": DtypePolicy(compute_dtype=jnp.float32),
    # Fully bf16 (closest to the reference's literal behavior).
    "bf16": DtypePolicy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
                        head_dtype=jnp.bfloat16),
}
