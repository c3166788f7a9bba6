"""Brain readout head: LN -> HRF pooling -> LN -> dropout -> ridge.

Reference composition (litmodule.py:217-254 + utils.py:40-73):
``hidden_states[-1] -> LayerNorm -> einsum('bse,bs->be') HRF-weighted sum ->
LayerNorm -> Dropout -> Linear(hidden, num_parcels) (+ l2_lambda * ||W||_F^2)``.

TPU notes: the head runs in float32 regardless of backbone compute dtype
(documented deviation — reference keeps it bf16; SURVEY.md §7 hard-part 6).
The HRF pooling einsum contracts the 2048-long sequence axis per sample; XLA
fuses it with the surrounding LayerNorms, so no dedicated Pallas kernel is
required (measured memory-bound either way).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["HRFPool", "RidgeHead", "BrainReadoutHead"]


class HRFPool(nn.Module):
    """HRF-weighted sum over the sequence axis (utils.py:40-56)."""

    @nn.compact
    def __call__(self, embeddings: jnp.ndarray, hrf_weights: jnp.ndarray) -> jnp.ndarray:
        # (B, S, E) x (B, S) -> (B, E)
        return jnp.einsum("bse,bs->be", embeddings, hrf_weights.astype(embeddings.dtype))


class RidgeHead(nn.Module):
    """Linear regression to parcels with an L2 weight penalty (utils.py:59-73)."""

    num_target: int
    l2_lambda: float = 0.001

    @nn.compact
    def __call__(self, x: jnp.ndarray, add_regularization: bool = True):
        dense = nn.Dense(self.num_target, use_bias=True, name="linear",
                         dtype=jnp.float32, param_dtype=jnp.float32)
        out = dense(x)
        if not add_regularization:
            return out
        w = self.variables["params"]["linear"]["kernel"]
        l2_reg = self.l2_lambda * jnp.sum(jnp.square(w.astype(jnp.float32)))
        return out, l2_reg


class BrainReadoutHead(nn.Module):
    """Full readout stack over backbone hidden states (litmodule.py:245-254)."""

    hidden_size: int
    num_target: int
    l2_lambda: float = 0.001
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (B, S, E) last-layer hidden states
        weight_mask: jnp.ndarray,    # (B, S) HRF weights
        deterministic: bool = True,
    ):
        h = hidden_states.astype(jnp.float32)
        h = nn.LayerNorm(name="layer_norm1", dtype=jnp.float32)(h)
        pooled = HRFPool(name="hrf_pool")(h, weight_mask)
        pooled = nn.LayerNorm(name="layer_norm2", dtype=jnp.float32)(pooled)
        pooled = nn.Dropout(self.dropout_rate, deterministic=deterministic)(pooled)
        return RidgeHead(
            self.num_target, self.l2_lambda, name="ridge"
        )(pooled)
