"""Validation metrics: streaming per-ROI Pearson r + CSV metrics log.

The reference accumulates every validation prediction in host memory and runs
``torchmetrics.PearsonCorrCoef`` once per epoch (utils.py:85-110).  Here the
correlation state is a tiny pytree of running moments updated **on device**
inside the jitted eval step (Welford batch merge — float32-stable), so no
activation-sized host transfer happens.

The CSV log is a stable API: ``make_acc_brainmaps`` greps its columns
(make_acc_brainmaps.py:41-48).  :class:`CSVMetricsLogger` reproduces the
Lightning CSVLogger layout — ``<save_dir>/<name>/version_<k>/metrics.csv``,
one row per logging event, union-of-keys header, empty cells for absent
metrics — including the ``val/brain_loss`` + ``val_corr_ROI_%06d`` +
``val_corr_avg`` row per validation epoch (train.py:32-39, utils.py:108-110).
"""

from __future__ import annotations

import csv
import dataclasses
from pathlib import Path
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PearsonState", "pearson_init", "pearson_update", "pearson_compute",
           "CSVMetricsLogger", "roi_metric_names"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PearsonState:
    """Running first/second moments per ROI (all shapes (P,) except n)."""

    n: jnp.ndarray
    mean_x: jnp.ndarray
    mean_y: jnp.ndarray
    m2x: jnp.ndarray
    m2y: jnp.ndarray
    cxy: jnp.ndarray


def pearson_init(num_target: int, dtype=jnp.float32) -> PearsonState:
    z = jnp.zeros((num_target,), dtype)
    return PearsonState(n=jnp.zeros((), dtype), mean_x=z, mean_y=z, m2x=z, m2y=z, cxy=z)


def pearson_update(
    state: PearsonState,
    preds: jnp.ndarray,    # (B, P)
    targets: jnp.ndarray,  # (B, P)
    row_mask: jnp.ndarray | None = None,  # (B,)
) -> PearsonState:
    """Merge one batch into the running moments (jit-safe, mask-aware)."""
    x = jnp.nan_to_num(preds.astype(state.mean_x.dtype))
    y = jnp.nan_to_num(targets.astype(state.mean_y.dtype))
    if row_mask is None:
        row_mask = jnp.ones(x.shape[0], x.dtype)
    m = row_mask.astype(x.dtype)[:, None]

    nb = jnp.sum(m)
    safe_nb = jnp.maximum(nb, 1.0)
    mean_xb = jnp.sum(x * m, axis=0) / safe_nb
    mean_yb = jnp.sum(y * m, axis=0) / safe_nb
    dxb = (x - mean_xb) * m
    dyb = (y - mean_yb) * m
    m2xb = jnp.sum(dxb * dxb, axis=0)
    m2yb = jnp.sum(dyb * dyb, axis=0)
    cxyb = jnp.sum(dxb * dyb, axis=0)

    n_new = state.n + nb
    safe_n_new = jnp.maximum(n_new, 1.0)
    delta_x = mean_xb - state.mean_x
    delta_y = mean_yb - state.mean_y
    corr = state.n * nb / safe_n_new

    merged = PearsonState(
        n=n_new,
        mean_x=state.mean_x + delta_x * nb / safe_n_new,
        mean_y=state.mean_y + delta_y * nb / safe_n_new,
        m2x=state.m2x + m2xb + delta_x * delta_x * corr,
        m2y=state.m2y + m2yb + delta_y * delta_y * corr,
        cxy=state.cxy + cxyb + delta_x * delta_y * corr,
    )
    # Empty batch (all rows masked) leaves the state unchanged.
    return jax.tree.map(
        lambda new, old: jnp.where(nb > 0, new, old),
        merged,
        state,
    )


def pearson_compute(state: PearsonState, eps: float = 1e-12) -> jnp.ndarray:
    """Per-ROI correlation r (P,)."""
    denom = jnp.sqrt(jnp.maximum(state.m2x * state.m2y, eps))
    return state.cxy / denom


def roi_metric_names(num_target: int) -> list[str]:
    """``val_corr_ROI_%06d`` names (utils.py:108-109)."""
    return [f"val_corr_ROI_{i:06d}" for i in range(num_target)]


class CSVMetricsLogger:
    """Lightning-CSVLogger-compatible metrics.csv writer.

    Appends rows; the file is only rewritten when a new column appears
    (typically once, at the first validation epoch), so logging stays O(row)
    even with the 1002 per-ROI columns.
    """

    def __init__(self, save_dir: str | Path, name: str, version: int | None = None):
        base = Path(save_dir) / name
        if version is None:
            version = 0
            while (base / f"version_{version}").exists():
                version += 1
        self.log_dir = base / f"version_{version}"
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.path = self.log_dir / "metrics.csv"
        self._rows: list[dict[str, Any]] = []
        self._columns: list[str] = []
        self._rows_flushed = 0

    def log_metrics(self, metrics: Mapping[str, Any], step: int, epoch: int) -> None:
        row = {"epoch": epoch, "step": step}
        for k, v in metrics.items():
            if isinstance(v, (jnp.ndarray, np.ndarray)):
                v = np.asarray(v).item()
            row[k] = v
        new_cols = [k for k in row if k not in self._columns]
        self._columns.extend(new_cols)
        self._rows.append(row)
        self._flush(rewrite=bool(new_cols) and self._rows_flushed > 0)

    def _flush(self, rewrite: bool) -> None:
        if rewrite or not self.path.exists():
            with open(self.path, "w", newline="") as f:
                writer = csv.DictWriter(f, fieldnames=self._columns)
                writer.writeheader()
                writer.writerows(self._rows)
        else:
            with open(self.path, "a", newline="") as f:
                writer = csv.DictWriter(f, fieldnames=self._columns)
                if self._rows_flushed == 0:
                    writer.writeheader()
                writer.writerows(self._rows[self._rows_flushed :])
        self._rows_flushed = len(self._rows)

    def log_hyperparams(self, params: Mapping[str, Any]) -> None:
        import yaml

        with open(self.log_dir / "hparams.yaml", "a") as f:
            yaml.safe_dump(dict(params), f)
