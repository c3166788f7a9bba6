"""Training loop: epochs, fractional val cadence, checkpointing, logging.

Reference orchestration (train.py + trainer yaml block): 10 epochs, validation
5x per epoch (``val_check_interval: 0.2``), ``log_every_n_steps: 15``, best +
last checkpoints on ``val/brain_loss``, per-ROI Pearson logged each val epoch.

TPU structure: the loop is thin host code; each step is one jitted program.
Batches are ``jax.device_put`` with the mesh batch sharding while the previous
step executes (double buffering); metrics transfer only scalar values.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Any, Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from phantom_vlb_tpu.core.mesh import MeshEnv
from phantom_vlb_tpu.train.checkpoint import CheckpointManager
from phantom_vlb_tpu.train.metrics import (
    CSVMetricsLogger,
    pearson_compute,
    pearson_init,
    roi_metric_names,
)
from phantom_vlb_tpu.train.optim import OptimConfig, make_optimizer, make_schedule
from phantom_vlb_tpu.train.step import (
    TrainState,
    init_train_state,
    make_eval_step,
    make_train_step,
)

__all__ = ["TrainLoopConfig", "VLBTrainer"]


@dataclasses.dataclass
class TrainLoopConfig:
    max_epochs: int = 10
    val_check_interval: float = 0.2
    log_every_n_steps: int = 15
    seed: int = 1234
    output_dir: str = "./results"
    run_name: str = "vlb"
    num_target: int = 1000
    checkpoint: bool = True
    # Failure detection (SURVEY.md §5.3: absent in the reference): abort
    # after this many consecutive non-finite losses (0 disables).  The
    # streak is accumulated on-device EVERY step (no host sync) and checked
    # at log cadence; non-finite updates are additionally never applied to
    # the model state (train/step.py), so checkpoints cannot be poisoned.
    nan_abort_after: int = 3
    # Early stopping on val/brain_loss (mode=min, same monitor as the
    # reference's ModelCheckpoint, train.py:21-27).  The reference has no
    # early stopping — it always runs the full 10 epochs — so this is OFF
    # by default (patience=0) for parity; enabling it stops after
    # ``early_stop_patience`` consecutive validations without an improvement
    # of more than ``early_stop_min_delta``.  Validations keep the
    # reference's cadence (val_check_interval fraction of an epoch), so
    # patience counts fifths-of-epochs under the default config.
    early_stop_patience: int = 0
    early_stop_min_delta: float = 0.0


class VLBTrainer:
    """Drives (train_loader, val_loader) through jitted steps."""

    def __init__(
        self,
        forward_fn,
        params: Any,
        optim_config: OptimConfig,
        loop_config: TrainLoopConfig,
        trainable_label_tree=None,
        mesh_env: MeshEnv | None = None,
        csv_logger: CSVMetricsLogger | None = None,
        extra_loggers: Iterable = (),
    ):
        self.config = loop_config
        self.mesh_env = mesh_env
        self.forward_fn = forward_fn
        self.tx = make_optimizer(optim_config)
        self._schedule = make_schedule(optim_config)
        self.labels = trainable_label_tree
        self.state, self.frozen = init_train_state(params, self.tx, self.labels)
        self.train_step = make_train_step(forward_fn, self.tx, self.labels)
        self.eval_step = make_eval_step(forward_fn)
        self.csv_logger = csv_logger or CSVMetricsLogger(
            loop_config.output_dir, loop_config.run_name
        )
        self.extra_loggers = list(extra_loggers)
        self.ckpt = (
            CheckpointManager(loop_config.output_dir) if loop_config.checkpoint else None
        )
        # 'rbg' keys: the per-step dropout masks (224 x 50M elements at the
        # production geometry) cost ~1.3 s/step under threefry on v5e vs
        # ~0.5 s under the hardware RBG (scripts/perf_probe.py, round 2).
        # RBG is a counter-based PRNG — runs remain reproducible for a given
        # seed; only the stream differs from threefry (BENCHMARKS.md).
        self._rng = jax.random.key(loop_config.seed, impl="rbg")
        # Device-side consecutive-non-finite-loss counter, updated every step
        # without a host transfer (ADVICE.md round 1: checking only on log
        # steps let up to nan_abort_after*log_every_n_steps bad updates
        # through).
        self._nan_streak = jnp.zeros((), jnp.int32)
        self._bump_streak = jax.jit(
            lambda streak, loss: jnp.where(jnp.isfinite(loss), 0, streak + 1)
        )
        self.global_step = 0
        self.epoch = 0
        self.last_val_metrics: dict[str, float] = {}
        self._es_best = float("inf")
        self._es_strikes = 0
        self.stopped_early = False

    # ------------------------------------------------------------------
    def _next_rng(self) -> jax.Array:
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _put(self, batch) -> Mapping[str, jnp.ndarray]:
        arrays = batch.as_dict() if hasattr(batch, "as_dict") else dict(batch)
        if self.mesh_env is None:
            return {k: jnp.asarray(v) for k, v in arrays.items()}
        out = {}
        for k, v in arrays.items():
            spec = self.mesh_env.batch() if np.ndim(v) >= 1 else self.mesh_env.replicated()
            out[k] = jax.device_put(v, spec)
        return out

    def _log(self, metrics: Mapping[str, Any]) -> None:
        self.csv_logger.log_metrics(metrics, self.global_step, self.epoch)
        for logger in self.extra_loggers:
            logger.log_metrics(metrics, self.global_step, self.epoch)

    # ------------------------------------------------------------------
    def maybe_resume(self, name: str = "last") -> bool:
        """Resume from a saved state if present (reference has no train-time
        resume at all, SURVEY.md §5.3; here a killed run restarts where it
        left off, the analog of extraction's episode-level resume)."""
        if self.ckpt is None:
            return False
        path = self.ckpt.directory / name
        if not path.exists():
            return False
        self.state = self.ckpt.restore(name, self.state)
        self.global_step = int(self.state.step)
        # Host-side trainer state (early-stop window, best-so-far) survives
        # preemption too — otherwise a resumed run resets its patience window
        # and can train past where an uninterrupted run would have stopped,
        # and re-saves a worse 'best' checkpoint (ADVICE round 3).
        meta = self.ckpt.load_metadata()
        self._es_best = float(meta.get("es_best", self._es_best))
        self._es_strikes = int(meta.get("es_strikes", self._es_strikes))
        self.ckpt.best_metric = float(meta.get("best_metric", self.ckpt.best_metric))
        best_path = meta.get("best_path")
        if best_path and Path(best_path).exists():
            self.ckpt.best_path = Path(best_path)
        return True

    # ------------------------------------------------------------------
    def full_params(self):
        """Zero-copy view of trainable + frozen params."""
        from phantom_vlb_tpu.train.step import combine_params

        if self.frozen is None:
            return self.state.params
        return combine_params(self.state.params, self.frozen)

    def validate(self, val_loader) -> dict[str, float]:
        pearson = pearson_init(self.config.num_target)
        params = self.full_params()
        total_loss, total_n = 0.0, 0.0
        for batch in val_loader:
            dev_batch = self._put(batch)
            pearson, metrics = self.eval_step(
                params, dev_batch, pearson, self._next_rng()
            )
            n = float(metrics["n"])
            total_loss += float(metrics["brain_loss"]) * n
            total_n += n
        corr = np.asarray(pearson_compute(pearson))
        val_loss = total_loss / max(total_n, 1.0)

        row: dict[str, float] = {"val/brain_loss": val_loss}
        for name, value in zip(roi_metric_names(self.config.num_target), corr):
            row[name] = float(value)
        row["val_corr_avg"] = float(np.nanmean(corr))
        self._log(row)
        self.last_val_metrics = row
        if self.ckpt is not None:
            self.ckpt.save_on_validation(
                self.state, val_loss, self.epoch, self.global_step
            )
        self._early_stop_update(val_loss)
        if self.ckpt is not None:
            self.ckpt.save_metadata({
                "es_best": self._es_best,
                "es_strikes": self._es_strikes,
                "best_metric": self.ckpt.best_metric,
                "best_path": str(self.ckpt.best_path or ""),
                "epoch": self.epoch,
                "global_step": self.global_step,
            })
        return row

    def _early_stop_update(self, val_loss: float) -> None:
        if not self.config.early_stop_patience:
            return
        if val_loss < self._es_best - self.config.early_stop_min_delta:
            self._es_best = val_loss
            self._es_strikes = 0
        else:
            self._es_strikes += 1
            if self._es_strikes >= self.config.early_stop_patience:
                self.stopped_early = True

    def fit(self, train_loader, val_loader) -> dict[str, float]:
        cfg = self.config
        # After maybe_resume(), completed epochs are skipped.
        start_epoch = 0
        if self.global_step and len(train_loader):
            start_epoch = min(
                self.global_step // max(1, len(train_loader)), cfg.max_epochs
            )
        for self.epoch in range(start_epoch, cfg.max_epochs):
            n_batches = len(train_loader)
            val_every = (
                max(1, int(n_batches * cfg.val_check_interval))
                if cfg.val_check_interval
                else 0
            )
            window_t0, window_steps = time.perf_counter(), 0
            for i, batch in enumerate(train_loader):
                dev_batch = self._put(batch)
                self.state, metrics = self.train_step(
                    self.state, self.frozen, dev_batch, self._next_rng()
                )
                if cfg.nan_abort_after:
                    # Tiny on-device op; counts EVERY step, synced at log time.
                    self._nan_streak = self._bump_streak(
                        self._nan_streak, metrics["brain_loss"]
                    )
                self.global_step += 1
                window_steps += 1
                if self.global_step % cfg.log_every_n_steps == 0:
                    loss = float(metrics["brain_loss"])  # host sync
                    now = time.perf_counter()
                    sps = window_steps / max(now - window_t0, 1e-9)
                    window_t0, window_steps = now, 0
                    self._log({
                        "train/brain_loss": loss,
                        "train/steps_per_sec": sps,
                        # LR column, as the reference's LearningRateMonitor
                        # (train.py:28; Lightning names it 'lr-AdamW').
                        "lr-AdamW": float(self._schedule(self.global_step)),
                    })
                    if cfg.nan_abort_after:
                        streak = int(self._nan_streak)
                        if streak >= cfg.nan_abort_after:
                            raise FloatingPointError(
                                f"train/brain_loss non-finite for {streak} "
                                f"consecutive steps at step "
                                f"{self.global_step}; aborting (model state "
                                "was not updated by the non-finite steps; "
                                "last good checkpoint: "
                                f"{self.ckpt.best_path if self.ckpt else None})"
                            )
                if val_every and (i + 1) % val_every == 0 and (i + 1) < n_batches:
                    self.validate(val_loader)
                    if self.stopped_early:
                        break
            if not self.stopped_early:
                self.validate(val_loader)
            if self.stopped_early:
                self._log({"early_stopped_epoch": float(self.epoch)})
                break
        if self.ckpt is not None:
            self.ckpt.save_last(self.state)
            self._export_adapters_if_any()
        return self.last_val_metrics

    def _export_adapters_if_any(self) -> None:
        """Adapter-only checkpoint (head + LoRA) — the reference's TODO at
        train.py:60, implemented: a few MB instead of the 14 GB full state."""
        from phantom_vlb_tpu.train.checkpoint import export_adapters

        def keep(path: str) -> bool:
            return (
                path.startswith("head")
                or "lora_a" in path
                or "lora_b" in path
            )

        try:
            export_adapters(
                self.full_params(),
                Path(self.config.output_dir) / "adapters",
                keep,
            )
        except ValueError:
            pass  # no adapters/head selected (non-standard model)
