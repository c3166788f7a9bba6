"""Head-only end-to-end slice (build plan step 2, SURVEY.md §7).

Trains just the brain readout head (LN -> HRF pool -> LN -> ridge) on
synthetic hidden states with a known linear ground truth, through the full
train loop: jitted steps, streaming Pearson, CSV metrics, checkpoints.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phantom_vlb_tpu.models.heads import BrainReadoutHead
from phantom_vlb_tpu.train.loop import TrainLoopConfig, VLBTrainer
from phantom_vlb_tpu.train.metrics import (
    pearson_compute,
    pearson_init,
    pearson_update,
)
from phantom_vlb_tpu.train.optim import OptimConfig

HIDDEN, SEQ, PARCELS, BATCH = 32, 24, 8, 16


class _SliceData:
    """Synthetic (hidden_states, weights) batches with linear ground truth."""

    def __init__(self, n_batches, seed, w_seed=42):
        rng = np.random.default_rng(seed)
        # Ground-truth readout is shared between train and val splits.
        self.w_true = (
            np.random.default_rng(w_seed).standard_normal((HIDDEN, PARCELS)).astype(np.float32) * 0.3
        )
        self.batches = []
        for _ in range(n_batches):
            h = rng.standard_normal((BATCH, SEQ, HIDDEN)).astype(np.float32)
            w = rng.uniform(0, 0.3, (BATCH, SEQ)).astype(np.float32)
            pooled = np.einsum("bse,bs->be", h, w)
            y = pooled @ self.w_true + 0.01 * rng.standard_normal((BATCH, PARCELS)).astype(np.float32)
            self.batches.append(
                {
                    "hidden": h,
                    "weights": w,
                    "timeseries": y,
                    "row_mask": np.ones(BATCH, np.float32),
                }
            )

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    out = tmp_path_factory.mktemp("run")
    head = BrainReadoutHead(hidden_size=HIDDEN, num_target=PARCELS,
                            l2_lambda=1e-4, dropout_rate=0.0)
    params = head.init(
        jax.random.key(0),
        jnp.zeros((1, SEQ, HIDDEN)),
        jnp.zeros((1, SEQ)),
    )["params"]

    def forward_fn(params, batch, rng, train):
        return head.apply(
            {"params": params},
            batch["hidden"],
            batch["weights"],
            deterministic=not train,
            rngs={"dropout": rng} if train else {},
        )

    trainer = VLBTrainer(
        forward_fn,
        params,
        OptimConfig(lr=1e-2, t_max=2000),
        TrainLoopConfig(
            max_epochs=4,
            val_check_interval=0.5,
            log_every_n_steps=5,
            output_dir=str(out),
            run_name="slice",
            num_target=PARCELS,
        ),
    )
    train_data = _SliceData(25, seed=0)
    val_data = _SliceData(4, seed=99)
    final = trainer.fit(train_data, val_data)
    return trainer, final, out


def test_slice_learns(trained):
    _, final, _ = trained
    assert final["val_corr_avg"] > 0.9
    assert final["val/brain_loss"] < 1.0


def test_csv_contract(trained):
    """make_acc_brainmaps's expectations over metrics.csv (SURVEY.md §5.5)."""
    import pandas as pd

    trainer, _, out = trained
    df = pd.read_csv(trainer.csv_logger.path)
    assert "val/brain_loss" in df.columns
    val_rows = df[df["val/brain_loss"].notna()]
    assert len(val_rows) >= 4  # >= 2 per epoch at interval 0.5... at least epochs
    roi_cols = sorted([c for c in df.columns if "ROI" in c])
    assert roi_cols == [f"val_corr_ROI_{i:06d}" for i in range(PARCELS)]
    assert "val_corr_avg" in df.columns
    assert "train/brain_loss" in df.columns
    # Train rows never carry val metrics.
    train_rows = df[df["train/brain_loss"].notna()]
    assert train_rows["val/brain_loss"].isna().all()


def test_checkpoints_written(trained):
    trainer, _, out = trained
    assert (out / "last").exists()
    assert trainer.ckpt.best_path is not None and trainer.ckpt.best_path.exists()
    restored = trainer.ckpt.restore("last", trainer.state)
    chex = np.asarray(jax.tree.leaves(restored.params)[0])
    np.testing.assert_array_equal(
        chex, np.asarray(jax.tree.leaves(trainer.state.params)[0])
    )


def test_streaming_pearson_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((40, PARCELS)).astype(np.float32)
    y = 0.5 * x + rng.standard_normal((40, PARCELS)).astype(np.float32)
    state = pearson_init(PARCELS)
    for i in range(0, 40, 8):
        state = pearson_update(state, jnp.asarray(x[i : i + 8]), jnp.asarray(y[i : i + 8]))
    ours = np.asarray(pearson_compute(state))
    expected = np.array(
        [np.corrcoef(x[:, j], y[:, j])[0, 1] for j in range(PARCELS)]
    )
    np.testing.assert_allclose(ours, expected, atol=1e-4)


def test_streaming_pearson_masked_rows():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((10, PARCELS)).astype(np.float32)
    y = rng.standard_normal((10, PARCELS)).astype(np.float32)
    state = pearson_init(PARCELS)
    # Feed 10 valid rows + 6 masked garbage rows.
    state = pearson_update(state, jnp.asarray(x[:6]), jnp.asarray(y[:6]))
    pad_x = np.concatenate([x[6:], np.full((6, PARCELS), 1e6, np.float32)])
    pad_y = np.concatenate([y[6:], np.full((6, PARCELS), -1e6, np.float32)])
    mask = np.concatenate([np.ones(4, np.float32), np.zeros(6, np.float32)])
    state = pearson_update(state, jnp.asarray(pad_x), jnp.asarray(pad_y), jnp.asarray(mask))
    ours = np.asarray(pearson_compute(state))
    expected = np.array(
        [np.corrcoef(x[:, j], y[:, j])[0, 1] for j in range(PARCELS)]
    )
    np.testing.assert_allclose(ours, expected, atol=1e-4)
