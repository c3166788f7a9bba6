"""Checkpoint/resume: a killed run restarts from 'last' and continues."""

import numpy as np
import jax
import jax.numpy as jnp

from phantom_vlb_tpu.models.heads import BrainReadoutHead
from phantom_vlb_tpu.train.loop import TrainLoopConfig, VLBTrainer
from phantom_vlb_tpu.train.optim import OptimConfig

H, S, P, B = 16, 8, 4, 8


def _data(n, seed):
    rng = np.random.default_rng(seed)
    w = np.random.default_rng(7).standard_normal((H, P)).astype(np.float32)
    out = []
    for _ in range(n):
        x = rng.standard_normal((B, S, H)).astype(np.float32)
        m = rng.uniform(0, 1, (B, S)).astype(np.float32)
        y = np.einsum("bse,bs->be", x, m) @ w
        out.append({"hidden": x, "weights": m, "timeseries": y,
                    "row_mask": np.ones(B, np.float32)})
    return out


def _make_trainer(out_dir, max_epochs):
    head = BrainReadoutHead(hidden_size=H, num_target=P, dropout_rate=0.0)
    params = head.init(jax.random.key(0), jnp.zeros((1, S, H)), jnp.zeros((1, S)))["params"]

    def fwd(p, batch, rng, train):
        return head.apply({"params": p}, batch["hidden"], batch["weights"],
                          deterministic=True)

    return VLBTrainer(
        fwd, params, OptimConfig(lr=1e-3, t_max=500),
        TrainLoopConfig(max_epochs=max_epochs, val_check_interval=0.0,
                        log_every_n_steps=100, output_dir=str(out_dir),
                        run_name="r", num_target=P),
    )


def test_resume_continues(tmp_path):
    train, val = _data(5, 0), _data(2, 1)

    # Run 1: 2 epochs, saves 'last'.
    t1 = _make_trainer(tmp_path, max_epochs=2)
    t1.fit(train, val)
    assert t1.global_step == 10

    # Run 2: fresh trainer, resume, continue to 4 epochs.
    t2 = _make_trainer(tmp_path, max_epochs=4)
    assert t2.maybe_resume()
    assert t2.global_step == 10
    # Params identical to run 1's final params.
    a = jax.tree.leaves(t1.state.params)[0]
    b = jax.tree.leaves(t2.state.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    t2.fit(train, val)
    assert t2.global_step == 20  # only epochs 2..3 ran


def test_no_resume_when_absent(tmp_path):
    t = _make_trainer(tmp_path / "fresh", max_epochs=1)
    assert not t.maybe_resume()


def test_seeded_runs_are_identical(tmp_path):
    """Same seed => bit-identical loss trajectory (L.seed_everything parity)."""
    train, val = _data(4, 0), _data(2, 1)

    def run(out):
        t = _make_trainer(out, max_epochs=2)
        t.fit(train, val)
        import pandas as pd

        return pd.read_csv(t.csv_logger.path)

    df1 = run(tmp_path / "a")
    df2 = run(tmp_path / "b")
    c1 = df1["val/brain_loss"].dropna().to_numpy()
    c2 = df2["val/brain_loss"].dropna().to_numpy()
    np.testing.assert_array_equal(c1, c2)
