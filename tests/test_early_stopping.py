"""Early stopping on val/brain_loss (patience over validations, mode=min).

The reference has no early stopping (grep over train.py/configs is empty;
it always runs max_epochs=10, baseline.yaml:49-50), but its val cadence
(val_check_interval) + ModelCheckpoint(monitor="val/brain_loss")
(train.py:21-27) make patience-based stopping a natural, contract-compatible
extension.  OFF by default (patience=0) for parity; these tests cover the
gated behavior.
"""

import numpy as np
import jax
import jax.numpy as jnp

from phantom_vlb_tpu.models.heads import BrainReadoutHead
from phantom_vlb_tpu.train.loop import TrainLoopConfig, VLBTrainer
from phantom_vlb_tpu.train.optim import OptimConfig

H, S, P, B = 16, 8, 4, 8


def _data(n, seed, learnable=True):
    rng = np.random.default_rng(seed)
    w = np.random.default_rng(7).standard_normal((H, P)).astype(np.float32)
    out = []
    for _ in range(n):
        x = rng.standard_normal((B, S, H)).astype(np.float32)
        m = rng.uniform(0, 1, (B, S)).astype(np.float32)
        if learnable:
            y = np.einsum("bse,bs->be", x, m) @ w
        else:  # pure noise: val loss cannot improve -> stop fires
            y = rng.standard_normal((B, P)).astype(np.float32) * 100.0
        out.append({"hidden": x, "weights": m, "timeseries": y,
                    "row_mask": np.ones(B, np.float32)})
    return out


def _make_trainer(out_dir, max_epochs, patience, lr=1e-3):
    head = BrainReadoutHead(hidden_size=H, num_target=P, dropout_rate=0.0)
    params = head.init(
        jax.random.key(0), jnp.zeros((1, S, H)), jnp.zeros((1, S))
    )["params"]

    def fwd(p, batch, rng, train):
        return head.apply({"params": p}, batch["hidden"], batch["weights"],
                          deterministic=True)

    return VLBTrainer(
        fwd, params, OptimConfig(lr=lr, t_max=500),
        TrainLoopConfig(max_epochs=max_epochs, val_check_interval=0.0,
                        log_every_n_steps=100, output_dir=str(out_dir),
                        run_name="r", num_target=P, checkpoint=False,
                        early_stop_patience=patience),
    )


def test_early_stop_fires_on_plateau(tmp_path):
    """Unlearnable noise at lr=0: val loss is flat, so patience=2 stops the
    run after 1 (best) + 2 (strikes) end-of-epoch validations."""
    train = _data(3, 0, learnable=False)
    val = _data(2, 1, learnable=False)
    t = _make_trainer(tmp_path, max_epochs=10, patience=2, lr=0.0)
    t.fit(train, val)
    assert t.stopped_early
    assert t.epoch == 2            # stopped during epoch index 2 (3rd epoch)
    assert t.global_step == 9      # 3 epochs x 3 batches, not 10 x 3


def test_early_stop_disabled_by_default(tmp_path):
    train = _data(3, 0, learnable=False)
    val = _data(2, 1, learnable=False)
    t = _make_trainer(tmp_path, max_epochs=4, patience=0, lr=0.0)
    t.fit(train, val)
    assert not t.stopped_early
    assert t.global_step == 12     # full 4 epochs ran


def test_early_stop_does_not_fire_while_improving(tmp_path):
    """A learnable task with a working lr keeps improving past patience=2."""
    train = _data(6, 0)
    val = _data(2, 1)
    t = _make_trainer(tmp_path, max_epochs=6, patience=2, lr=1e-2)
    t.fit(train, val)
    assert not t.stopped_early
    assert t.global_step == 36


def test_early_stop_state_survives_resume(tmp_path):
    """Preempt-and-resume must not reset the patience window: a resumed run
    picks up es_best/es_strikes (and the best-checkpoint metric) from the
    trainer_state.json sidecar, so it stops where an uninterrupted run would
    (ADVICE round 3)."""
    train = _data(3, 0, learnable=False)
    val = _data(2, 1, learnable=False)

    def make():
        head = BrainReadoutHead(hidden_size=H, num_target=P, dropout_rate=0.0)
        params = head.init(
            jax.random.key(0), jnp.zeros((1, S, H)), jnp.zeros((1, S))
        )["params"]

        def fwd(p, batch, rng, train):
            return head.apply({"params": p}, batch["hidden"],
                              batch["weights"], deterministic=True)

        return VLBTrainer(
            fwd, params, OptimConfig(lr=0.0, t_max=500),
            TrainLoopConfig(max_epochs=1, val_check_interval=0.0,
                            log_every_n_steps=100,
                            output_dir=str(tmp_path / "ck"),
                            run_name="r", num_target=P, checkpoint=True,
                            early_stop_patience=3),
        )

    t1 = make()
    t1.fit(train, val)  # 1 epoch: 1 validation -> es_best set, 0 strikes
    t1.validate(val)    # 2nd validation: strike 1 (flat loss)
    assert t1._es_strikes == 1
    saved_best = t1._es_best

    t2 = make()
    assert t2._es_strikes == 0  # fresh trainer...
    assert t2.maybe_resume()
    assert t2._es_strikes == 1              # ...resumed patience window
    assert t2._es_best == saved_best
    assert t2.ckpt.best_metric == t1.ckpt.best_metric
    # Two more flat validations exhaust patience=3 without a reset.
    t2.validate(val)
    t2.validate(val)
    assert t2.stopped_early


def test_early_stop_mid_epoch_validations_count(tmp_path):
    """val_check_interval > 0: mid-epoch validations advance the patience
    counter, so the stop can fire inside an epoch."""
    train = _data(6, 0, learnable=False)
    val = _data(2, 1, learnable=False)
    head_cfg = _make_trainer(tmp_path, max_epochs=10, patience=2, lr=0.0)
    head_cfg.config = type(head_cfg.config)(
        **{**head_cfg.config.__dict__, "val_check_interval": 0.5}
    )
    head_cfg.fit(train, val)
    assert head_cfg.stopped_early
    # validations at steps 3 (best), 6 (strike 1), 9 (strike 2 -> stop):
    # stops inside epoch 1 after its mid-epoch validation.
    assert head_cfg.global_step == 9
