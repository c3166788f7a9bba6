"""vlb-predict — run a trained model over lazy-load data and export predictions.

The reference only ever evaluates inside the Lightning val loop; there is no
standalone inference path (SURVEY.md §1 "absent layers").  This CLI closes
that gap: it restores a checkpoint, sweeps the train or val split, and writes
an HDF5 of predicted + actual BOLD per sample plus per-ROI Pearson r — the
same quantities the brain-map stage consumes.

    vlb-predict experiment=vlb_friends_lora subject=sub-01 \
        predict.checkpoint=results/.../last predict.out=preds_sub-01.h5
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from phantom_vlb_tpu.cli.train import DEFAULT_CONFIG_PATH
from phantom_vlb_tpu.core.config import load_config


def run_predict(config) -> dict:
    import h5py
    import jax

    from phantom_vlb_tpu.train.builder import build_trainer
    from phantom_vlb_tpu.train.metrics import (
        pearson_compute,
        pearson_init,
        pearson_update,
    )

    trainer, train_loader, val_loader = build_trainer(config)
    pcfg = config.get("predict", {})
    ckpt = pcfg.get("checkpoint")
    if ckpt:
        trainer.state = trainer.ckpt.restore_path(ckpt, trainer.state)
    loader = val_loader if pcfg.get("split", "val") == "val" else train_loader
    params = trainer.full_params()

    forward = jax.jit(
        lambda p, b: trainer.forward_fn(p, b, jax.random.key(0), False)[0]
    )

    pearson = pearson_init(trainer.config.num_target)
    preds_all, actual_all = [], []
    for batch in loader:
        dev = trainer._put(batch)
        pred = forward(params, dev)
        pearson = pearson_update(
            pearson, pred, dev["timeseries"], dev["row_mask"]
        )
        mask = np.asarray(dev["row_mask"]) > 0
        preds_all.append(np.asarray(pred, np.float32)[mask])
        actual_all.append(np.asarray(dev["timeseries"], np.float32)[mask])

    preds = np.concatenate(preds_all)
    actual = np.concatenate(actual_all)
    corr = np.asarray(pearson_compute(pearson))

    out_path = str(pcfg.get("out", "predictions.h5"))
    with h5py.File(out_path, "w") as f:
        f.create_dataset("predicted", data=preds)
        f.create_dataset("actual", data=actual)
        f.create_dataset("val_corr_roi", data=corr)
    return {
        "out": out_path,
        "n_samples": int(preds.shape[0]),
        "corr_avg": float(np.nanmean(corr)),
    }


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-path", default=str(DEFAULT_CONFIG_PATH))
    parser.add_argument("--config-name", default="base")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    config = load_config(args.config_path, args.config_name, args.overrides)
    result = run_predict(config)
    print(
        f"wrote {result['out']}: {result['n_samples']} samples, "
        f"corr_avg={result['corr_avg']:.4f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
