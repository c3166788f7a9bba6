"""Four-stage end-to-end pipeline through the CLI layer (tiny preset).

synthetic features + BOLD -> vlb-build-lazyload -> vlb-train (1 epoch, tiny
model, 8-device CPU mesh) -> vlb-brainmaps. Exercises the config system, the
builder assembly, sharded training, the metrics.csv contract, and the atlas
projection as one pipeline — the reference's full workflow (SURVEY.md §0).
"""

import glob

import numpy as np
import pytest

from phantom_vlb_tpu.data.synthetic import (
    TEST_GEOMETRY,
    write_synthetic_bold_file,
    write_synthetic_features_file,
)
from phantom_vlb_tpu.postprocessing.nifti import NiftiImage, save_nifti


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory, cpu_devices):
    root = tmp_path_factory.mktemp("e2e")
    eps = {"s01e01a": 9, "s01e01b": 8, "s01e02a": 8}
    write_synthetic_features_file(root / "features_s1.h5", eps, TEST_GEOMETRY, seed=0)
    write_synthetic_bold_file(root / "bold.h5", eps, TEST_GEOMETRY, seed=1)
    (root / "lazy").mkdir()
    return root


def test_stage2_cli(pipeline_dir):
    from phantom_vlb_tpu.cli.build_lazyload import main

    rc = main([
        "--features_path", str(pipeline_dir / "features_s1.h5"),
        "--timeseries_path", str(pipeline_dir / "bold.h5"),
        "--lazyload_path", str(pipeline_dir / "lazy"),
        "--subject", "sub-01",
        "--season", "s1",
        "--n_split", "2",
        "--window", str(TEST_GEOMETRY.window),
        "--delay", str(TEST_GEOMETRY.delay),
    ])
    assert rc == 0
    files = sorted(glob.glob(str(pipeline_dir / "lazy" / "*.h5")))
    assert len(files) == 2


def test_stage3_train_cli(pipeline_dir):
    from phantom_vlb_tpu.cli.train import main

    if not glob.glob(str(pipeline_dir / "lazy" / "*.h5")):
        test_stage2_cli(pipeline_dir)  # standalone-run support
    pattern = str(pipeline_dir / "lazy" / "friends_llFile_sub-01_s*_n*.h5")
    rc = main([
        "experiment=vlb_friends_lora",
        "subject=sub-01",
        f"datamodule.lazyload_path={pattern}",
        "datamodule.seasons=[s1]",
        "datamodule.batch_size=4",
        "datamodule.num_workers=2",
        "model.preset=tiny",
        "model.lora_r=4",
        "model.lora_alpha=8",
        "model.lora_dropout=0.0",
        "trainer.max_epochs=1",
        "trainer.val_check_interval=0.5",
        "trainer.log_every_n_steps=2",
        "optim.t_max=100",
        f"output_dir={pipeline_dir / 'results'}",
        "run_name=e2e",
        "mesh.fsdp=4",
        "mesh.tensor=2",
        # Exercise the vision-token-cache wiring (builder.py) end to end.
        f"datamodule.vision_token_cache={pipeline_dir / 'tok_cache'}",
    ])
    assert rc == 0
    csvs = glob.glob(str(pipeline_dir / "results" / "e2e" / "*" / "metrics.csv"))
    assert csvs, "metrics.csv not written"
    import pandas as pd

    df = pd.read_csv(csvs[0])
    assert df["val/brain_loss"].notna().sum() >= 1
    roi_cols = [c for c in df.columns if "ROI" in c]
    assert len(roi_cols) == TEST_GEOMETRY.num_parcels
    # Checkpoints: best + last.
    assert (pipeline_dir / "results" / "last").exists()


def test_stage4_brainmaps_cli(pipeline_dir):
    from phantom_vlb_tpu.cli.brainmaps import main

    if not glob.glob(str(pipeline_dir / "results" / "e2e" / "*" / "metrics.csv")):
        test_stage3_train_cli(pipeline_dir)  # standalone-run support
    n = TEST_GEOMETRY.num_parcels
    atlas = np.zeros((6, 6, 4), np.int32)
    for i in range(n):
        atlas[i % 6, (i * 2) % 6, i % 4] = i + 1
    save_nifti(NiftiImage(atlas, np.eye(4)), pipeline_dir / "atlas.nii.gz")

    csvs = glob.glob(str(pipeline_dir / "results" / "e2e" / "*" / "metrics.csv"))
    metrics_dir = csvs[0].rsplit("/", 1)[0]
    rc = main([
        "--metrics_path", metrics_dir,
        "--atlas_path", str(pipeline_dir / "atlas.nii.gz"),
        "--out_path", str(pipeline_dir / "map"),
    ])
    assert rc == 0
    assert glob.glob(str(pipeline_dir / "map_val-*.html"))


def test_stage5_predict_cli(pipeline_dir):
    """vlb-predict: restore 'last', sweep val split, export predictions."""
    import h5py

    from phantom_vlb_tpu.cli.predict import main

    if not (pipeline_dir / "results" / "last").exists():
        test_stage3_train_cli(pipeline_dir)  # standalone-run support
    pattern = str(pipeline_dir / "lazy" / "friends_llFile_sub-01_s*_n*.h5")
    out = pipeline_dir / "preds.h5"
    rc = main([
        "experiment=vlb_friends_lora",
        "subject=sub-01",
        f"datamodule.lazyload_path={pattern}",
        "datamodule.seasons=[s1]",
        "datamodule.batch_size=4",
        "datamodule.num_workers=2",
        "model.preset=tiny",
        "model.lora_r=4",
        "model.lora_alpha=8",
        "model.lora_dropout=0.0",
        f"output_dir={pipeline_dir / 'results'}",
        "run_name=e2e_pred",
        "mesh.fsdp=4",
        "mesh.tensor=2",
        f"predict.checkpoint={pipeline_dir / 'results' / 'last'}",
        f"predict.out={out}",
    ])
    assert rc == 0
    with h5py.File(out) as f:
        assert f["predicted"].shape == f["actual"].shape
        assert f["predicted"].shape[1] == TEST_GEOMETRY.num_parcels
        assert f["val_corr_roi"].shape == (TEST_GEOMETRY.num_parcels,)


def test_cached_baseline_training(pipeline_dir):
    """model.cache_features=true: precompute-once + head-only training."""
    from phantom_vlb_tpu.cli.train import main

    if not glob.glob(str(pipeline_dir / "lazy" / "*.h5")):
        test_stage2_cli(pipeline_dir)  # standalone-run support
    pattern = str(pipeline_dir / "lazy" / "friends_llFile_sub-01_s*_n*.h5")
    rc = main([
        "experiment=vlb_friends_baseline",
        "subject=sub-01",
        f"datamodule.lazyload_path={pattern}",
        "datamodule.seasons=[s1]",
        "datamodule.batch_size=4",
        "model.preset=tiny",
        "model.cache_features=true",
        "trainer.max_epochs=2",
        "trainer.val_check_interval=0.5",
        "trainer.log_every_n_steps=2",
        "optim.t_max=100",
        f"output_dir={pipeline_dir / 'results_cached'}",
        "run_name=cached",
    ])
    assert rc == 0
    assert (pipeline_dir / "results_cached" / "feature_cache_train.h5").exists()
    assert (pipeline_dir / "results_cached" / "feature_cache_val.h5").exists()
    import glob as globlib
    import pandas as pd

    csvs = globlib.glob(
        str(pipeline_dir / "results_cached" / "cached" / "*" / "metrics.csv")
    )
    df = pd.read_csv(csvs[0])
    assert df["val/brain_loss"].notna().sum() >= 2
