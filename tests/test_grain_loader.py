"""Grain-backed loader: same samples as the native loader."""

import numpy as np
import pytest

pytest.importorskip("grain")

from phantom_vlb_tpu.data.grain_loader import GrainBatchLoader, make_grain_loader
from phantom_vlb_tpu.data.lazyload_build import LazyloadBuildConfig, build_lazyload_dsets
from phantom_vlb_tpu.data.loader import BatchLoader, LazyDataset
from phantom_vlb_tpu.data.synthetic import (
    TEST_GEOMETRY,
    write_synthetic_bold_file,
    write_synthetic_features_file,
)


@pytest.fixture(scope="module")
def lazy_paths(tmp_path_factory):
    root = tmp_path_factory.mktemp("grain")
    eps = {"s01e01a": 9, "s01e01b": 8}
    write_synthetic_features_file(root / "f.h5", eps, TEST_GEOMETRY, seed=0)
    write_synthetic_bold_file(root / "b.h5", eps, TEST_GEOMETRY, seed=1)
    (root / "lz").mkdir()
    return build_lazyload_dsets(
        LazyloadBuildConfig(
            str(root / "f.h5"), str(root / "b.h5"), str(root / "lz"),
            "sub-01", "s1", 1, TEST_GEOMETRY,
        )
    )


def test_grain_matches_native(lazy_paths):
    native = BatchLoader(LazyDataset(lazy_paths), batch_size=4, shuffle=False, prefetch=0)
    native_ts = np.concatenate(
        [b.timeseries[b.row_mask > 0] for b in native]
    )
    grain_loader = make_grain_loader(lazy_paths, batch_size=4, shuffle=False)
    grain_ts = np.concatenate([np.asarray(b["timeseries"]) for b in grain_loader])
    np.testing.assert_allclose(grain_ts, native_ts, atol=0)


def test_grain_shuffles_deterministically(lazy_paths):
    a = [np.asarray(b["timeseries"]).sum() for b in
         make_grain_loader(lazy_paths, batch_size=4, seed=7)]
    b = [np.asarray(x["timeseries"]).sum() for x in
         make_grain_loader(lazy_paths, batch_size=4, seed=7)]
    np.testing.assert_allclose(a, b)
    c = [np.asarray(x["timeseries"]).sum() for x in
         make_grain_loader(lazy_paths, batch_size=4, seed=8)]
    assert not np.allclose(a, c)


def test_grain_batch_loader_fixed_shapes(lazy_paths):
    """Trainer-facing wrapper: every batch padded to batch_size, len() works."""
    loader = GrainBatchLoader(lazy_paths, batch_size=4, shuffle=False)
    batches = list(loader)
    assert len(batches) == len(loader)
    n_valid = 0
    for b in batches:
        assert b["timeseries"].shape[0] == 4
        assert b["vision"].shape[0] == 4
        n_valid += int(b["row_mask"].sum())
    native = BatchLoader(LazyDataset(lazy_paths), batch_size=4, shuffle=False, prefetch=0)
    assert n_valid == sum(int(b.row_mask.sum()) for b in native)
    # Padded rows are fully zero (masked out by the loss).
    last = batches[-1]
    pad_rows = last["row_mask"] == 0
    if pad_rows.any():
        assert np.abs(last["timeseries"][pad_rows]).sum() == 0


def test_grain_loader_via_builder(lazy_paths, tmp_path):
    """datamodule.loader='grain' builds trainer-compatible loaders."""
    from phantom_vlb_tpu.core.config import Config
    from phantom_vlb_tpu.train.builder import build_loaders

    # Two split files so split_train_val leaves one for training.
    (tmp_path / "lz2").mkdir()
    root = lazy_paths[0].rsplit("/", 2)[0]
    paths2 = build_lazyload_dsets(
        LazyloadBuildConfig(
            f"{root}/f.h5", f"{root}/b.h5", str(tmp_path / "lz2"),
            "sub-01", "s1", 2, TEST_GEOMETRY,
        )
    )
    dm = Config({
        "lazyload_path": paths2[0].replace("_n0", "_n*"),
        "seasons": ["s1"],
        "random_state": 1234,
        "batch_size": 4,
        "loader": "grain",
        "num_workers": 0,
    })
    train_loader, val_loader, names = build_loaders(dm)
    assert isinstance(train_loader, GrainBatchLoader)
    first = next(iter(train_loader))
    assert set(first) >= {"timeseries", "vision", "language", "row_mask"}
    assert first["timeseries"].shape[0] == 4
