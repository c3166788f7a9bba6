"""Grain-backed loader: same samples as the native loader."""

import numpy as np
import pytest

pytest.importorskip("grain")

from phantom_vlb_tpu.data.grain_loader import make_grain_loader
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
