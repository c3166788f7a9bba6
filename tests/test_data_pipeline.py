"""Schema contracts, lazy-load builder alignment, and loader tests."""

import h5py
import numpy as np
import pytest

from phantom_vlb_tpu.core.geometry import REFERENCE_GEOMETRY, VLBGeometry
from phantom_vlb_tpu.data.hrf import get_hrf_weights
from phantom_vlb_tpu.data.lazyload_build import (
    LazyloadBuildConfig,
    build_lazyload_dsets,
    lazyload_filename,
)
from phantom_vlb_tpu.data.loader import (
    BatchLoader,
    LazyDataset,
    split_train_val,
)
from phantom_vlb_tpu.data.schemas import (
    bold_episode_keys,
    lazyload_len,
    read_lazy_sample,
    validate_features_file,
    validate_lazyload_file,
)
from phantom_vlb_tpu.data.synthetic import (
    TEST_GEOMETRY,
    write_synthetic_bold_file,
    write_synthetic_features_file,
)

EPISODES = {"s01e01a": 12, "s01e01b": 10, "s01e02a": 11, "s01e02b": 9}


@pytest.fixture(scope="module")
def stage_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("vlb")
    feat = root / "features_s1.h5"
    bold = root / "bold_sub-01.h5"
    write_synthetic_features_file(feat, EPISODES, TEST_GEOMETRY, seed=0)
    write_synthetic_bold_file(bold, EPISODES, TEST_GEOMETRY, seed=1)
    lazy_dir = root / "lazy"
    lazy_dir.mkdir()
    cfg = LazyloadBuildConfig(
        features_path=str(feat),
        timeseries_path=str(bold),
        lazyload_path=str(lazy_dir),
        subject="sub-01",
        season="s1",
        n_split=2,
        geometry=TEST_GEOMETRY,
    )
    paths = build_lazyload_dsets(cfg)
    return {"feat": feat, "bold": bold, "lazy": paths}


def test_reference_geometry_contract():
    g = REFERENCE_GEOMETRY
    assert (g.num_frames, g.num_ds_frames) == (12, 7)
    assert (g.patch_grid, g.ds_grid, g.tokens_per_frame) == (24, 13, 169)
    assert (g.num_vis_tokens, g.max_lang_tokens, g.feature_len) == (1183, 866, 2048)
    assert g.abs_tr_delay == 5.5
    np.testing.assert_allclose(
        g.vision_onset_deltas(), 1.49 * (5.5 - np.arange(0, 3.5, 0.5))
    )


def test_invalid_geometry_raises():
    with pytest.raises(AssertionError):
        VLBGeometry(model_max_length=10).validate()  # vis tokens exceed budget


def test_features_schema(stage_dirs):
    eps = validate_features_file(stage_dirs["feat"], TEST_GEOMETRY)
    assert eps == sorted(EPISODES)


def test_bold_key_parsing(stage_dirs):
    keys = bold_episode_keys(stage_dirs["bold"])
    assert set(keys) == set(EPISODES)
    ses, run = keys["s01e01a"]
    assert run.endswith("task-s01e01a")


def test_lazyload_build_counts(stage_dirs):
    g = TEST_GEOMETRY
    total = sum(lazyload_len(p) for p in stage_dirs["lazy"])
    # Per episode: min(n_tr - bold_offset, n_tr - window_offset) samples.
    expected = sum(n - g.bold_offset for n in EPISODES.values())
    assert total == expected
    assert len(stage_dirs["lazy"]) == 2
    assert lazyload_filename("sub-01", "s1", 0) in stage_dirs["lazy"][0]


def test_lazyload_schema_and_weights(stage_dirs):
    g = TEST_GEOMETRY
    validate_lazyload_file(stage_dirs["lazy"][0], g)
    with h5py.File(stage_dirs["lazy"][0], "r") as f:
        s = read_lazy_sample(f, 0)
    np.testing.assert_allclose(
        s.vis_weights, get_hrf_weights(g.vision_onset_deltas())
    )
    pad_len, inst_len, diag_len = s.padvals
    # Language weights: first diag_len entries are HRF weights (bounded),
    # the rest keep their zero padding.
    assert np.all(np.abs(s.lang_weights[:diag_len]) < 1.0)
    assert np.all(s.lang_weights[diag_len:] == 0)
    # Dialogue is close to the target TR (1.5-6 s back) => positive weight
    # region of the HRF is not guaranteed, but weights must be finite.
    assert np.all(np.isfinite(s.lang_weights))


def test_alignment_against_source(stage_dirs):
    """Sample 0 of split 0 must equal episode[window_offset] of the first ep."""
    g = TEST_GEOMETRY
    with h5py.File(stage_dirs["feat"], "r") as f:
        first_ep = sorted(EPISODES)[0]
        vis_src = np.asarray(f[first_ep]["video_features"])[g.window_offset]
        lang_src = np.asarray(f[first_ep]["transcript_features"])[g.window_offset]
    with h5py.File(stage_dirs["bold"], "r") as f:
        bold_src = np.asarray(f["ses-001"][f"ses-001_task-{first_ep}"])[g.bold_offset]
    with h5py.File(stage_dirs["lazy"][0], "r") as f:
        s = read_lazy_sample(f, 0)
    np.testing.assert_array_equal(s.vision, vis_src)
    np.testing.assert_array_equal(s.language, lang_src)
    np.testing.assert_array_equal(s.timeseries, bold_src)


def test_split_train_val_parity():
    files = [f"f{i}.h5" for i in range(10)]
    train, val = split_train_val(files, 1234)
    r = np.random.RandomState(1234)
    expected_val = r.choice(files, 1).tolist()
    assert val == expected_val
    assert len(train) == 9 and expected_val[0] not in train


def test_loader_batches(stage_dirs):
    ds = LazyDataset(stage_dirs["lazy"])
    loader = BatchLoader(ds, batch_size=5, shuffle=True, seed=0, prefetch=2)
    batches = list(loader)
    assert len(batches) == (len(ds) + 4) // 5
    g = TEST_GEOMETRY
    b = batches[0]
    assert b.vision.shape == (5, g.num_frames, 3, g.image_size, g.image_size)
    assert b.language.shape == (5, g.max_lang_tokens)
    assert b.language.dtype == np.int32
    assert b.row_mask.sum() == 5
    # Last batch is padded; mask marks the real rows.
    last = batches[-1]
    assert last.row_mask.sum() == len(ds) - 5 * (len(batches) - 1)
    # All rows seen exactly once across the epoch.
    total_rows = sum(int(x.row_mask.sum()) for x in batches)
    assert total_rows == len(ds)


def test_loader_epoch_reshuffles(stage_dirs):
    ds = LazyDataset(stage_dirs["lazy"])
    loader = BatchLoader(ds, batch_size=4, shuffle=True, seed=0, prefetch=0)
    def epoch_sums():
        return np.concatenate(
            [b.timeseries.sum(axis=1)[b.row_mask > 0] for b in loader]
        )

    e1, e2 = epoch_sums(), epoch_sums()
    assert not np.allclose(e1, e2)
    assert np.allclose(np.sort(e1), np.sort(e2))


def test_loader_prefetch_matches_sync(stage_dirs):
    ds = LazyDataset(stage_dirs["lazy"])
    sync = BatchLoader(ds, batch_size=3, shuffle=False, prefetch=0)
    pref = BatchLoader(ds, batch_size=3, shuffle=False, prefetch=3, num_threads=3)
    for bs, bp in zip(sync, pref):
        np.testing.assert_array_equal(bs.language, bp.language)
        np.testing.assert_array_equal(bs.timeseries, bp.timeseries)


def test_infer_geometry_from_features(stage_dirs):
    """Builder geometry derives from the features file (no blind defaults)."""
    from phantom_vlb_tpu.data.lazyload_build import infer_geometry

    g = infer_geometry(
        stage_dirs["feat"], window=TEST_GEOMETRY.window, delay=TEST_GEOMETRY.delay
    )
    assert g.frames_per_tr == TEST_GEOMETRY.frames_per_tr
    assert g.image_size == TEST_GEOMETRY.image_size
    assert g.max_lang_tokens == TEST_GEOMETRY.max_lang_tokens
    assert g.onsets_width == TEST_GEOMETRY.onsets_width
    assert g.num_ds_frames == TEST_GEOMETRY.num_ds_frames
    assert g.model_max_length == TEST_GEOMETRY.model_max_length


def test_infer_geometry_rejects_bad_window(stage_dirs):
    from phantom_vlb_tpu.data.lazyload_build import infer_geometry

    with pytest.raises(AssertionError):
        infer_geometry(stage_dirs["feat"], window=3)  # 4 frames % 3 != 0


def test_loader_early_break_then_reuse(stage_dirs):
    """Breaking mid-epoch must not deadlock or corrupt the next epoch."""
    ds = LazyDataset(stage_dirs["lazy"])
    loader = BatchLoader(ds, batch_size=4, shuffle=False, prefetch=2, num_threads=2)
    it = iter(loader)
    _ = next(it)
    _ = next(it)
    del it  # abandon mid-epoch

    full = [b for b in loader]  # fresh epoch must be complete and ordered
    total = sum(int(b.row_mask.sum()) for b in full)
    assert total == len(ds)
    ref = BatchLoader(ds, batch_size=4, shuffle=False, prefetch=0)
    for a, b in zip(full, ref):
        np.testing.assert_array_equal(a.language, b.language)
