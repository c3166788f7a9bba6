"""Batched unique-frame extraction == per-TR reference path, byte-identical."""

import numpy as np

from phantom_vlb_tpu.data.synthetic import TEST_GEOMETRY
from phantom_vlb_tpu.data.video import (
    ArrayVideoSource,
    extract_video_chunk,
    extract_video_features,
    tr_end_times,
)


def _source(n_frames=400, seed=0):
    rng = np.random.default_rng(seed)
    return ArrayVideoSource(
        rng.integers(0, 255, (n_frames, 48, 64, 3), dtype=np.uint8), 30.0
    )


def test_batched_equals_per_tr():
    g = TEST_GEOMETRY
    src = _source()
    batched = extract_video_features(src, g, chunk_tr=4)
    duration = src.num_frames / src.fps
    per_tr = np.stack([
        extract_video_chunk(src, t, g) for t in tr_end_times(duration, g.tr)
    ])
    assert batched.shape == per_tr.shape
    np.testing.assert_array_equal(batched, per_tr)


def test_batched_single_thread_matches_multi():
    g = TEST_GEOMETRY
    src = _source(seed=1)
    a = extract_video_features(src, g, num_threads=1)
    b = extract_video_features(src, g, num_threads=4)
    np.testing.assert_array_equal(a, b)


def test_batched_device_path_close():
    from phantom_vlb_tpu.ops.preprocess import DevicePreprocessor

    g = TEST_GEOMETRY
    src = _source(seed=2)
    host = extract_video_features(src, g)
    dev = extract_video_features(
        src, g, preprocess_batch=DevicePreprocessor(g.image_size)
    )
    assert np.abs(host - dev).mean() < 0.01
