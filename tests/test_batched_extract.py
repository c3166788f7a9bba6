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


def test_per_tr_mode_matches_batched(tmp_path):
    """extract_episode(video_mode='per_tr') == 'batched' byte-for-byte."""
    import pandas as pd

    from phantom_vlb_tpu.core.geometry import VLBGeometry
    from phantom_vlb_tpu.data.extract import extract_episode
    from phantom_vlb_tpu.data.text import SentencePieceTestTokenizer
    from phantom_vlb_tpu.data.video_reader import NativeVideoSource, write_test_video

    g = VLBGeometry(tr=1.49, frames_per_tr=2, window=2, model_max_length=256,
                    image_size=56)
    path = tmp_path / "t.mkv"
    write_test_video(path, w=96, h=64, n=240, fps=23.976)
    n_tr = 6
    transcript_df = pd.DataFrame([
        {
            "text_per_tr": f"word{i}a word{i}b ",
            "words_per_tr": str([f"word{i}a", f"word{i}b"]),
            "onsets_per_tr": str([round(i * g.tr + 0.1, 3),
                                  round(i * g.tr + 0.7, 3)]),
        }
        for i in range(n_tr)
    ])
    seg_df = pd.DataFrame({"scene": [1, 2], "onset": [0.0, 4.5]})
    tok = SentencePieceTestTokenizer()

    outs = {}
    for mode in ("batched", "per_tr"):
        src = NativeVideoSource(path)
        outs[mode] = extract_episode(
            transcript_df, seg_df, src, g, tok, video_mode=mode
        )
        src.close()
    np.testing.assert_array_equal(
        outs["per_tr"].video_features, outs["batched"].video_features
    )
