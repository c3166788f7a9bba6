"""Native (libav) video reader tests: encode -> decode round trip."""

import numpy as np
import pytest

from phantom_vlb_tpu.data.video import extract_video_chunk
from phantom_vlb_tpu.data.video_reader import (
    NativeVideoSource,
    ensure_built,
    write_test_video,
)
from phantom_vlb_tpu.data.synthetic import TEST_GEOMETRY


@pytest.fixture(scope="module")
def test_video(tmp_path_factory):
    ensure_built()
    path = tmp_path_factory.mktemp("vid") / "friends_s01e01a.mkv"
    write_test_video(path, w=64, h=48, n=120, fps=30.0)
    return path


def test_metadata(test_video):
    src = NativeVideoSource(test_video)
    assert src.num_frames == 120
    assert abs(src.fps - 30.0) < 0.1
    src.close()


def test_frame_content_and_order(test_video):
    """Frame i encodes (i % 251) in the red channel (lossy: wide tolerance)."""
    src = NativeVideoSource(test_video)
    batch = src.get_batch([0, 10, 50, 119])
    assert batch.shape == (4, 48, 64, 3)
    for frame, idx in zip(batch, [0, 10, 50, 119]):
        red = float(frame[:, :, 0].mean())
        assert abs(red - (idx % 251)) < 12, (idx, red)
    src.close()


def test_overlapping_windows_single_pass(test_video):
    """Sequential overlapping reads come from the cache, not reopens."""
    src = NativeVideoSource(test_video)
    a = src.get_batch([0, 5, 10])
    b = src.get_batch([5, 10, 15])  # overlap: cache hits
    np.testing.assert_array_equal(a[1], b[0])
    np.testing.assert_array_equal(a[2], b[1])
    src.close()


def test_backward_access_reopens(test_video):
    src = NativeVideoSource(test_video, cache_size=4)
    src.get_batch([100])
    frame0 = src.get_batch([0])[0]  # far behind cache: reopen path
    assert abs(float(frame0[:, :, 0].mean()) - 0) < 12
    src.close()


def test_extract_chunk_with_native_source(test_video):
    g = TEST_GEOMETRY
    src = NativeVideoSource(test_video)
    out = extract_video_chunk(src, end_time=2 * g.tr, geometry=g)
    assert out.shape == (g.num_frames, 3, g.image_size, g.image_size)
    assert np.isfinite(out).all()
    src.close()
