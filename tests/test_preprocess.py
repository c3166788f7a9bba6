"""Fused device preprocessing vs host (PIL) parity."""

import numpy as np

from phantom_vlb_tpu.data.video import host_preprocess
from phantom_vlb_tpu.ops.preprocess import device_preprocess


def test_smooth_image_parity():
    """Natural-image-like (smooth) content: close parity."""
    y, x = np.mgrid[0:48, 0:64]
    img = np.stack(
        [
            (x * 2) % 256,
            (y * 3) % 256,
            ((x + y)) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)
    frames = np.stack([img, img[::-1]])
    h = host_preprocess(list(frames), 56)
    d = device_preprocess(frames, 56)
    # interior pixels (away from the pad seam)
    err = np.abs(h - d)[:, :, 8:-8, 8:-8]
    assert err.mean() < 0.02
    assert err.max() < 0.35


def test_noise_image_statistics():
    """Pixel-noise worst case: distributions must still agree closely."""
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (3, 48, 64, 3), dtype=np.uint8)
    h = host_preprocess(list(frames), 56)
    d = device_preprocess(frames, 56)
    err = np.abs(h - d)
    assert err.mean() < 0.01
    np.testing.assert_allclose(h.mean(), d.mean(), atol=5e-3)
    np.testing.assert_allclose(h.std(), d.std(), atol=2e-2)


def test_square_input_no_pad():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (2, 56, 56, 3), dtype=np.uint8)
    h = host_preprocess(list(frames), 56)   # no resize, no pad
    d = device_preprocess(frames, 56)
    np.testing.assert_allclose(h, d, atol=1e-5)


def test_device_preprocessor_in_chunk():
    from phantom_vlb_tpu.data.synthetic import TEST_GEOMETRY
    from phantom_vlb_tpu.data.video import ArrayVideoSource, extract_video_chunk
    from phantom_vlb_tpu.ops.preprocess import DevicePreprocessor

    g = TEST_GEOMETRY
    rng = np.random.default_rng(2)
    src = ArrayVideoSource(rng.integers(0, 255, (300, 48, 64, 3), dtype=np.uint8), 30.0)
    host = extract_video_chunk(src, 3 * g.tr, g)
    dev = extract_video_chunk(src, 3 * g.tr, g, DevicePreprocessor(g.image_size))
    assert host.shape == dev.shape
    assert np.abs(host - dev).mean() < 0.01
