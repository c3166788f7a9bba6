"""Golden-value tests for the Glover HRF weights.

The reference delegates to nilearn (src/utils.py:14-37); our implementation
reproduces nilearn's algorithm. Golden values below were computed with this
implementation and locked in; shape/qualitative checks guard the physiology
(peak ~5-6 s, undershoot ~12 s, ~0 at 0 and 30+ s).
"""

import numpy as np
import pytest

from phantom_vlb_tpu.data.hrf import (
    compute_glover_regressor,
    get_hrf_weight,
    get_hrf_weights,
    glover_hrf,
)


def test_kernel_unit_sum():
    k = glover_hrf(tr=1.49)
    assert np.isclose(k.sum(), 1.0)
    # Peak of the raw kernel near 5.4 s.
    dt = 1.49 / 50
    t_peak = np.argmax(k) * 32.0 / (len(k) - 1)
    assert 4.5 < t_peak < 6.5
    assert k.min() < 0  # undershoot exists


def test_weight_physiology():
    w = {t: get_hrf_weight(t) for t in [0.5, 1.0, 5.0, 6.0, 12.0, 25.0]}
    assert w[0.5] < 1e-4          # almost no response yet
    assert w[5.0] > 0.2           # near peak
    assert w[6.0] > 0.2
    assert w[12.0] < 0            # undershoot
    assert abs(w[25.0]) < 0.01    # washed out


def test_vision_window_weights():
    """The 7 weights of the reference geometry (lazyloading.py:108-115)."""
    vis_onsets = 1.49 * (5.5 - np.arange(0, 3.5, 0.5))
    w = get_hrf_weights(vis_onsets)
    assert w.shape == (7,)
    # Locked golden values from this implementation (float64).
    golden = np.array([
        0.14221434, 0.17762657, 0.26117502, 0.26213918,
        0.25400216, 0.22489919, 0.15346147,
    ])
    np.testing.assert_allclose(w, golden, atol=1e-6)


def test_regressor_monotone_rise():
    frame_times = np.array([0.0, 4.0])
    v4 = compute_glover_regressor(frame_times)[-1]
    v2 = compute_glover_regressor(np.array([0.0, 2.0]))[-1]
    assert v4 > v2 > 0


def test_batch_matches_scalar():
    ts = np.array([1.0, 3.3, 7.7])
    batch = get_hrf_weights(ts)
    singles = np.array([get_hrf_weight(t) for t in ts])
    np.testing.assert_array_equal(batch, singles)


def test_cache_stability():
    a = get_hrf_weight(5.215)
    b = get_hrf_weight(5.215)
    assert a == b
