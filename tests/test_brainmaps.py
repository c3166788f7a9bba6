"""NIfTI round trip + brain-map projection contract tests."""

import numpy as np
import pandas as pd
import pytest

from phantom_vlb_tpu.postprocessing.brainmaps import (
    BrainmapConfig,
    labels_inverse_transform,
    make_brainmaps,
)
from phantom_vlb_tpu.postprocessing.nifti import NiftiImage, load_nifti, save_nifti


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((7, 9, 5)).astype(np.float32)
    affine = np.diag([2.0, 2.0, 2.0, 1.0])
    affine[:3, 3] = [-10, -20, -5]
    save_nifti(NiftiImage(data, affine), tmp_path / "x.nii.gz")
    img = load_nifti(tmp_path / "x.nii.gz")
    np.testing.assert_allclose(img.data, data, atol=0)
    np.testing.assert_allclose(img.affine, affine, atol=1e-6)


def test_nifti_int_atlas_roundtrip(tmp_path):
    atlas = np.zeros((6, 6, 4), np.int32)
    atlas[1:3, 1:3, 1:3] = 5
    atlas[4, 4, 2] = 9
    save_nifti(NiftiImage(atlas, np.eye(4)), tmp_path / "atlas.nii")
    img = load_nifti(tmp_path / "atlas.nii")
    np.testing.assert_array_equal(img.data, atlas)


def test_labels_inverse_transform():
    atlas = np.zeros((4, 4, 2), np.int32)
    atlas[0, 0, 0] = 3   # first nonzero label
    atlas[1, 1, 1] = 10  # second
    out = labels_inverse_transform(atlas, np.array([0.5, 0.8]))
    assert out[0, 0, 0] == np.float32(0.5)
    assert out[1, 1, 1] == np.float32(0.8)
    assert out.sum() == np.float32(1.3)


def test_labels_mismatch_raises():
    atlas = np.ones((2, 2, 2), np.int32)
    with pytest.raises(ValueError):
        labels_inverse_transform(atlas, np.array([1.0, 2.0]))


def test_make_brainmaps_end_to_end(tmp_path):
    n_roi = 8
    atlas = np.zeros((8, 8, 6), np.int32)
    for i in range(n_roi):
        atlas[i, i, i % 6] = i + 1
    save_nifti(NiftiImage(atlas, np.eye(4)), tmp_path / "atlas.nii.gz")

    # metrics.csv in the trainer's layout: train rows + val rows.
    rows = []
    rows.append({"epoch": 0, "step": 10, "train/brain_loss": 1.0})
    for e in range(2):
        row = {"epoch": e, "step": 20 + e, "val/brain_loss": 0.5 - 0.1 * e}
        for i in range(n_roi):
            row[f"val_corr_ROI_{i:06d}"] = 0.1 * i * (e + 1)
        row["val_corr_avg"] = 0.3
        rows.append(row)
    pd.DataFrame(rows).to_csv(tmp_path / "metrics.csv", index=False)

    cfg = BrainmapConfig(
        metrics_path=str(tmp_path),
        atlas_path=str(tmp_path / "atlas.nii.gz"),
        out_path=str(tmp_path / "map"),
        export_nii=True,
    )
    written = make_brainmaps(cfg)
    assert len(written) == 2  # one per val row; train rows skipped
    for f in written:
        assert "<html" in open(f).read()[:200].lower()
    # nii export: voxel for ROI 3 in epoch 1 = (0.1*3*2)^2.
    img = load_nifti(tmp_path / "map_val-1.nii.gz")
    np.testing.assert_allclose(img.data[3, 3, 3], (0.6) ** 2, rtol=1e-5)


def test_interactive_viewer_payload(tmp_path):
    """The view_img-style HTML embeds a decodable, value-faithful volume."""
    import base64
    import re

    from phantom_vlb_tpu.postprocessing.brainmaps import _interactive_html

    atlas = np.zeros((5, 6, 4), np.int32)
    atlas[1, 2, 3] = 7
    atlas[2, 3, 1] = 9
    volume = np.zeros((5, 6, 4), np.float32)
    volume[1, 2, 3] = 0.64   # r^2 value
    volume[2, 3, 1] = -0.5
    html = _interactive_html(volume, atlas, np.diag([2.0, 2.0, 3.0, 1.0]), 1.0,
                             "test map")
    # Three planes with sliders and canvases, a colorbar, the title.
    for n in ("ax", "co", "sa"):
        assert f"cv_{n}" in html and f"sl_{n}" in html
    assert "cbar" in html and "test map" in html

    vol_b64 = re.search(r'VOL_B64 = "([^"]*)"', html).group(1)
    q = np.frombuffer(base64.b64decode(vol_b64), np.uint8).reshape(
        volume.shape, order="F"
    )
    # 128 encodes exactly zero; values round-trip within quantization step.
    assert q[0, 0, 0] == 128
    assert abs((int(q[1, 2, 3]) - 128) / 127.0 - 0.64) < 1 / 127
    assert abs((int(q[2, 3, 1]) - 128) / 127.0 + 0.5) < 1 / 127
    under_b64 = re.search(r'UNDER_B64 = "([^"]*)"', html).group(1)
    u = np.frombuffer(base64.b64decode(under_b64), np.uint8).reshape(
        volume.shape, order="F"
    )
    assert u[0, 0, 0] == 0 and u[1, 2, 3] > 0  # underlay only inside brain
