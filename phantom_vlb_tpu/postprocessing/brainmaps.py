"""Accuracy brain maps: project per-ROI validation r² into atlas volumes.

Behavioral contract with ``make_acc_brainmaps.py:33-67``: read
``{metrics_path}/metrics.csv``, keep rows where ``val/brain_loss`` is
present, take the sorted ``*ROI*`` columns, square the correlations, and
project them back into the atlas volume (nilearn ``NiftiLabelsMasker
.inverse_transform`` = assign value *i* to every voxel whose atlas label is
the i-th nonzero label), exporting an interactive HTML viewer per validation
epoch and optionally a ``.nii.gz``.

nilearn/nibabel are replaced by the in-repo NIfTI I/O and an HTML slice-
mosaic viewer (axial mosaic, seismic colormap, vmax=1.0 — the reference's
``view_img`` settings).
"""

from __future__ import annotations

import base64
import dataclasses
import io
from pathlib import Path

import numpy as np

from phantom_vlb_tpu.postprocessing.nifti import NiftiImage, load_nifti, save_nifti

__all__ = ["BrainmapConfig", "labels_inverse_transform", "make_brainmaps", "seismic_rgb"]


@dataclasses.dataclass
class BrainmapConfig:
    metrics_path: str       # directory containing metrics.csv
    atlas_path: str         # atlas .nii(.gz): integer labels, 0 = background
    out_path: str           # output prefix
    export_nii: bool = False
    vmax: float = 1.0


def labels_inverse_transform(atlas: np.ndarray, values: np.ndarray) -> np.ndarray:
    """nilearn NiftiLabelsMasker.inverse_transform semantics.

    ``values[i]`` fills voxels whose label equals the i-th *sorted nonzero*
    label of the atlas; background (0) stays 0.
    """
    labels = np.unique(atlas)
    labels = labels[labels != 0]
    if len(values) != len(labels):
        raise ValueError(
            f"{len(values)} values for {len(labels)} atlas labels"
        )
    out = np.zeros(atlas.shape, np.float32)
    # Vectorized: map label -> rank via searchsorted.
    mask = atlas != 0
    ranks = np.searchsorted(labels, atlas[mask])
    out[mask] = np.asarray(values, np.float32)[ranks]
    return out


def seismic_rgb(x: np.ndarray, vmax: float) -> np.ndarray:
    """Matplotlib-'seismic'-like diverging colormap, (..., 3) uint8."""
    # blue (-1) -> white (0) -> red (+1)
    t = np.clip(x / vmax, -1.0, 1.0)
    pos = np.clip(t, 0, 1)
    neg = np.clip(-t, 0, 1)
    rgb = np.stack([1.0 - neg, 1.0 - np.abs(t), 1.0 - pos], axis=-1)
    return (np.clip(rgb, 0, 1) * 255).astype(np.uint8)


def _mosaic_html(volume: np.ndarray, vmax: float, title: str) -> str:
    """Axial slice mosaic as an embedded-PNG HTML page."""
    from PIL import Image

    z_slices = np.linspace(0, volume.shape[2] - 1, min(volume.shape[2], 24))
    tiles = []
    for z in z_slices.astype(int):
        sl = volume[:, :, z].T[::-1]  # radiological-ish orientation
        tiles.append(seismic_rgb(sl, vmax))
    cols = 6
    rows = (len(tiles) + cols - 1) // cols
    h, w, _ = tiles[0].shape
    canvas = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, tile in enumerate(tiles):
        r, c = divmod(i, cols)
        canvas[r * h : (r + 1) * h, c * w : (c + 1) * w] = tile
    buf = io.BytesIO()
    scale = max(1, 768 // canvas.shape[1])
    img = Image.fromarray(canvas)
    if scale > 1:
        img = img.resize((canvas.shape[1] * scale, canvas.shape[0] * scale),
                         Image.NEAREST)
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{title}</title></head><body style='background:#111;color:#eee;"
        "font-family:sans-serif'>"
        f"<h3>{title}</h3>"
        f"<p>axial mosaic — seismic colormap, vmax={vmax}</p>"
        f"<img src='data:image/png;base64,{b64}'/>"
        "</body></html>"
    )


def make_brainmaps(config: BrainmapConfig) -> list[str]:
    """Returns the list of HTML files written (one per validation epoch)."""
    import pandas as pd

    atlas_img = load_nifti(config.atlas_path)
    atlas = np.asarray(atlas_img.data)
    if atlas.ndim == 4:
        atlas = atlas[..., 0]
    atlas = np.rint(atlas).astype(np.int32)

    results_df = pd.read_csv(Path(config.metrics_path) / "metrics.csv")
    val_df = results_df[results_df["val/brain_loss"].notna()]
    roi_df = val_df[sorted([c for c in val_df.columns if "ROI" in c])]

    written = []
    for i in range(roi_df.shape[0]):
        r2 = roi_df.iloc[i, :].to_numpy() ** 2
        volume = labels_inverse_transform(atlas, r2)
        if config.export_nii:
            save_nifti(
                NiftiImage(volume, atlas_img.affine),
                f"{config.out_path}_val-{i}.nii.gz",
            )
        html = _mosaic_html(volume, config.vmax, f"val epoch {i} — r²")
        out = f"{config.out_path}_val-{i}.html"
        Path(out).write_text(html)
        written.append(out)
    return written
