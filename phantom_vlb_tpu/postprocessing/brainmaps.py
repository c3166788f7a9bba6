"""Accuracy brain maps: project per-ROI validation r² into atlas volumes.

Behavioral contract with ``make_acc_brainmaps.py:33-67``: read
``{metrics_path}/metrics.csv``, keep rows where ``val/brain_loss`` is
present, take the sorted ``*ROI*`` columns, square the correlations, and
project them back into the atlas volume (nilearn ``NiftiLabelsMasker
.inverse_transform`` = assign value *i* to every voxel whose atlas label is
the i-th nonzero label), exporting an interactive HTML viewer per validation
epoch and optionally a ``.nii.gz``.

nilearn/nibabel are replaced by the in-repo NIfTI I/O and a self-contained
HTML viewer.  The default viewer is interactive, nilearn-``view_img``-style
(make_acc_brainmaps.py:59-67): three orthogonal planes with slice sliders and
click-to-navigate crosshairs, seismic colormap with vmax=1.0, a colorbar, and
an anatomical underlay derived from the atlas parcellation (the MNI template
itself is not shipped).  The volume is embedded uint8-quantized (256 levels
over [-vmax, vmax]) and rendered client-side — no external assets, works
offline.  ``viewer='mosaic'`` keeps the lightweight static axial mosaic.
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
    viewer: str = "interactive"   # 'interactive' (view_img-style) | 'mosaic'


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


_VIEWER_JS = r"""
const DIMS = __DIMS__, ASPECT = __ASPECT__, VMAX = __VMAX__;
const vol = Uint8Array.from(atob(VOL_B64), c => c.charCodeAt(0));
const under = Uint8Array.from(atob(UNDER_B64), c => c.charCodeAt(0));
const [NX, NY, NZ] = DIMS;
let cross = [NX >> 1, NY >> 1, NZ >> 1];
function vox(x, y, z) { return x + NX * (y + NY * z); }
function seismic(t) {            // t in [-1, 1] -> [r, g, b]
  const pos = Math.max(0, Math.min(t, 1)), neg = Math.max(0, Math.min(-t, 1));
  const a = Math.abs(Math.max(-1, Math.min(t, 1)));
  return [255 * (1 - neg), 255 * (1 - a), 255 * (1 - pos)];
}
// planes: [axisFixed, axisH, axisW]
const PLANES = { ax: [2, 1, 0], co: [1, 2, 0], sa: [0, 2, 1] };
function drawPlane(name) {
  const [af, ah, aw] = PLANES[name];
  const W = DIMS[aw], H = DIMS[ah], fixed = cross[af];
  const cv = document.getElementById("cv_" + name);
  const ctx = cv.getContext("2d");
  const img = ctx.createImageData(W, H);
  const idx = [0, 0, 0];
  idx[af] = fixed;
  for (let j = 0; j < H; j++) {
    idx[ah] = H - 1 - j;                     // superior up / anterior up
    for (let i = 0; i < W; i++) {
      idx[aw] = i;
      const v = vol[vox(idx[0], idx[1], idx[2])];
      const u = under[vox(idx[0], idx[1], idx[2])];
      let r = u, g = u, b = u;
      if (v !== 128) {                        // 128 encodes exactly 0
        const t = (v - 128) / 127.0;
        [r, g, b] = seismic(t);
      }
      const o = 4 * (j * W + i);
      img.data[o] = r; img.data[o + 1] = g; img.data[o + 2] = b;
      img.data[o + 3] = 255;
    }
  }
  ctx.putImageData(img, 0, 0);
  // crosshair
  ctx.strokeStyle = "rgba(120,220,120,0.8)";
  ctx.beginPath();
  const cx = cross[aw] + 0.5, cy = H - 1 - cross[ah] + 0.5;
  ctx.moveTo(cx, 0); ctx.lineTo(cx, H);
  ctx.moveTo(0, cy); ctx.lineTo(W, cy);
  ctx.stroke();
  document.getElementById("sl_" + name).value = fixed;
  const [x, y, z] = cross;
  document.getElementById("val").textContent =
    "voxel (" + x + "," + y + "," + z + ")  value " +
    ((vol[vox(x, y, z)] - 128) / 127 * VMAX).toFixed(3);
}
function drawAll() { for (const n in PLANES) drawPlane(n); }
function setup(name) {
  const [af, ah, aw] = PLANES[name];
  const cv = document.getElementById("cv_" + name);
  cv.width = DIMS[aw]; cv.height = DIMS[ah];
  cv.style.width = (DIMS[aw] * ASPECT[aw] * 2.2) + "px";
  cv.style.height = (DIMS[ah] * ASPECT[ah] * 2.2) + "px";
  const sl = document.getElementById("sl_" + name);
  sl.max = DIMS[af] - 1; sl.value = cross[af];
  sl.oninput = () => { cross[af] = +sl.value; drawAll(); };
  cv.onclick = (e) => {
    const r = cv.getBoundingClientRect();
    cross[aw] = Math.min(DIMS[aw] - 1, Math.max(0,
      Math.round((e.clientX - r.left) / r.width * DIMS[aw] - 0.5)));
    cross[ah] = Math.min(DIMS[ah] - 1, Math.max(0, DIMS[ah] - 1 -
      Math.round((e.clientY - r.top) / r.height * DIMS[ah] - 0.5)));
    drawAll();
  };
}
for (const n in PLANES) setup(n);
drawAll();
"""


def _interactive_html(
    volume: np.ndarray, atlas: np.ndarray, affine: np.ndarray,
    vmax: float, title: str,
) -> str:
    """nilearn-view_img-style three-plane viewer, fully self-contained."""
    q = np.rint(np.clip(volume / vmax, -1.0, 1.0) * 127).astype(np.int16) + 128
    # Reserve 128 for exactly-zero so background stays underlay-only.
    q[(volume == 0)] = 128
    vol_b64 = base64.b64encode(q.astype(np.uint8).tobytes(order="F")).decode()
    # Anatomical-ish underlay: parcel-textured gray inside the brain.
    under = np.where(atlas != 0, 55 + (atlas % 89) * 0.9, 0).astype(np.uint8)
    under_b64 = base64.b64encode(under.tobytes(order="F")).decode()
    aspect = [float(a) for a in np.abs(np.diag(affine)[:3])]
    aspect = [a / max(aspect) for a in aspect]

    js = (
        _VIEWER_JS
        .replace("__DIMS__", str(list(volume.shape)))
        .replace("__ASPECT__", str(aspect))
        .replace("__VMAX__", repr(float(vmax)))
    )
    grad = (
        "linear-gradient(to right, rgb(0,0,255), rgb(255,255,255), rgb(255,0,0))"
    )
    panes = "".join(
        f"<div class='pane'><div>{label}</div>"
        f"<canvas id='cv_{n}'></canvas><br>"
        f"<input type='range' id='sl_{n}' min='0' value='0'></div>"
        for n, label in (("sa", "sagittal"), ("co", "coronal"), ("ax", "axial"))
    )
    return f"""<!doctype html><html><head><meta charset='utf-8'>
<title>{title}</title><style>
body {{ background:#111; color:#eee; font-family:sans-serif }}
.pane {{ display:inline-block; margin:8px; text-align:center }}
canvas {{ image-rendering:pixelated; background:#000; cursor:crosshair }}
input[type=range] {{ width: 90% }}
.cbar {{ width:260px; height:14px; background:{grad}; display:inline-block }}
</style></head><body>
<h3>{title}</h3>
<div>{panes}</div>
<div id='val' style='margin:6px'></div>
<div>-{vmax} <span class='cbar'></span> +{vmax} &nbsp; (seismic, vmax={vmax})</div>
<script>
const VOL_B64 = "{vol_b64}";
const UNDER_B64 = "{under_b64}";
{js}
</script></body></html>"""


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
        if config.viewer == "interactive":
            html = _interactive_html(
                volume, atlas, atlas_img.affine, config.vmax,
                f"val epoch {i} — r²",
            )
        else:
            html = _mosaic_html(volume, config.vmax, f"val epoch {i} — r²")
        out = f"{config.out_path}_val-{i}.html"
        Path(out).write_text(html)
        written.append(out)
    return written
