"""HDF5 schema contracts for the three pipeline stages.

Byte-compatible with the reference formats so data produced by either
implementation interoperates:

1. **Features file** (per season; extractfeatures.py:457-508):
   one group per episode with gzip-4 datasets
   ``transcript_features`` (n_TR, max_lang_tokens) int64,
   ``transcript_onsets`` (n_TR, onsets_width) float64,
   ``masking_params`` (n_TR, 3) int64 = [pad_len, inst_len, diag_len],
   ``video_features`` (n_TR, num_frames, 3, image, image) float32.

2. **BOLD timeseries file** (per subject; consumed at lazyloading.py:56-59):
   groups ``<ses>`` containing datasets named ``*_task-<episode>*`` of shape
   (n_TR, num_parcels).

3. **Lazy-load file** (per subject x season x split; lazyloading.py:141-164):
   groups ``{idx}`` with uncompressed datasets ``{idx}_timeseries``
   (num_parcels,), ``{idx}_vision`` (num_frames, 3, image, image),
   ``{idx}_vis_weights`` (num_ds_frames,), ``{idx}_language``
   (max_lang_tokens,), ``{idx}_lang_weights`` (onsets_width,),
   ``{idx}_padvals`` (3,), plus a root scalar dataset ``dset_len`` = [n].
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Iterator, Mapping

import h5py
import numpy as np

from phantom_vlb_tpu.core.geometry import VLBGeometry

__all__ = [
    "GZIP4",
    "FeatureEpisode",
    "write_feature_episode",
    "read_feature_episode",
    "list_feature_episodes",
    "LazySample",
    "LazyloadWriter",
    "read_lazy_sample",
    "lazyload_len",
    "bold_episode_keys",
    "validate_features_file",
    "validate_lazyload_file",
]

GZIP4 = {"compression": "gzip", "compression_opts": 4}


@dataclasses.dataclass
class FeatureEpisode:
    """One episode's extracted features (stage-1 output)."""

    transcript_features: np.ndarray  # (n_TR, max_lang_tokens) int
    transcript_onsets: np.ndarray    # (n_TR, onsets_width) float
    masking_params: np.ndarray       # (n_TR, 3) int
    video_features: np.ndarray       # (n_TR, num_frames, 3, H, W) float32

    def validate(self, geom: VLBGeometry) -> None:
        n = self.transcript_features.shape[0]
        assert self.transcript_features.shape == (n, geom.max_lang_tokens)
        assert self.transcript_onsets.shape == (n, geom.onsets_width)
        assert self.masking_params.shape == (n, 3)
        # video may have a different TR count (text and video are written
        # from independent loops in the reference; alignment happens later).
        v = self.video_features
        assert v.ndim == 5 and v.shape[1:] == (
            geom.num_frames, 3, geom.image_size, geom.image_size,
        ), v.shape


def write_feature_episode(path: str | Path, episode: str, ep: FeatureEpisode) -> None:
    with h5py.File(path, "a") as f:
        group = f.create_group(episode) if episode not in f else f[episode]
        group.create_dataset("transcript_features", data=ep.transcript_features, **GZIP4)
        group.create_dataset("transcript_onsets", data=ep.transcript_onsets, **GZIP4)
        group.create_dataset("masking_params", data=ep.masking_params, **GZIP4)
        group.create_dataset("video_features", data=ep.video_features, **GZIP4)


def read_feature_episode(path: str | Path, episode: str) -> FeatureEpisode:
    with h5py.File(path, "r") as f:
        g = f[episode]
        return FeatureEpisode(
            transcript_features=np.asarray(g["transcript_features"]),
            transcript_onsets=np.asarray(g["transcript_onsets"]),
            masking_params=np.asarray(g["masking_params"]),
            video_features=np.asarray(g["video_features"]),
        )


def list_feature_episodes(path: str | Path) -> list[str]:
    """Episodes already present (= the resume contract, extractfeatures.py:113-126)."""
    p = Path(path)
    if not p.exists():
        with h5py.File(p, "w"):
            pass
        return []
    with h5py.File(p, "r") as f:
        return sorted(f.keys())


def bold_episode_keys(timeseries_path: str | Path) -> dict[str, tuple[str, str]]:
    """Map episode id -> (session, run) for a subject's BOLD file.

    Run names encode the episode as the second underscore field's last
    dash field (lazyloading.py:56-59), e.g. ``ses-001_task-s01e02a`` ->
    ``s01e02a``.
    """
    with h5py.File(timeseries_path, "r") as f:
        return {
            run.split("_")[1].split("-")[-1]: (ses, run)
            for ses, val in f.items()
            for run in val.keys()
        }


@dataclasses.dataclass
class LazySample:
    """One training examplar (stage-2 output, stage-3 input)."""

    timeseries: np.ndarray    # (num_parcels,)
    vision: np.ndarray        # (num_frames, 3, H, W) float32
    vis_weights: np.ndarray   # (num_ds_frames,)
    language: np.ndarray      # (max_lang_tokens,) int
    lang_weights: np.ndarray  # (onsets_width,)
    padvals: np.ndarray       # (3,) int = [pad_len, inst_len, diag_len]

    FIELDS = ("timeseries", "vision", "vis_weights", "language", "lang_weights", "padvals")


class LazyloadWriter:
    """Appends samples under sequential ``{idx}`` groups; finalizes ``dset_len``."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.idx = 0

    def append(self, sample: LazySample) -> None:
        with h5py.File(self.path, "a") as f:
            group = f.create_group(f"{self.idx}")
            for field in LazySample.FIELDS:
                group.create_dataset(
                    f"{self.idx}_{field}", data=getattr(sample, field)
                )
        self.idx += 1

    def append_many(self, samples: Mapping[str, np.ndarray] | list[LazySample]) -> None:
        # Single file-open for a whole episode (the reference re-opens the
        # file per sample, lazyloading.py:141; this is the I/O hot loop).
        with h5py.File(self.path, "a") as f:
            for sample in samples:
                group = f.create_group(f"{self.idx}")
                for field in LazySample.FIELDS:
                    group.create_dataset(
                        f"{self.idx}_{field}", data=getattr(sample, field)
                    )
                self.idx += 1

    def finalize(self) -> int:
        with h5py.File(self.path, "a") as f:
            f.create_dataset("dset_len", data=[self.idx])
        return self.idx


def read_lazy_sample(f: h5py.File, idx: int) -> LazySample:
    g = f[f"{idx}"]
    return LazySample(
        **{field: np.asarray(g[f"{idx}_{field}"]) for field in LazySample.FIELDS}
    )


def lazyload_len(path: str | Path) -> int:
    with h5py.File(path, "r") as f:
        return int(np.asarray(f["dset_len"])[0])


def validate_features_file(path: str | Path, geom: VLBGeometry) -> list[str]:
    episodes = list_feature_episodes(path)
    for ep in episodes:
        read_feature_episode(path, ep).validate(geom)
    return episodes


def validate_lazyload_file(path: str | Path, geom: VLBGeometry) -> int:
    n = lazyload_len(path)
    with h5py.File(path, "r") as f:
        for idx in (0, n - 1) if n else ():
            s = read_lazy_sample(f, idx)
            assert s.timeseries.shape == (geom.num_parcels,)
            assert s.vision.shape == (
                geom.num_frames, 3, geom.image_size, geom.image_size,
            )
            assert s.vis_weights.shape == (geom.num_ds_frames,)
            assert s.language.shape == (geom.max_lang_tokens,)
            assert s.lang_weights.shape == (geom.onsets_width,)
            assert s.padvals.shape == (3,)
    return n


def iter_lazy_samples(path: str | Path) -> Iterator[LazySample]:
    n = lazyload_len(path)
    with h5py.File(path, "r") as f:
        for idx in range(n):
            yield read_lazy_sample(f, idx)
