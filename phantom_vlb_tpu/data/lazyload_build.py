"""Stage 2 — align extracted features with BOLD and write lazy-load files.

Behavioral contract with ``videollama2_vlb_lazyloading.py:51-169``:

- Episodes present in both the features file and the subject's BOLD file are
  assigned to ``n_split`` chunks by ``floor(rank / (n_episodes/n_split))``.
- Per episode: drop the first ``window-1`` TRs of the features and
  ``(window-1)+delay`` TRs of BOLD; target-TR midpoints at
  ``((window-1)+delay+0.5+i)*tr``; sample count = min over modalities.
- Vision HRF weights: one shared vector per geometry
  (``num_ds_frames`` values; lazyloading.py:101-115).
- Language HRF weights: per sample, ``get_hrf_weight(target_time - onset)``
  for the first ``diag_len`` entries; remaining entries keep their stored
  (zero-padded) values (lazyloading.py:134-139).
- Output naming: ``friends_llFile_{subject}_{season}_n{i}.h5``
  (lazyloading.py:91 — the fixed naming; the stale glob in the reference's
  lora.yaml:9 is deliberately not reproduced, see docs).

TPU-native deltas (documented, not behavioral):
- HRF weights come from the cached/vectorized :mod:`phantom_vlb_tpu.data.hrf`
  instead of per-call scipy (the reference's CPU hot loop).
- One HDF5 open per episode instead of per sample.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import h5py
import numpy as np

from phantom_vlb_tpu.core.geometry import VLBGeometry
from phantom_vlb_tpu.data.hrf import get_hrf_weights
from phantom_vlb_tpu.data.schemas import (
    LazySample,
    LazyloadWriter,
    bold_episode_keys,
)

__all__ = ["LazyloadBuildConfig", "build_lazyload_dsets", "lazyload_filename"]


def lazyload_filename(subject: str, season: str, split: int) -> str:
    return f"friends_llFile_{subject}_{season}_n{split}.h5"


def infer_geometry(
    features_path: str,
    window: int = 3,
    delay: int = 3,
    tr: float = 1.49,
    patch_size: int = 14,
) -> VLBGeometry:
    """Derive the full geometry from a features file's actual shapes.

    The reference CLI takes only window/delay and trusts the data implicitly
    (lazyloading.py:18-48); deriving from the file guarantees the builder's
    HRF weight vectors (num_ds_frames) and padding widths always match the
    extraction geometry.
    """
    import dataclasses as _dc

    with h5py.File(features_path, "r") as f:
        ep = next(iter(f.keys()))
        n, num_frames, _, image_size, _ = f[ep]["video_features"].shape
        max_lang = f[ep]["transcript_features"].shape[1]
        onsets_width = f[ep]["transcript_onsets"].shape[1]

    assert num_frames % window == 0, (
        f"{num_frames} frames/sample not divisible by window={window}"
    )
    probe = VLBGeometry(
        tr=tr,
        frames_per_tr=num_frames // window,
        window=window,
        delay=delay,
        model_max_length=0,  # fixed next from max_lang
        image_size=image_size,
        patch_size=patch_size,
        onsets_width=onsets_width,
    )
    geom = _dc.replace(probe, model_max_length=probe.num_vis_tokens + max_lang - 1)
    geom.validate()
    return geom


@dataclasses.dataclass
class LazyloadBuildConfig:
    features_path: str
    timeseries_path: str
    lazyload_path: str          # output directory
    subject: str
    season: str
    n_split: int = 4
    geometry: VLBGeometry = dataclasses.field(default_factory=VLBGeometry)


def build_lazyload_dsets(config: LazyloadBuildConfig) -> list[str]:
    """Build the ``n_split`` lazy-load files; returns their paths."""
    geom = config.geometry
    geom.validate()

    ep_keys = bold_episode_keys(config.timeseries_path)

    out_paths: list[str] = []
    with h5py.File(config.features_path, "r") as f_file, h5py.File(
        config.timeseries_path, "r"
    ) as b_file:
        epi_list = [x for x in f_file.keys() if x in ep_keys]
        chunk_idx = np.floor(
            np.arange(len(epi_list)) / (len(epi_list) / config.n_split)
        ).astype(int)

        # Shared per-geometry vision weights (lazyloading.py:101-115).
        vis_weights = get_hrf_weights(geom.vision_onset_deltas())

        for i in range(config.n_split):
            ll_path = Path(config.lazyload_path) / lazyload_filename(
                config.subject, config.season, i
            )
            writer = LazyloadWriter(ll_path)

            chunk_epi_list = np.array(epi_list)[chunk_idx == i].tolist()
            for ep_num in chunk_epi_list:
                ses, run = ep_keys[ep_num]
                run_tseries = np.asarray(b_file[ses][run])[geom.bold_offset:]
                run_tr_onsets = geom.target_tr_onsets(run_tseries.shape[0])

                grp = f_file[ep_num]
                run_vision = np.asarray(grp["video_features"])[geom.window_offset:]
                run_language = np.asarray(grp["transcript_features"])[geom.window_offset:]
                run_lang_onsets = np.asarray(grp["transcript_onsets"])[geom.window_offset:]
                run_maskval = np.asarray(grp["masking_params"])[geom.window_offset:]

                assert run_maskval.shape[0] == run_language.shape[0]
                n_rows = min(
                    run_tseries.shape[0], run_vision.shape[0], run_language.shape[0]
                )

                samples = []
                for n in range(n_rows):
                    pad_len, inst_len, diag_len = (int(v) for v in run_maskval[n])
                    lang_weights = run_lang_onsets[n].astype(np.float64).copy()
                    if diag_len:
                        lang_weights[:diag_len] = get_hrf_weights(
                            run_tr_onsets[n] - lang_weights[:diag_len]
                        )
                    samples.append(
                        LazySample(
                            timeseries=run_tseries[n],
                            vision=run_vision[n],
                            vis_weights=vis_weights,
                            language=run_language[n],
                            lang_weights=lang_weights,
                            padvals=run_maskval[n],
                        )
                    )
                writer.append_many(samples)

            writer.finalize()
            out_paths.append(str(ll_path))

    return out_paths
