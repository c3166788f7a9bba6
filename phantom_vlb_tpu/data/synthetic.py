"""Synthetic tiny-episode generators.

The reference has no fixtures or fake backends (SURVEY.md §4); every stage was
tested manually on the real 17 MB/sample dataset.  Here every pipeline stage is
exercised against synthetic HDF5 files that honor the exact schema and token
layout contracts, at a tiny geometry that keeps CI fast.

Token-layout contract for a language row (derived from prep_text,
extractfeatures.py:215-300, and make_weight_mask, litmodule.py:184-202)::

    [prefix (system msg)] [<video>=-201] [2 joiner + inst_len] [diag_len]
    [4 joiner] [pad_len zeros]
    |---------------- total = max_lang_tokens ----------------|

so ``prefix_len = max_lang_tokens - 1 - (2+inst_len) - diag_len - (4+pad_len)``.
"""

from __future__ import annotations

from pathlib import Path

import h5py
import numpy as np

from phantom_vlb_tpu.core.geometry import VIDEO_TOKEN_ID, VLBGeometry
from phantom_vlb_tpu.data.schemas import FeatureEpisode, write_feature_episode

__all__ = [
    "TEST_GEOMETRY",
    "synth_language_row",
    "synth_feature_episode",
    "write_synthetic_features_file",
    "write_synthetic_bold_file",
]

# Tiny geometry obeying all production invariants: 27 vision tokens
# (3 ds-frames x 9 tokens), 38 text tokens, multimodal seq 64.
TEST_GEOMETRY = VLBGeometry(
    tr=1.49,
    frames_per_tr=2,
    window=2,
    delay=1,
    model_max_length=64,
    image_size=56,
    patch_size=14,
    onsets_width=16,
    num_parcels=8,
)
TEST_GEOMETRY.validate()

JOINER_PRE = 2   # '\n' after <video> (extractfeatures.py:278-281)
JOINER_POST = 4  # '[/INST]' tail


def synth_language_row(
    geom: VLBGeometry,
    rng: np.random.Generator,
    tr_time: float,
    vocab_size: int = 1000,
    inst_len: int = 4,
):
    """One TR's (token_ids, onsets, maskvals) honoring the layout contract."""
    max_diag = min(
        geom.onsets_width,
        geom.max_lang_tokens - 1 - JOINER_PRE - inst_len - JOINER_POST - 2,
    )
    diag_len = int(rng.integers(2, max_diag + 1))
    budget = geom.max_lang_tokens - 1 - JOINER_PRE - inst_len - diag_len - JOINER_POST
    pad_len = int(rng.integers(0, max(1, budget - 1)))
    prefix_len = budget - pad_len
    assert prefix_len >= 1

    def toks(n):
        return rng.integers(3, vocab_size, size=n, dtype=np.int64)

    ids = np.concatenate(
        [
            toks(prefix_len),
            np.array([VIDEO_TOKEN_ID], dtype=np.int64),
            toks(JOINER_PRE + inst_len),
            toks(diag_len),
            toks(JOINER_POST),
            np.zeros(pad_len, dtype=np.int64),
        ]
    )
    assert ids.shape == (geom.max_lang_tokens,)

    # Dialogue token onsets: inside the current window, before the TR end.
    onsets = np.zeros(geom.onsets_width, dtype=np.float64)
    onsets[:diag_len] = np.sort(
        rng.uniform(max(0.0, tr_time - geom.window * geom.tr), tr_time, size=diag_len)
    )
    maskvals = np.array([pad_len, inst_len, diag_len], dtype=np.int64)
    return ids, onsets, maskvals


def synth_feature_episode(
    geom: VLBGeometry,
    n_tr: int,
    rng: np.random.Generator,
    vocab_size: int = 1000,
) -> FeatureEpisode:
    ids_rows, onset_rows, mask_rows = [], [], []
    for i in range(n_tr):
        tr_time = (i + 1) * geom.tr
        ids, onsets, maskvals = synth_language_row(geom, rng, tr_time, vocab_size)
        ids_rows.append(ids)
        onset_rows.append(onsets)
        mask_rows.append(maskvals)

    video = rng.standard_normal(
        (n_tr, geom.num_frames, 3, geom.image_size, geom.image_size)
    ).astype(np.float32)

    return FeatureEpisode(
        transcript_features=np.stack(ids_rows),
        transcript_onsets=np.stack(onset_rows),
        masking_params=np.stack(mask_rows),
        video_features=video,
    )


def write_synthetic_features_file(
    path: str | Path,
    episodes: dict[str, int],
    geom: VLBGeometry,
    seed: int = 0,
    vocab_size: int = 1000,
) -> None:
    rng = np.random.default_rng(seed)
    for ep_name, n_tr in episodes.items():
        ep = synth_feature_episode(geom, n_tr, rng, vocab_size)
        write_feature_episode(path, ep_name, ep)


def write_synthetic_bold_file(
    path: str | Path,
    episodes: dict[str, int],
    geom: VLBGeometry,
    seed: int = 1,
) -> None:
    """Subject BOLD file with run keys shaped like the CNeuroMod layout.

    Run name ``ses-XXX_task-<episode>`` parses back to the episode id via the
    reference's key expression (lazyloading.py:56-59).
    """
    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        for i, (ep_name, n_tr) in enumerate(episodes.items()):
            ses = f.require_group(f"ses-{i + 1:03d}")
            # BOLD runs as long as the stimulus (features) stream.
            data = rng.standard_normal((n_tr, geom.num_parcels)).astype(np.float32)
            ses.create_dataset(f"ses-{i + 1:03d}_task-{ep_name}", data=data)
