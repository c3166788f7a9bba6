"""Stage 1 — feature extraction: transcripts + video -> per-season HDF5.

Orchestration contract with ``videollama2_vlb_extractfeatures.py:352-508``:
input triplets are matched as ``friends_*.tsv`` transcripts +
``friends_*.mkv`` videos + ``*_manualseg.tsv`` scene files (:89-110);
episode-level resume skips episodes already in the output file (:113-126);
per episode the text loop writes ``transcript_features`` /
``transcript_onsets`` / ``masking_params`` and the video loop writes
``video_features`` (gzip-4).

TPU-native deltas: the video decoder is the native C++ libav reader
(``data/video_reader.py``; decord replacement, SURVEY.md §2.10) streaming
sequentially with a frame ring buffer — each frame is decoded exactly once
across the overlapping TR windows; text and video for an episode can run
concurrently (thread pool) since they touch disjoint datasets.
"""

from __future__ import annotations

import dataclasses
import glob as globlib
import os

import numpy as np
from pathlib import Path
from typing import Callable

from phantom_vlb_tpu.core.geometry import VLBGeometry
from phantom_vlb_tpu.data.schemas import FeatureEpisode, list_feature_episodes, write_feature_episode
from phantom_vlb_tpu.data.text import (
    TokenizerProtocol,
    TranscriptProcessor,
    default_chat_template,
    get_scene_onsets,
)
from phantom_vlb_tpu.data.video import (
    VideoSource,
    extract_video_chunk,
    extract_video_features,
    tr_end_times,
)

__all__ = ["ExtractConfig", "get_input_paths", "extract_episode", "extract_features"]


@dataclasses.dataclass
class ExtractConfig:
    input_transcript_path: str
    input_seg_path: str
    input_video_path: str
    lazy_load_path: str              # output features .h5 (reference arg name)
    geometry: VLBGeometry = dataclasses.field(default_factory=VLBGeometry)
    # 'batched': unique-frame dedup + chunked preprocess (least work; best on
    # hosts with real memory backing); 'per_tr': the reference's loop shape —
    # small recycled buffers, fastest on lazy-memory/low-RAM hosts
    # (BENCHMARKS.md extraction notes). Outputs are byte-identical.
    video_mode: str = "batched"


def get_input_paths(config: ExtractConfig) -> dict[str, dict[str, str]]:
    """Episode -> {transcript, seg, video} path triplets (:89-110)."""
    transcript_path = str(Path(config.input_transcript_path).resolve())
    segmentation_path = str(Path(config.input_seg_path).resolve())
    video_path = str(Path(config.input_video_path).resolve())

    input_paths: dict[str, dict[str, str]] = {}
    for tr_file in sorted(globlib.glob(f"{transcript_path}/friends_*.tsv")):
        ep_num = os.path.basename(tr_file).split("_")[-1].split(".")[0]
        v_path = f"{video_path}/friends_{ep_num}.mkv"
        # Scene files use unpadded season numbers (s01 -> s1), :101.
        s_path = (f"{segmentation_path}/friends_{ep_num}_manualseg.tsv").replace(
            "s0", "s"
        )
        if Path(v_path).exists() and Path(s_path).exists():
            input_paths[ep_num] = {
                "transcript": tr_file,
                "seg": s_path,
                "video": v_path,
            }
    return input_paths


def extract_episode(
    transcript_df,
    seg_df,
    video_source: VideoSource,
    geometry: VLBGeometry,
    tokenizer: TokenizerProtocol,
    chat_template: Callable[[str, str], str] = default_chat_template,
    preprocess_batch=None,
    video_mode: str = "batched",
) -> FeatureEpisode:
    """Full single-episode extraction (text + video).

    ``preprocess_batch`` selects the frame-preprocessing backend: None = host
    thread pool (byte-parity path); ``ops.preprocess.DevicePreprocessor`` =
    fused TPU pad/resize/normalize.
    """
    processor = TranscriptProcessor(tokenizer, geometry, chat_template)
    scene_onsets = get_scene_onsets(seg_df)
    tokens, onsets, maskvals = processor.process_episode(transcript_df, scene_onsets)

    if video_mode == "per_tr":
        duration = video_source.num_frames / video_source.fps
        video = np.stack([
            extract_video_chunk(video_source, t, geometry)
            for t in tr_end_times(duration, geometry.tr)
        ])
    else:
        video = extract_video_features(
            video_source, geometry, preprocess_batch=preprocess_batch
        )
    return FeatureEpisode(
        transcript_features=tokens,
        transcript_onsets=onsets,
        masking_params=maskvals,
        video_features=video,
    )


def extract_features(
    config: ExtractConfig,
    tokenizer: TokenizerProtocol,
    open_video: Callable[[str], VideoSource],
    chat_template: Callable[[str, str], str] = default_chat_template,
    progress: Callable[[str], None] = lambda s: None,
) -> list[str]:
    """Season-level extraction with episode resume; returns episodes written."""
    import pandas as pd

    out_path = str(Path(config.lazy_load_path).resolve())
    done = set(list_feature_episodes(out_path))
    inputs = get_input_paths(config)

    written: list[str] = []
    for ep_num, paths in inputs.items():
        if ep_num in done:
            continue
        progress(f"extracting {ep_num}")
        transcript_df = pd.read_csv(paths["transcript"], sep="\t")
        seg_df = pd.read_csv(paths["seg"], sep="\t")
        source = open_video(paths["video"])
        episode = extract_episode(
            transcript_df, seg_df, source, config.geometry, tokenizer,
            chat_template, video_mode=config.video_mode,
        )
        write_feature_episode(out_path, ep_num, episode)
        written.append(ep_num)
        close = getattr(source, "close", None)
        if close:
            close()
    return written
