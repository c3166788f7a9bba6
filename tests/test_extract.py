"""Stage-1 extraction tests: text windows, frame sampling, full pipeline."""

import numpy as np
import pandas as pd
import pytest

from phantom_vlb_tpu.core.geometry import VIDEO_TOKEN_ID
from phantom_vlb_tpu.data.extract import ExtractConfig, extract_episode, extract_features, get_input_paths
from phantom_vlb_tpu.data.schemas import read_feature_episode, validate_features_file
from phantom_vlb_tpu.core.geometry import VLBGeometry
from phantom_vlb_tpu.data.synthetic import TEST_GEOMETRY
from phantom_vlb_tpu.data.text import (
    WordPieceTestTokenizer,
    get_scene_onsets,
    prep_text,
    tokenize_multimodal,
)
from phantom_vlb_tpu.data.video import (
    ArrayVideoSource,
    CLIP_MEAN,
    clip_preprocess,
    expand2square,
    extract_video_chunk,
    frame_sample,
    tr_end_times,
    tr_window_indices,
)


# Extraction needs a real text budget (the fixed prompt alone is ~60 test
# tokens); same visual geometry as TEST_GEOMETRY but max_lang_tokens=230.
EXTRACT_GEOMETRY = VLBGeometry(
    tr=1.49, frames_per_tr=2, window=2, delay=1, model_max_length=256,
    image_size=56, patch_size=14, onsets_width=16, num_parcels=8,
)
EXTRACT_GEOMETRY.validate()


def _transcript_df(n_tr, geom, with_gaps=True):
    rows = []
    for i in range(n_tr):
        if with_gaps and i % 4 == 3:
            rows.append({"text_per_tr": np.nan, "words_per_tr": np.nan, "onsets_per_tr": np.nan})
        else:
            words = [f"word{i}a", f"word{i}b"]
            onsets = [round(i * geom.tr + 0.1, 3), round(i * geom.tr + 0.7, 3)]
            rows.append({
                "text_per_tr": " ".join(words) + " ",
                "words_per_tr": str(words),
                "onsets_per_tr": str(onsets),
            })
    return pd.DataFrame(rows)


def _seg_df(n_tr, geom):
    half = n_tr * geom.tr / 2
    return pd.DataFrame({
        "scene": [1, 1, 2, 2],
        "onset": [0.0, half * 0.5, half, half * 1.5],
    })


def test_scene_onsets():
    df = _seg_df(8, TEST_GEOMETRY)
    assert get_scene_onsets(df) == [0.0, df["onset"].iloc[2]]


def test_prep_text_contract():
    tok = WordPieceTestTokenizer()
    geom = EXTRACT_GEOMETRY
    out = prep_text(
        "earlier scene words here",
        "hello world ",
        [["hello", "world"]],
        [[1.0, 1.5]],
        tok,
        geom.max_lang_tokens,
    )
    ids = out.input_ids
    assert ids.count(VIDEO_TOKEN_ID) == 1
    assert len(out.token_onsets) == len(tok.tokenize("hello world"))
    # Layout: [prefix..., -201, 2 joiner-ish..., instr, dialogue, tail]
    p = ids.index(VIDEO_TOKEN_ID)
    assert p > 0
    assert out.inst_len == len(tok.tokenize("Here are the words spoken in the video:"))


def test_prep_text_no_dialogue():
    tok = WordPieceTestTokenizer()
    out = prep_text("", "", [[]], [[]], tok, TEST_GEOMETRY.max_lang_tokens)
    assert out.token_onsets == [0.5, 1.0]  # dummy onsets (:244)


def test_frame_sample_uniform():
    # 12 of 100: deterministic reference values.
    idx = frame_sample(100, 12)
    assert len(idx) == 12
    assert idx[0] == int((99 / 12) / 2)
    assert all(0 <= i < 100 for i in idx)
    assert idx == sorted(idx)


def test_tr_window_indices_bounds():
    g = TEST_GEOMETRY
    fps, nf = 30.0, 1000
    idx = tr_window_indices(5.96, g.window, fps, nf, g.tr, g.frames_per_tr)
    assert len(idx) == g.num_frames
    start = max(int((5.96 - g.window * g.tr) * fps) - 1, 0)
    end = min(int(5.96 * fps) - 1, nf - 1)
    assert all(start <= i <= end for i in idx)


def test_tr_window_head_of_episode():
    """First TR: window truncated, fewer sampled frames (padded later)."""
    g = TEST_GEOMETRY
    idx = tr_window_indices(g.tr, g.window, 30.0, 1000, g.tr, g.frames_per_tr)
    assert len(idx) == g.frames_per_tr  # one TR worth


def test_expand2square():
    img = np.full((20, 30, 3), 7, np.uint8)
    sq = expand2square(img, (1, 2, 3))
    assert sq.shape == (30, 30, 3)
    assert (sq[0, 0] == [1, 2, 3]).all()
    assert (sq[15, 15] == 7).all()


def test_clip_preprocess_range():
    img = np.zeros((56, 56, 3), np.uint8)
    out = clip_preprocess([img], 56)
    np.testing.assert_allclose(
        out[0, :, 0, 0],
        (0 - CLIP_MEAN) / np.array([0.26862954, 0.26130258, 0.27577711]),
        atol=1e-5,
    )


def test_extract_video_chunk_pads_black():
    g = TEST_GEOMETRY
    rng = np.random.default_rng(0)
    src = ArrayVideoSource(rng.integers(0, 255, (500, 48, 64, 3), dtype=np.uint8), 30.0)
    out = extract_video_chunk(src, g.tr, g)  # first TR -> needs padding
    assert out.shape == (g.num_frames, 3, g.image_size, g.image_size)
    # Last frames are black padding: the image interior is normalized zeros
    # (the square-pad border carries the CLIP-mean fill, i.e. ~0).
    black = (0 - CLIP_MEAN[0]) / 0.26862954
    assert abs(out[-1, 0, 28, 28] - black) < 0.2


def test_extract_episode_end_to_end():
    g = EXTRACT_GEOMETRY
    rng = np.random.default_rng(1)
    n_tr = 8
    duration_frames = int(n_tr * g.tr * 30) + 30
    src = ArrayVideoSource(
        rng.integers(0, 255, (duration_frames, 48, 64, 3), dtype=np.uint8), 30.0
    )
    df = _transcript_df(n_tr, g)
    seg = _seg_df(n_tr, g)
    ep = extract_episode(df, seg, src, g, WordPieceTestTokenizer())
    ep.validate(g)
    assert ep.transcript_features.shape[0] == n_tr
    # Every row has exactly one modal token.
    assert (ep.transcript_features == VIDEO_TOKEN_ID).sum(axis=1).tolist() == [1] * n_tr
    # masking params coherent: pad + used = width.
    pad, inst, diag = ep.masking_params[0]
    assert 0 < diag <= g.onsets_width


def test_extract_features_resume(tmp_path):
    """Episode-level resume (extractfeatures.py:113-126)."""
    g = EXTRACT_GEOMETRY
    for sub in ("transcripts", "segs", "videos"):
        (tmp_path / sub).mkdir()
    rng = np.random.default_rng(2)
    n_tr = 6
    for ep in ("s01e01a", "s01e01b"):
        _transcript_df(n_tr, g).to_csv(
            tmp_path / "transcripts" / f"friends_{ep}.tsv", sep="\t", index=False
        )
        _seg_df(n_tr, g).to_csv(
            tmp_path / "segs" / f"friends_{ep.replace('s0', 's')}_manualseg.tsv",
            sep="\t", index=False,
        )
        (tmp_path / "videos" / f"friends_{ep}.mkv").write_bytes(b"placeholder")

    frames = rng.integers(0, 255, (int(n_tr * g.tr * 30) + 40, 48, 64, 3), dtype=np.uint8)
    cfg = ExtractConfig(
        str(tmp_path / "transcripts"), str(tmp_path / "segs"),
        str(tmp_path / "videos"), str(tmp_path / "features.h5"), g,
    )
    assert set(get_input_paths(cfg)) == {"s01e01a", "s01e01b"}

    opened = []

    def open_video(path):
        opened.append(path)
        return ArrayVideoSource(frames, 30.0)

    tok = WordPieceTestTokenizer()
    written = extract_features(cfg, tok, open_video)
    assert sorted(written) == ["s01e01a", "s01e01b"]
    validate_features_file(tmp_path / "features.h5", g)

    # Second run: resume skips everything.
    opened.clear()
    assert extract_features(cfg, tok, open_video) == []
    assert opened == []


def _season_fixture(tmp_path, episodes, n_tr, g):
    for sub in ("transcripts", "segs", "videos"):
        (tmp_path / sub).mkdir(exist_ok=True)
    for ep in episodes:
        _transcript_df(n_tr, g).to_csv(
            tmp_path / "transcripts" / f"friends_{ep}.tsv", sep="\t", index=False
        )
        _seg_df(n_tr, g).to_csv(
            tmp_path / "segs" / f"friends_{ep.replace('s0', 's')}_manualseg.tsv",
            sep="\t", index=False,
        )
        (tmp_path / "videos" / f"friends_{ep}.mkv").write_bytes(b"placeholder")
    rng = np.random.default_rng(3)
    frames = rng.integers(
        0, 255, (int(n_tr * g.tr * 30) + 40, 48, 64, 3), dtype=np.uint8
    )
    return frames


def test_extract_features_pooled_matches_serial(tmp_path):
    """--jobs N (episode process pool): same bytes, same resume contract.

    The reference gets its extraction parallelism from 32 CPUs feeding
    decord (vllama2_vlb_extract_features.sh:6-9); ours from a fork pool
    over independent episodes with per-episode part files merged into the
    season HDF5 as workers finish."""
    g = EXTRACT_GEOMETRY
    eps = ["s01e01a", "s01e01b", "s01e01c"]
    n_tr = 6
    frames = _season_fixture(tmp_path, eps, n_tr, g)
    tok = WordPieceTestTokenizer()
    open_video = lambda path: ArrayVideoSource(frames, 30.0)  # noqa: E731

    cfg_s = ExtractConfig(
        str(tmp_path / "transcripts"), str(tmp_path / "segs"),
        str(tmp_path / "videos"), str(tmp_path / "serial.h5"), g,
    )
    cfg_p = ExtractConfig(
        str(tmp_path / "transcripts"), str(tmp_path / "segs"),
        str(tmp_path / "videos"), str(tmp_path / "pooled.h5"), g,
    )
    # a stale part file from a "killed" earlier run must be ignored/replaced
    (tmp_path / "pooled.h5.part-s01e01b.h5").write_bytes(b"garbage")

    assert extract_features(cfg_s, tok, open_video) == eps
    assert extract_features(cfg_p, tok, open_video, jobs=2) == eps
    validate_features_file(tmp_path / "pooled.h5", g)
    for ep in eps:
        a = read_feature_episode(tmp_path / "serial.h5", ep)
        b = read_feature_episode(tmp_path / "pooled.h5", ep)
        for field in ("transcript_features", "transcript_onsets",
                      "masking_params", "video_features"):
            np.testing.assert_array_equal(getattr(a, field), getattr(b, field))
    # no part files left behind
    assert not list(tmp_path.glob("pooled.h5.part-*"))

    # Resume interplay: drop one episode group, pooled rerun restores ONLY it.
    import h5py

    with h5py.File(tmp_path / "pooled.h5", "a") as f:
        del f["s01e01b"]
    assert extract_features(cfg_p, tok, open_video, jobs=2) == ["s01e01b"]
    validate_features_file(tmp_path / "pooled.h5", g)


def test_extract_features_pooled_failure_commits_completed(tmp_path):
    """A failing episode fails the run but completed episodes stay committed."""
    g = EXTRACT_GEOMETRY
    eps = ["s01e01a", "s01e01b"]
    frames = _season_fixture(tmp_path, eps, 6, g)
    tok = WordPieceTestTokenizer()

    def open_video(path):
        if "s01e01b" in path:
            raise RuntimeError("corrupt mkv")
        return ArrayVideoSource(frames, 30.0)

    cfg = ExtractConfig(
        str(tmp_path / "transcripts"), str(tmp_path / "segs"),
        str(tmp_path / "videos"), str(tmp_path / "out.h5"), g,
    )
    with pytest.raises(RuntimeError, match="s01e01b"):
        extract_features(cfg, tok, open_video, jobs=2)
    from phantom_vlb_tpu.data.schemas import list_feature_episodes

    assert list_feature_episodes(tmp_path / "out.h5") == ["s01e01a"]
    # rerun with a fixed source resumes just the failed episode
    ok_video = lambda path: ArrayVideoSource(frames, 30.0)  # noqa: E731
    assert extract_features(cfg, tok, ok_video, jobs=2) == ["s01e01b"]
