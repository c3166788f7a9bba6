"""prep_text golden harness against a REAL HF fast tokenizer (VERDICT r2 #2).

Round 2's joiner/golden tests ran only against the hand-rolled
``SentencePieceTestTokenizer``.  Here the same contracts are driven through
a genuine ``tokenizers``-backed ``transformers.PreTrainedTokenizerFast``
(data/hf_tokenizer.py: real Rust BPE with byte fallback, the Llama
normalizer/decoder stack, TemplateProcessing BOS) AND through the real
``apply_chat_template`` jinja path — so the SP conventions the reference's
+2/+4 joiner constants encode (extractfeatures.py:278-281) are produced by
production machinery rather than transcribed by hand.  Only the literal
vocabulary remains local (the real VideoLLaMA2 tokenizer files are not
downloadable here; reference load: extractfeatures.py:186-195).
"""

import numpy as np
import pytest

from phantom_vlb_tpu.core.geometry import REFERENCE_GEOMETRY, VIDEO_TOKEN_ID
from phantom_vlb_tpu.data.hf_tokenizer import (
    build_llama_fast_tokenizer,
    hf_chat_template,
)
from phantom_vlb_tpu.data.text import (
    INSTRUCTION_TEXT,
    default_chat_template,
    derive_joiner_counts,
    prep_text,
    validate_joiner_counts,
)
from phantom_vlb_tpu.ops.weight_mask import JOINER_PRE, JOINER_POST


@pytest.fixture(scope="module")
def tok():
    return build_llama_fast_tokenizer()


@pytest.fixture(scope="module")
def tmpl(tok):
    return hf_chat_template(tok)


def test_llama_piece_shapes_from_real_machinery(tok):
    """The two facts behind the +2/+4 constants, produced by the Rust BPE
    engine (byte fallback + metaspace normalizer), not by a transcription."""
    assert tok.tokenize("\n") == ["▁", "<0x0A>"]
    assert tok.tokenize("x [/INST]")[-4:] == ["▁[", "/", "INST", "]"]
    # BOS only with add_special_tokens (TemplateProcessing post-processor).
    assert tok.encode("hi", add_special_tokens=True)[0] == tok.bos_token_id
    assert tok.bos_token_id not in tok.encode("hi", add_special_tokens=False)


def test_apply_chat_template_matches_default_template(tok, tmpl):
    """The jinja template through transformers renders byte-identically to
    data/text.py::default_chat_template (the injectable-template contract)."""
    sys_c, usr_c = "SYSMSG with words", "<video>\nuser text here"
    assert tmpl(sys_c, usr_c) == default_chat_template(sys_c, usr_c)


def test_derived_joiners_match_weight_mask_constants(tok, tmpl):
    assert derive_joiner_counts(tok, tmpl) == (JOINER_PRE, JOINER_POST)
    validate_joiner_counts(tok, tmpl)  # must not raise


def test_roundtrip_and_byte_fallback_decode(tok):
    """convert_tokens_to_string inverts tokenize through the real Llama
    decoder chain (Replace + ByteFallback + Fuse + Strip)."""
    text = "look at this\npivot [/INST] xqzzy don't"
    assert tok.convert_tokens_to_string(tok.tokenize(text)) == text


def test_per_word_retokenization_invariant(tok, tmpl):
    """prep_text's onset assignment re-tokenizes each word standalone and
    asserts the counts sum to the full-line tokenization — exercised here
    with apostrophes, punctuation, unknown words and multi-piece splits."""
    words = ["well", "don't", "y'know.", "umm-hmm!", "xqzzy"]
    onsets = [0.1, 0.2, 0.3, 0.4, 0.5]
    prepped = prep_text(
        "ctx", " ".join(words) + " ", [words], [onsets],
        tok, REFERENCE_GEOMETRY.max_lang_tokens, tmpl,
    )
    # every token got its word's onset, grouped in word order
    assert prepped.token_onsets[0] == 0.1 and prepped.token_onsets[-1] == 0.5
    counts = [len(tok.tokenize(w)) for w in words]
    expect = [o for o, c in zip(onsets, counts) for _ in range(c)]
    assert prepped.token_onsets == expect


def test_scene_tail_truncation_respects_budget(tok, tmpl):
    long_scene = " ".join(["pivot couch coffee xqzzy"] * 400)
    prepped = prep_text(
        long_scene, "hi there ", [["hi", "there"]], [[0.0, 0.7]],
        tok, REFERENCE_GEOMETRY.max_lang_tokens, tmpl,
    )
    assert len(prepped.input_ids) <= REFERENCE_GEOMETRY.max_lang_tokens
    # the truncated tail is the END of the scene context (tail-truncation)
    kept = tok.tokenize(long_scene)[-10:]
    tail_text = tok.convert_tokens_to_string(kept).strip()
    assert tail_text.endswith("xqzzy")


def test_language_weights_align_with_dialogue_tokens_hf(tok, tmpl):
    """Splice-position alignment (the weight-mask layout contract), same as
    test_text_joiner_parity.py but under the HF tokenizer."""
    g = REFERENCE_GEOMETRY
    words = ["look", "at", "this", "pivot"]
    prepped = prep_text(
        "some earlier scene dialogue", "look at this pivot ",
        [words], [[0.1, 0.2, 0.3, 0.4]], tok, g.max_lang_tokens, tmpl,
    )
    ids = prepped.input_ids
    diag_len = len(prepped.token_onsets)
    dialogue_ids = tok.encode(" ".join(words), add_special_tokens=False)
    assert len(dialogue_ids) == diag_len

    p = ids.index(VIDEO_TOKEN_ID)
    spliced = ids[:p] + [None] * g.num_vis_tokens + ids[p + 1:]
    lang_start = p + g.num_vis_tokens + JOINER_PRE + prepped.inst_len
    assert spliced[lang_start: lang_start + diag_len] == dialogue_ids
    assert len(spliced) - (lang_start + diag_len) == JOINER_POST


def test_golden_row_input_ids_hf(tok, tmpl):
    """Regression pin: exact ids under the HF tokenizer (deterministic
    vocab construction — no training — so stable across runs/versions)."""
    prepped = prep_text(
        "previous scene", "hi there ", [["hi", "there"]], [[0.0, 0.7]],
        tok, REFERENCE_GEOMETRY.max_lang_tokens, tmpl,
    )
    assert prepped.input_ids[0] == tok.bos_token_id
    assert prepped.input_ids.count(VIDEO_TOKEN_ID) == 1
    assert prepped.token_onsets == [0.0, 0.7]
    assert prepped.inst_len == len(tok.tokenize(INSTRUCTION_TEXT))
    import zlib

    digest = zlib.crc32(np.asarray(prepped.input_ids, np.int64).tobytes())
    assert digest == GOLDEN_CRC_HF, (
        f"golden row drifted: crc {digest} (update only if the template/"
        f"tokenizer change is intentional); ids={prepped.input_ids[:24]}..."
    )


# Recorded once from the HF-tokenizer pipeline (crc32 of the int64 id row).
GOLDEN_CRC_HF = 3844219019
