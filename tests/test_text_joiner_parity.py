"""Chat-template / tokenizer joiner parity (VERDICT round 1, missing #2).

The reference hard-codes +2/+4 joiner token counts between the spliced video
tokens, the instruction, the dialogue, and the sequence end
(litmodule.py:184-202; its own comment at extractfeatures.py:278-281 spells
out the pieces: '\\n' -> ['▁', '<0x0A>'], ' [/INST]' -> ['▁[','/','INST',']']).
These tests pin that accounting with an SP-faithful fixture tokenizer and
verify the end-to-end alignment invariant the weight mask relies on: the k-th
language HRF weight must land exactly on the k-th dialogue token.
"""

import numpy as np

from phantom_vlb_tpu.core.geometry import VIDEO_TOKEN_ID, REFERENCE_GEOMETRY
from phantom_vlb_tpu.data.text import (
    INSTRUCTION_TEXT,
    SentencePieceTestTokenizer,
    default_chat_template,
    derive_joiner_counts,
    prep_text,
    validate_joiner_counts,
)
from phantom_vlb_tpu.ops.weight_mask import JOINER_PRE, JOINER_POST


TOK = SentencePieceTestTokenizer()


def test_sp_fixture_reproduces_llama_piece_shapes():
    # The two facts the reference's comment documents (extractfeatures.py:278-281).
    assert TOK.tokenize("\n")[:2] == ["▁", "<0x0A>"]
    assert TOK.tokenize("x [/INST]")[1:] == ["▁[", "/", "INST", "]"]


def test_derived_joiners_match_weight_mask_constants():
    assert derive_joiner_counts(TOK, default_chat_template) == (
        JOINER_PRE,
        JOINER_POST,
    )
    validate_joiner_counts(TOK, default_chat_template)  # must not raise


def test_validate_rejects_drifting_tokenizer():
    # A tokenizer that swallows newlines (like str.split) breaks the +2
    # accounting; the CLI guard must catch it.
    from phantom_vlb_tpu.data.text import WordPieceTestTokenizer

    import pytest

    with pytest.raises(ValueError, match="joiner token counts"):
        validate_joiner_counts(WordPieceTestTokenizer(), default_chat_template)


def test_language_weights_align_with_dialogue_tokens():
    """End-to-end: splice positions vs weight-mask layout.

    Builds a real prompt with prep_text, splices 1183 video positions at the
    sentinel, and checks that positions flagged by the weight-mask layout
    formula [video][pre][inst][diag][post][pad] hold exactly the dialogue
    token ids."""
    g = REFERENCE_GEOMETRY
    words = ["look", "at", "this", "pivot"]
    onsets = [0.1, 0.2, 0.3, 0.4]
    prepped = prep_text(
        "some earlier scene dialogue", "look at this pivot ",
        [words], [onsets], TOK, g.max_lang_tokens, default_chat_template,
    )
    ids = prepped.input_ids
    diag_len = len(prepped.token_onsets)
    dialogue_ids = TOK.encode(" ".join(words), add_special_tokens=False)
    assert len(dialogue_ids) == diag_len

    p = ids.index(VIDEO_TOKEN_ID)
    # Spliced sequence: ids[:p] + V video positions + ids[p+1:].
    spliced = ids[:p] + [None] * g.num_vis_tokens + ids[p + 1:]
    video_end = p + g.num_vis_tokens
    lang_start = video_end + JOINER_PRE + prepped.inst_len
    assert spliced[lang_start : lang_start + diag_len] == dialogue_ids
    # Post-joiner accounting: exactly JOINER_POST tokens remain.
    assert len(spliced) - (lang_start + diag_len) == JOINER_POST

    # And the vectorized training-side mask places the weights there too.
    import jax.numpy as jnp

    from phantom_vlb_tpu.ops.weight_mask import build_weight_mask

    pad_len = g.max_lang_tokens - len(ids)
    padvals = jnp.asarray([[pad_len, prepped.inst_len, diag_len]])
    vis_w = jnp.zeros((1, g.num_ds_frames))
    lang_w = jnp.zeros((1, g.onsets_width)).at[0, :diag_len].set(
        jnp.arange(1.0, diag_len + 1.0)
    )
    mask = np.asarray(
        build_weight_mask(padvals, vis_w, lang_w, g)
    )[0]
    # Right padding shifts the whole trial left by pad_len relative to the
    # unpadded splice; the reference left-pads to feature_len (litmodule:202).
    start = g.feature_len - (len(spliced) + pad_len) + lang_start
    np.testing.assert_array_equal(
        mask[start : start + diag_len], np.arange(1.0, diag_len + 1.0)
    )
    assert mask[:start].sum() == 0  # vis weights were zero
    assert mask[start + diag_len:].sum() == 0


def test_golden_row_input_ids():
    """Regression pin: exact ids under the fixture tokenizer (crc32-stable)."""
    prepped = prep_text(
        "previous scene", "hi there ", [["hi", "there"]], [[0.0, 0.7]],
        TOK, REFERENCE_GEOMETRY.max_lang_tokens, default_chat_template,
    )
    expected_prefix = [TOK.bos_token_id] + [
        TOK._piece_id(p)
        for p in TOK.tokenize("[INST] <<SYS>>\nThis video")
    ]
    assert prepped.input_ids[: len(expected_prefix)] == expected_prefix
    assert prepped.input_ids.count(VIDEO_TOKEN_ID) == 1
    assert prepped.token_onsets == [0.0, 0.7]
    # Whole-row golden hash (stable across processes: crc32 ids).
    import zlib

    digest = zlib.crc32(np.asarray(prepped.input_ids, np.int64).tobytes())
    assert digest == GOLDEN_CRC, (
        f"golden row drifted: crc {digest} (update only if the template/"
        f"tokenizer change is intentional); ids={prepped.input_ids[:24]}..."
    )


# Recorded once from the fixture pipeline (crc32 of the int64 id row); any
# template or tokenizer change must update this deliberately.
GOLDEN_CRC = 348625642
