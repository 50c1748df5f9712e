"""Image-token splice, label masking, and padding semantics
(reference models/llava_next_video.py:325-452, 630-647)."""

import numpy as np
import pytest

from grounded_video_llm_tpu.text.templates import (DEFAULT_IMAGE_TOKEN,
                                                   IGNORE_INDEX,
                                                   IMAGE_TOKEN_INDEX,
                                                   get_template)
from grounded_video_llm_tpu.text.tokenizer import (build_test_tokenizer,
                                                   make_labels,
                                                   pad_batch_generate,
                                                   pad_batch_train,
                                                   tokenize_with_image)


def test_tokenize_with_image_places_index():
    tok = build_test_tokenizer("phi3.5")
    ids = tokenize_with_image("a" + DEFAULT_IMAGE_TOKEN + "b", tok)
    assert ids[0] == tok.bos_token_id
    assert ids.count(IMAGE_TOKEN_INDEX) == 1
    i = ids.index(IMAGE_TOKEN_INDEX)
    # 'a' before, 'b' after
    assert tok.decode(ids[1:i]) == "a"
    assert tok.decode(ids[i + 1:]) == "b"


def test_tokenize_no_image():
    tok = build_test_tokenizer("phi3.5")
    ids = tokenize_with_image("hello", tok)
    assert IMAGE_TOKEN_INDEX not in ids
    assert tok.decode(ids[1:]) == "hello"


def test_temporal_tokens_single_id():
    tok = build_test_tokenizer("phi3.5")
    ids = tok.encode("<150>", add_special_tokens=False)
    assert len(ids) == 1
    assert tok.decode(ids) == "<150>"


@pytest.mark.parametrize("llm", ["phi3.5", "llama3", "vicuna"])
def test_make_labels_masks_instructions_only(llm):
    tok = build_test_tokenizer(llm)
    template = get_template(llm)
    conv = [
        {"from": "human", "value": DEFAULT_IMAGE_TOKEN + "\nWhat happens?"},
        {"from": "gpt", "value": "A man drives."},
        {"from": "human", "value": "Where?"},
        {"from": "gpt", "value": "On a road."},
    ]
    prompt = template.encode(conv)
    ids = tokenize_with_image(prompt, tok)
    labels = make_labels(ids, prompt, tok, template)
    assert len(labels) == len(ids)
    # unmasked positions decode to the answers (+ eos markers)
    kept = [t for t in labels if t != IGNORE_INDEX]
    text = tok.decode(kept, skip_special_tokens=True)
    assert "A man drives." in text
    assert "On a road." in text
    assert "What happens?" not in text
    assert "Where?" not in text
    # every unmasked label equals its input id (shift happens in the loss)
    for l, t in zip(labels, ids):
        assert l == IGNORE_INDEX or l == t


@pytest.mark.parametrize("llm", ["phi3.5", "llama3"])
def test_make_labels_total_coverage(llm):
    """cur_len must land exactly on total_len — the reference warns otherwise
    (llava_next_video.py:340-343). With the byte tokenizer (1 token per byte,
    specials = 1) the arithmetic must be exact for llama3; phi3.5/vicuna use
    sentencepiece-specific offsets so only llama3 is exact here."""
    tok = build_test_tokenizer(llm)
    template = get_template(llm)
    conv = [
        {"from": "human", "value": DEFAULT_IMAGE_TOKEN + "\nQ1?"},
        {"from": "gpt", "value": "A1."},
    ]
    prompt = template.encode(conv)
    ids = tokenize_with_image(prompt, tok)
    labels = make_labels(ids, prompt, tok, template)
    # the final eos must be a target
    eos_positions = [i for i, t in enumerate(ids) if t == tok.eos_token_id]
    if llm == "llama3":
        assert labels[eos_positions[-1]] == tok.eos_token_id


def test_pad_batch_train_shapes_and_truncation():
    ids = [[1, 5, 6, 7], [1, 5]]
    labels = [[IGNORE_INDEX, 5, 6, 7], [IGNORE_INDEX, 5]]
    out_ids, out_labels, out_mask = pad_batch_train(
        ids, labels, pad_token_id=0, eos_token_id=2, max_txt_len=3)
    assert out_ids.shape == (2, 3)
    assert out_labels[0, -1] == 2  # truncated row forced to eos
    assert out_labels[1, -1] == IGNORE_INDEX
    assert out_mask.tolist() == [[1, 1, 1], [1, 1, 0]]


def test_pad_batch_train_bucket_rounding():
    ids = [[1, 5, 6, 7, 8]]
    labels = [[5] * 5]
    out_ids, _, mask = pad_batch_train(ids, labels, 0, 2, max_txt_len=2048,
                                       pad_to=128)
    assert out_ids.shape == (1, 128)
    assert mask.sum() == 5


def test_pad_batch_generate_left_pads():
    ids = [[1, 5, 6, 7], [1, 9]]
    out, mask = pad_batch_generate(ids, pad_token_id=0, max_txt_len=10)
    assert out.shape == (2, 4)
    assert out[0].tolist() == [1, 5, 6, 7]
    assert out[1].tolist() == [0, 0, 1, 9]
    assert mask[1].tolist() == [0, 0, 1, 1]


def test_pad_batch_generate_truncates_keep_tail():
    ids = [[1, 5, 6, 7, 8, 9]]
    out, mask = pad_batch_generate(ids, pad_token_id=0, max_txt_len=3)
    assert out[0].tolist() == [7, 8, 9]  # flip-truncate keeps the tail
    assert mask[0].tolist() == [1, 1, 1]


def test_byte_tokenizer_roundtrip_unicode():
    tok = build_test_tokenizer("phi3.5")
    s = "café 中文 <42>"
    assert tok.decode(tok.encode(s, add_special_tokens=False)) == s
