"""Label-masking parity against the reference's _make_masks_* methods.

models/llava_next_video.py cannot be imported (weight-loading ctor, 3.12
dataclass breakage in its imports), so the three masking methods plus
tokenizer_image_token are extracted from its AST and executed as test oracles
against the same tokenizer, then compared with text/tokenizer.make_labels.
"""

import ast
import textwrap

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from grounded_video_llm_tpu.text.templates import (DEFAULT_IMAGE_TOKEN,
                                                   IGNORE_INDEX,
                                                   IMAGE_TOKEN_INDEX,
                                                   get_template)
from grounded_video_llm_tpu.text.tokenizer import (build_test_tokenizer,
                                                   make_labels,
                                                   tokenize_with_image)

REF = "/root/reference/models/llava_next_video.py"
_METHODS = ("_make_masks_llama3", "_make_masks_vicuna", "_make_masks_phi3",
            "tokenizer_image_token")


def _extract_oracles():
    src = open(REF).read()
    tree = ast.parse(src)
    ns = {"IGNORE_INDEX": IGNORE_INDEX, "IMAGE_TOKEN_INDEX": IMAGE_TOKEN_INDEX,
          "DEFAULT_IMAGE_TOKEN": DEFAULT_IMAGE_TOKEN, "torch": torch}
    found = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == "LLAVA_NEXT_VIDEO":
            for item in node.body:
                if isinstance(item, ast.FunctionDef) and item.name in _METHODS:
                    code = textwrap.dedent(ast.get_source_segment(src, item))
                    exec(compile(code, REF, "exec"), ns, found)
    assert set(found) == set(_METHODS)
    return found, ns


class _FakeSelf:
    """Just enough of LLAVA_NEXT_VIDEO for the extracted methods."""

    def __init__(self, oracles):
        self._oracles = oracles

    def tokenizer_image_token(self, prompt, tokenizer,
                              image_token_index=IMAGE_TOKEN_INDEX,
                              return_tensors=None):
        return self._oracles["tokenizer_image_token"](
            self, prompt, tokenizer, image_token_index, return_tensors)


CONVS = [
    [{"from": "human", "value": DEFAULT_IMAGE_TOKEN + "\nWhat happens?"},
     {"from": "gpt", "value": "A man drives."}],
    [{"from": "human", "value": DEFAULT_IMAGE_TOKEN + "\nQ1?"},
     {"from": "gpt", "value": "A1."},
     {"from": "human", "value": "Q2 longer question?"},
     {"from": "gpt", "value": "A2 with a longer answer."}],
    [{"from": "human", "value": "text only question"},
     {"from": "gpt", "value": "text only answer"}],
]


@pytest.mark.parametrize("llm,method", [("llama3", "_make_masks_llama3"),
                                        ("vicuna", "_make_masks_vicuna"),
                                        ("phi3.5", "_make_masks_phi3")])
@pytest.mark.parametrize("conv_idx", range(len(CONVS)))
def test_make_labels_matches_reference_masks(llm, method, conv_idx):
    oracles, _ = _extract_oracles()
    fake = _FakeSelf(oracles)
    tok = build_test_tokenizer(llm)
    template = get_template(llm)
    prompt = template.encode([dict(m) for m in CONVS[conv_idx]])

    ids = tokenize_with_image(prompt, tok)

    # oracle: torch path (make_labels body, reference llava_next_video.py:325-345)
    labels_t = torch.tensor(list(ids), dtype=torch.long)
    sep, eos_token = template.separator
    rounds = prompt.split(eos_token)
    want, _cur = oracles[method](fake, labels_t.clone(), tok, sep, 1, rounds)

    got = make_labels(ids, prompt, tok, template)
    np.testing.assert_array_equal(np.asarray(got), want.numpy())


def test_tokenizer_image_token_matches_reference():
    oracles, _ = _extract_oracles()
    fake = _FakeSelf(oracles)
    tok = build_test_tokenizer("phi3.5")
    for prompt in ("a" + DEFAULT_IMAGE_TOKEN + "b",
                   DEFAULT_IMAGE_TOKEN + "\nhello",
                   "no image here",
                   DEFAULT_IMAGE_TOKEN + " x " + DEFAULT_IMAGE_TOKEN):
        want = oracles["tokenizer_image_token"](fake, prompt, tok,
                                                IMAGE_TOKEN_INDEX, None)
        got = tokenize_with_image(prompt, tok)
        assert got == want, prompt
