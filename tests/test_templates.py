"""Chat-template parity with reference datasets/chat/base_template.py.

The reference module can't be imported under Python 3.12 (mutable dataclass
defaults), so the slot strings are extracted from its AST and compared against
our template fields, plus golden-rendered prompts."""

import ast

import pytest

from grounded_video_llm_tpu.text.templates import (DEFAULT_IMAGE_TOKEN,
                                                   GROUNDING_TOKEN, TEMPLATES)

REF = "/root/reference/datasets/chat/base_template.py"


def _literal(node):
    """Evaluate a slot expression: constant, 'a'+'b' concatenation, or list."""
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Add):
        return _literal(node.left) + _literal(node.right)
    if isinstance(node, (ast.List, ast.Tuple)):
        return [_literal(e) for e in node.elts]
    if isinstance(node, ast.Name):
        return {"DEFAULT_IMAGE_TOKEN": DEFAULT_IMAGE_TOKEN,
                "GROUNDING_TOKEN": GROUNDING_TOKEN}[node.id]
    raise ValueError(ast.dump(node))


def _extract_slots(class_name):
    tree = ast.parse(open(REF).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == class_name:
            slots = {}
            for stmt in node.body:
                if isinstance(stmt, ast.AnnAssign) and stmt.value is not None:
                    field = stmt.target.id
                    call = stmt.value  # StringFormatter(slot=...) etc.
                    for kw in call.keywords:
                        if kw.arg == "slot":
                            slots[field] = _literal(kw.value)
            return slots
    raise KeyError(class_name)


REF_CLASSES = {"phi3.5": "Phi_3_5_Template", "llama3": "LLaMA3_Template",
               "vicuna": "Vicuna_Template"}


@pytest.mark.parametrize("llm", list(REF_CLASSES))
def test_slot_parity(llm):
    slots = _extract_slots(REF_CLASSES[llm])
    t = TEMPLATES[llm]
    assert t.system == slots["system"]
    assert t.user_fmt == slots["format_user"].replace("{{content}}", "{content}")
    assert t.assistant_fmt == slots["format_assistant"].replace("{{content}}",
                                                                "{content}")
    assert t.image_token_fmt == slots["format_image_token"].replace("{{content}}",
                                                                    "{content}")
    assert list(t.separator) == slots["separator"]


def test_phi35_golden_render():
    conv = [{"from": "human", "value": DEFAULT_IMAGE_TOKEN + "\nWhat happens?"},
            {"from": "gpt", "value": "A man drives."}]
    out = TEMPLATES["phi3.5"].encode(conv)
    assert out == ("<|system|>\nYou are a helpful AI assistant that can generate "
                   "responses based on visual inputs."
                   "\n<|user|>\n<image>\nWhat happens?"
                   "\n<|assistant|>\nA man drives.<|endoftext|>")


def test_grounding_token_suppresses_image_reformat():
    # reference base_template.py:105-107: with GROUNDING_TOKEN present the
    # question passes through verbatim (image token stays where the caller put it)
    q = DEFAULT_IMAGE_TOKEN + " " + GROUNDING_TOKEN + "\nWhen does he jump?"
    conv = [{"from": "human", "value": q}, {"from": "gpt", "value": "<10> <20>"}]
    out = TEMPLATES["phi3.5"].encode(conv)
    assert "\n<|user|>\n" + q in out


def test_leading_gpt_message_dropped():
    conv = [{"from": "gpt", "value": "system-ish"},
            {"from": "human", "value": "Q"},
            {"from": "gpt", "value": "A"}]
    out = TEMPLATES["phi3.5"].encode(conv)
    assert "system-ish" not in out
    assert "\n<|user|>\nQ" in out


def test_generation_prompt_strips_eos():
    conv = [{"from": "human", "value": DEFAULT_IMAGE_TOKEN + "\nDescribe."},
            {"from": "gpt", "value": ""}]
    t = TEMPLATES["phi3.5"]
    prompt = t.encode_for_generation(conv)
    assert t.eos not in prompt
    assert prompt.endswith("<|assistant|>\n")
