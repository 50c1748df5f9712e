"""Temporal-token codec parity against the reference's own functions,
AST-extracted from datasets/mix_sft.py (convert_time_position,
detect_timestamp_response) and inference.py (parse_time_interval, the
referring-query quantizer) — the modules themselves import decord/av."""

import ast
import re
import textwrap

import numpy as np
import pytest

from grounded_video_llm_tpu.text import codec
from grounded_video_llm_tpu.text.templates import (DEFAULT_IMAGE_TOKEN,
                                                   GROUNDING_TOKEN)


def _extract_function(path, name):
    src = open(path).read()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == name:
            ns = {"re": re, "DEFAULT_IMAGE_TOKEN": DEFAULT_IMAGE_TOKEN,
                  "GROUNDING_TOKEN": GROUNDING_TOKEN}
            exec(compile(textwrap.dedent(ast.get_source_segment(src, node)),
                         path, "exec"), ns)
            return ns[name]
    raise AssertionError(f"{name} not found in {path}")


class _FakeDataset:
    def __init__(self, num_temporal_tokens=300):
        self.num_temporal_tokens = num_temporal_tokens


@pytest.mark.parametrize("answer,duration", [
    ("From <12.5> to <30.0>.", 60.0),
    ("<0.0> <59.99> <60.0> <75.0>", 60.0),
    ("Events at <3> and <-1.0>.", 60.0),
    ("no timestamps here", 100.0),
    ("<12.345> seconds into it", 37.7),
])
def test_convert_time_position_parity(answer, duration):
    ref = _extract_function("/root/reference/datasets/mix_sft.py",
                            "convert_time_position")
    want = ref(_FakeDataset(), answer, duration)
    got = codec.convert_time_position(answer, duration)
    assert got == want


def test_detect_timestamp_response_parity():
    ref = _extract_function("/root/reference/datasets/mix_sft.py",
                            "detect_timestamp_response")
    convs = [
        {"from": "human", "value": DEFAULT_IMAGE_TOKEN + "\nWhen does X happen?"},
        {"from": "gpt", "value": "From <10.0> to <20.5>."},
        {"from": "human", "value": "What color?"},
        {"from": "gpt", "value": "Red."},
        {"from": "human", "value": "And when does Y happen?"},
        {"from": "gpt", "value": "<5.5> roughly."},
    ]
    import copy

    want = ref(_FakeDataset(), copy.deepcopy(convs))
    got = codec.mark_grounding_conversations(convs)
    assert got == want


@pytest.mark.parametrize("llm", ["phi3.5", "llama3"])
@pytest.mark.parametrize("text,duration", [
    ("From <62> to <150>.", 60.0),
    ("<0> <300>", 123.4),
    ("plain text", 50.0),
])
def test_parse_time_interval_parity(llm, text, duration):
    ref = _extract_function("/root/reference/inference.py",
                            "parse_time_interval")
    want = ref(text, duration, 300, llm)
    got = codec.parse_time_interval(text, duration, 300, llm)
    assert got == want


def test_referring_quantization_parity():
    """inference.py:107 quantizes 'N seconds' inline; the regex lives inside
    create_inputs, so replicate its one-liner as the oracle."""
    duration = 37.0
    query = "What happens from 70 seconds to 80 seconds?"
    want = re.sub(r"(\d+) seconds",
                  lambda m: f"<{int(float(m.group(1)) / duration * 300)}>",
                  query)
    got = codec.encode_referring_query(query, duration, 300)
    assert got == want
