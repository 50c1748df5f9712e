"""Temporal-token codec parity tests (SURVEY §2.2)."""

from grounded_video_llm_tpu.text import codec


def test_quantize_time_truncates_and_clamps():
    # n = min(int(300 * t / duration), 300) — reference datasets/mix_sft.py:62-71
    assert codec.quantize_time(0.0, 60.0) == 0
    assert codec.quantize_time(30.0, 60.0) == 150
    assert codec.quantize_time(59.99, 60.0) == 299  # int() truncation
    assert codec.quantize_time(60.0, 60.0) == 300
    assert codec.quantize_time(75.0, 60.0) == 300  # clamp


def test_convert_time_position():
    out = codec.convert_time_position("From <12.5> to <30.0>.", 60.0)
    assert out == "From <62> to <150>."
    # negative and integer forms also match the reference regex r'<-?\d+(\.\d+)?>'
    out = codec.convert_time_position("<3> then <-1.0>", 60.0)
    assert out == "<15> then <-5>"


def test_encode_referring_query():
    # reference inference.py:107 — no clamping, int truncation
    out = codec.encode_referring_query("What happens at 12 seconds?", 60.0)
    assert out == "What happens at <60>?"


def test_parse_time_interval_phi_vs_llama():
    txt = "From <62> to <150>."
    phi = codec.parse_time_interval(txt, 60.0, llm="phi3.5")
    llama = codec.parse_time_interval(txt, 60.0, llm="llama3")
    assert phi == "From  12.40 seconds to  30.00 seconds."
    assert llama == "From 12.40 seconds to 30.00 seconds."


def test_roundtrip_within_bin_width():
    duration = 123.4
    for t in [0.0, 1.7, 55.5, 123.0]:
        n = codec.quantize_time(t, duration)
        t_back = duration * n / 300
        assert abs(t_back - t) <= duration / 300 + 1e-9


def test_extract_intervals():
    ivs = codec.extract_intervals("the event <30> <60> happens", 100.0)
    assert len(ivs) == 1
    assert abs(ivs[0][0] - 10.0) < 1e-9
    assert abs(ivs[0][1] - 20.0) < 1e-9


def test_mark_grounding_conversations():
    convs = [
        {"from": "human", "value": "<image>\nWhen does the man jump?"},
        {"from": "gpt", "value": "From <10.0> to <20.0>."},
        {"from": "human", "value": "What color is the car?"},
        {"from": "gpt", "value": "Red."},
    ]
    out = codec.mark_grounding_conversations(convs)
    assert out[0]["value"].startswith("<image> <timestamp_grounding>\n")
    assert "When does the man jump?" in out[0]["value"]
    assert out[2]["value"] == "What color is the car?"  # untouched
    # originals untouched
    assert convs[0]["value"].startswith("<image>\n")
