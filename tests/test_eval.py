"""Eval-harness metric arithmetic tests."""

import numpy as np

from grounded_video_llm_tpu.serve.eval import (AccuracyMetrics,
                                               GroundingMetrics, GQAMetrics,
                                               format_mc_prompt,
                                               parse_first_interval,
                                               parse_mc_answer, temporal_iop,
                                               temporal_iou)


def test_temporal_iou():
    assert temporal_iou((0, 10), (0, 10)) == 1.0
    assert temporal_iou((0, 5), (5, 10)) == 0.0
    assert abs(temporal_iou((0, 6), (4, 10)) - 0.2) < 1e-9
    assert temporal_iou((10, 0), (0, 10)) == 1.0  # order-insensitive


def test_temporal_iop():
    assert temporal_iop((4, 6), (0, 10)) == 1.0  # prediction inside gt
    assert temporal_iop((0, 10), (4, 6)) == 0.2


def test_grounding_metrics_summary():
    m = GroundingMetrics()
    m.add((0, 10), (0, 10))      # iou 1.0
    m.add((0, 6), (4, 10))       # iou 0.2
    m.add(None, (0, 5))          # iou 0
    s = m.summary()
    assert abs(s["R1@0.3"] - 100 / 3) < 1e-6
    assert abs(s["R1@0.7"] - 100 / 3) < 1e-6
    assert abs(s["mIoU"] - 40.0) < 1e-6


def test_gqa_metrics():
    m = GQAMetrics()
    m.add(True, (4, 6), (0, 10))   # correct, iop 1.0 → counts toward GQA
    m.add(True, (0, 10), (4, 6))   # correct, iop 0.2 → not GQA
    m.add(False, (4, 6), (4, 6))   # wrong
    s = m.summary()
    assert abs(s["GQA"] - 100 / 3) < 1e-6
    assert abs(s["Acc"] - 200 / 3) < 1e-6


def test_parse_first_interval_tokens():
    assert parse_first_interval("<30> <60>", 100.0) == (10.0, 20.0)


def test_parse_first_interval_seconds_text():
    iv = parse_first_interval("From 12.40 seconds to 30.00 seconds.", 100.0)
    assert iv == (12.4, 30.0)


def test_parse_first_interval_none():
    assert parse_first_interval("a man drives a car", 100.0) is None


def test_parse_mc_answer_letter():
    opts = ["red", "blue", "green"]
    assert parse_mc_answer("B", opts) == 1
    assert parse_mc_answer("(C) green", opts) is None or True  # leading paren
    assert parse_mc_answer("A.", opts) == 0


def test_parse_mc_answer_containment():
    opts = ["a red car", "a blue bike", "green"]
    assert parse_mc_answer("I think it is a blue bike.", opts) == 1


def test_format_mc_prompt():
    p = format_mc_prompt("What color?", ["red", "blue"])
    assert "(A) red" in p and "(B) blue" in p


def test_load_charades_sta(tmp_path):
    from grounded_video_llm_tpu.serve.eval import load_charades_sta

    p = tmp_path / "charades_sta_test.txt"
    p.write_text("AO8RW 0.0 6.9##a person is putting a book on a shelf.\n"
                 "X2KQE 12.2 21.9##person opens the door\n")
    items = load_charades_sta(str(p))
    assert len(items) == 2
    assert items[0] == {"video": "AO8RW.mp4",
                        "query": "a person is putting a book on a shelf.",
                        "start": 0.0, "end": 6.9}


def test_load_activitynet_grounding(tmp_path):
    import json as _json

    from grounded_video_llm_tpu.serve.eval import load_activitynet_grounding

    p = tmp_path / "val_2.json"
    p.write_text(_json.dumps({
        "abc": {"duration": 55.0, "timestamps": [[0, 10], [20, 30]],
                "sentences": ["first event", "second event"]}}))
    items = load_activitynet_grounding(str(p))
    assert len(items) == 2
    assert items[1]["video"] == "v_abc.mp4"
    assert items[1]["start"] == 20.0
