"""Observability: logger ranks, trackers, phase timer."""

import json
import os

from grounded_video_llm_tpu.obs.logger import initialize_overwatch
from grounded_video_llm_tpu.obs.profiler import PhaseTimer
from grounded_video_llm_tpu.obs.trackers import JSONLinesTracker, Metrics


def test_overwatch_rank_zero():
    ow = initialize_overwatch("test_ow", rank=0, world_size=2)
    assert ow.is_rank_zero()
    assert ow.world_size() == 2
    called = []
    ow.rank_zero_only(lambda: called.append(1))()
    assert called == [1]

    ow1 = initialize_overwatch("test_ow1", rank=1, world_size=2)
    ow1.rank_zero_only(lambda: called.append(2))()
    assert called == [1]  # suppressed on rank 1


def test_jsonl_tracker(tmp_path):
    path = str(tmp_path / "run.jsonl")
    t = JSONLinesTracker(path)
    t.write_hyperparameters({"lr": 1e-3})
    t.write(1, {"loss": 2.5})
    rows = [json.loads(l) for l in open(path)]
    assert rows[0]["hparams"]["lr"] == 1e-3
    assert rows[1] == {"step": 1, "loss": 2.5}


def test_metrics_window_and_push(tmp_path):
    m = Metrics("run", str(tmp_path), {"a": 1}, window=2)
    m.commit(4.0)
    m.commit(2.0)
    status = m.push(lr=1e-4)
    assert "loss 3.0000" in status
    assert m.global_step == 1
    jsonl = os.path.join(str(tmp_path), "run.jsonl")
    assert os.path.exists(jsonl)


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("decode"):
        pass
    with t.phase("decode"):
        pass
    s = t.summary()
    assert s["decode"]["count"] == 2
    assert "decode" in t.report()
