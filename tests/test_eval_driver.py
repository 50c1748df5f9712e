"""Eval harness drivers end-to-end on the micro model + demo video."""

import json
import os

import jax
import pytest

from grounded_video_llm_tpu.core.config import GenerateConfig, micro_vlm_config
from grounded_video_llm_tpu.models import vlm
from grounded_video_llm_tpu.serve.engine import InferenceEngine
from grounded_video_llm_tpu.serve.eval import (eval_grounding,
                                               eval_multiple_choice)
from grounded_video_llm_tpu.text.tokenizer import build_test_tokenizer


@pytest.fixture(scope="module")
def engine():
    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)
    tok = build_test_tokenizer("phi3.5")
    return InferenceEngine(params, cfg, tok,
                           GenerateConfig(max_new_tokens=3, do_sample=False))


def test_eval_grounding_driver(engine, demo_video):
    annos = [{"video": os.path.basename(demo_video), "query": "a car drives",
              "start": 1.0, "end": 5.0}]
    out = eval_grounding(engine, annos, video_root=os.path.dirname(demo_video),
                         max_items=1)
    assert set(out) == {"R1@0.3", "R1@0.5", "R1@0.7", "mIoU"}
    assert all(0.0 <= v <= 100.0 for v in out.values())


def test_eval_mc_driver(engine, demo_video):
    annos = [{"video": os.path.basename(demo_video),
              "question": "What is shown?",
              "options": ["a car", "a cat"], "answer": 0}]
    out = eval_multiple_choice(engine, annos,
                               video_root=os.path.dirname(demo_video),
                               max_items=1)
    assert 0.0 <= out["accuracy"] <= 100.0


def test_eval_captioning_driver(engine, demo_video):
    from grounded_video_llm_tpu.serve.captioning import eval_dense_captioning

    vid = os.path.basename(demo_video)[:-4]  # driver appends .mp4
    annos = {vid: {"duration": 6.0, "timestamps": [[0.0, 3.0], [3.0, 6.0]],
                   "sentences": ["a car drives", "the car stops"]}}
    out = eval_dense_captioning(engine, annos,
                                video_root=os.path.dirname(demo_video),
                                max_items=1, batch_size=1)
    assert set(out) == {"SODA_c", "METEOR"}
    assert all(0.0 <= v <= 100.0 for v in out.values())


def test_run_batch(engine, demo_video):
    res = engine.run_batch([demo_video, demo_video],
                           ["What happens?", "When does the car move?"],
                           mode="qa")
    assert len(res) == 2
    assert all(r.duration > 0 for r in res)
    assert all(isinstance(r.text, str) for r in res)


def test_run_stream_pipelined(engine, demo_video):
    """5 requests at batch_size=2 → 3 chunks, last padded (pad rows dropped);
    results stay in request order."""
    n = 5
    res = engine.run_stream([demo_video] * n,
                            [f"Question {i}?" for i in range(n)],
                            mode="qa", batch_size=2)
    assert len(res) == n
    assert all(r.duration > 0 for r in res)


def test_generate_prepped_pads_without_redecode(engine, demo_video, monkeypatch):
    calls = []
    orig = InferenceEngine.preprocess_video

    def counting(self, path):
        calls.append(path)
        return orig(self, path)

    monkeypatch.setattr(InferenceEngine, "preprocess_video", counting)
    prep = [engine.preprocess_video(demo_video)]
    out = engine.generate_prepped(prep, ["Q?"], mode="qa", pad_to=2)
    assert len(out) == 1            # padding rows dropped
    assert len(calls) == 1          # no re-decode for the pad row


def test_eval_gqa_driver(engine, demo_video):
    from grounded_video_llm_tpu.serve.eval import eval_gqa

    annos = [{"video": os.path.basename(demo_video),
              "question": "What moves?",
              "options": ["a car", "a cat"], "answer": "A",
              "start": 0.5, "end": 3.0}]
    out = eval_gqa(engine, annos, video_root=os.path.dirname(demo_video),
                   max_items=1)
    assert set(out) == {"GQA", "mIoP", "mIoU", "Acc"}
    assert all(0.0 <= v <= 100.0 for v in out.values())


def test_scheduler_dynamic_batching(engine, demo_video):
    from grounded_video_llm_tpu.serve.scheduler import Scheduler, _bucket

    assert _bucket(1, 6) == 1 and _bucket(3, 6) == 4 and _bucket(5, 6) == 6

    sched = Scheduler(engine, max_batch=4, batch_window_s=0.2)
    try:
        futures = [sched.submit(demo_video, f"Question {i}?", mode="qa")
                   for i in range(3)]
        results = [f.result(timeout=600) for f in futures]
        assert len(results) == 3
        assert all(r.duration > 0 for r in results)
    finally:
        sched.shutdown()


def test_scheduler_error_propagates(engine):
    from grounded_video_llm_tpu.serve.scheduler import Scheduler

    sched = Scheduler(engine, max_batch=2, batch_window_s=0.05)
    try:
        fut = sched.submit("/nonexistent/video.mp4", "Q?", mode="qa")
        import pytest as _pytest

        with _pytest.raises(Exception):
            fut.result(timeout=120)
    finally:
        sched.shutdown()
