"""Pre-wired int8 accuracy bar (serve/quant_ab.py): pipeline-level bf16 vs
int8_full logit KL + greedy token agreement on the micro model, plus the
eval.py --quantize_ab driver end-to-end."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grounded_video_llm_tpu.core.config import micro_vlm_config
from grounded_video_llm_tpu.models import vlm
from grounded_video_llm_tpu.serve import quant_ab
from grounded_video_llm_tpu.serve.engine import InferenceEngine


def _pipeline_inputs(cfg, B=2, S=10, seed=3):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, 60, size=(B, S)).astype(np.int32)
    ids[:, 1] = -200
    mask = np.ones((B, S), np.int32)
    spatial = rng.integers(0, 255, size=(B, cfg.num_segs, 336, 336, 3)
                           ).astype(np.uint8)
    temporal = rng.integers(0, 255, size=(B, cfg.num_frames, 224, 224, 3)
                            ).astype(np.uint8)
    return ids, mask, spatial, temporal


def test_quant_ab_pipeline_thresholds():
    """The committed bar must PASS for int8_full on the micro pipeline —
    logit KL, per-position top-1 agreement, greedy-decode agreement, all
    through pixels->encoders->splice->LLM (the serving composition)."""
    cfg = micro_vlm_config("phi3.5")
    params = jax.jit(lambda k: vlm.init_params(k, cfg, jnp.bfloat16))(
        jax.random.key(0))
    eng = InferenceEngine(params, cfg, object(), quantize="int8_full")
    ids, mask, sp, tp = _pipeline_inputs(cfg)
    report = quant_ab.run_quant_ab(
        params, eng.params, cfg, ids, mask, sp, tp,
        max_new_tokens=8, eos_token_id=-1, pad_token_id=0)
    assert report["pass"], report
    # the micro model sits FAR inside the bar; if these start grazing the
    # committed thresholds the quantization stack regressed
    assert report["mean_kl_nats"] < quant_ab.DEFAULT_MAX_KL
    assert report["top1_agreement"] >= quant_ab.DEFAULT_MIN_TOP1
    assert report["greedy_prefix_agreement"] >= quant_ab.DEFAULT_MIN_GREEDY


def test_quant_ab_detects_broken_quantization():
    """The bar must FAIL when the quantized tree is actually wrong (scales
    zeroed on the lm_head) — a bar that can't fail is not a bar."""
    cfg = micro_vlm_config("phi3.5")
    params = jax.jit(lambda k: vlm.init_params(k, cfg, jnp.bfloat16))(
        jax.random.key(0))
    eng = InferenceEngine(params, cfg, object(), quantize="int8_full")
    broken = dict(eng.params)
    broken_llm = dict(broken["llm"])
    head = dict(broken_llm["lm_head"])
    head["scale"] = head["scale"] * 0.0 + 1e-4  # catastrophic mis-scale
    broken_llm["lm_head"] = head
    broken["llm"] = broken_llm
    ids, mask, sp, tp = _pipeline_inputs(cfg)
    report = quant_ab.run_quant_ab(
        params, broken, cfg, ids, mask, sp, tp,
        max_new_tokens=8, eos_token_id=-1, pad_token_id=0)
    assert not report["pass"], report


def test_compare_greedy_metrics():
    a = np.array([[1, 2, 3, 0], [5, 6, 7, 8]])
    la = np.array([3, 4])
    b = np.array([[1, 2, 3, 0], [5, 9, 7, 8]])
    lb = np.array([3, 4])
    m = quant_ab.compare_greedy(a, la, b, lb)
    assert m["greedy_exact_rate"] == 0.5
    assert m["greedy_prefix_agreement"] == pytest.approx((1.0 + 0.25) / 2)


def test_eval_driver_quantize_ab(demo_video, tmp_path):
    """eval.py --quantize_ab end-to-end as a subprocess on the micro model.

    Random micro weights give near-flat logits on a real templated prompt
    (KL ~3e-3 but top-1 is a coin flip among near-ties), so the agreement
    thresholds are overridden via the recalibration flags — this smoke
    covers the driver path, the KL bar, and the override plumbing; the
    COMMITTED agreement bars are for real-weight runs (margins exist) and
    are exercised on the synthetic pipeline above.

    --static_scales makes the quant leg the FULL headline serving tree:
    int8 LLM + W8A8 encoders + calibrated static activation scales
    (serve/calibrate.py) — the bar now judges exactly what bench.py runs."""
    anno = [{"video": os.path.basename(demo_video), "query": "a car drives",
             "start": 1.0, "end": 5.0}]
    anno_path = tmp_path / "annos.json"
    anno_path.write_text(json.dumps(anno))
    out_path = tmp_path / "ab.json"
    env = dict(os.environ, GVLLM_FORCE_CPU="1")
    proc = subprocess.run(
        [sys.executable, "eval.py", "--benchmark", "grounding",
         "--anno_path", str(anno_path), "--anno_format", "json",
         "--video_root", os.path.dirname(demo_video),
         "--quantize", "int8_full", "--quantize_ab", "--static_scales",
         "--ab_items", "1",
         "--ab_max_new_tokens", "4", "--allow_random_weights",
         "--debug_tiny", "--ab_min_top1", "0.5", "--ab_min_greedy", "0.0",
         "--out", str(out_path)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    rep = json.loads(out_path.read_text())
    assert rep["mode"] == "quantize_ab"
    assert rep["report"]["pass"] is True
    assert rep["report"]["mean_kl_nats"] < quant_ab.DEFAULT_MAX_KL
    assert rep["report"]["thresholds"]["max_kl"] == quant_ab.DEFAULT_MAX_KL
    assert rep["report"]["thresholds"]["min_top1"] == 0.5
