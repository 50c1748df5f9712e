"""Static W8A8 activation-scale calibration (serve/calibrate.py).

The static path trades dynamic per-row activation scales for calibrated
per-tensor scales so the quantize fuses into the producer's epilogue (no
rowmax HBM passes). These tests pin the math, the dispatch plumbing, the
scan-sliced x_scale tree shape on both block-loop variants (full scan +
early-exit index scan), and the end-to-end accuracy envelope on the micro
config. The real-weights accuracy verdict rides serve/quant_ab.py's bar.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from dataclasses import replace

from grounded_video_llm_tpu.core.config import (micro_vlm_config,
                                                tiny_vlm_config)
from grounded_video_llm_tpu.models import internvideo2, vlm
from grounded_video_llm_tpu.ops.int8_matmul import (matmul_any,
                                                    quantize_weights_int8,
                                                    static_int8_matmul)
from grounded_video_llm_tpu.serve import calibrate
from grounded_video_llm_tpu.serve.quantize import (
    quantize_video_encoder_for_serving)


def test_static_int8_matmul_close():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 128)) * 0.5, jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 96)) * 0.1, jnp.float32)
    wq, ws = quantize_weights_int8(w)
    xs = jnp.max(jnp.abs(x)) / 127.0
    got = static_int8_matmul(x, wq, ws, xs)
    want = x @ w
    denom = jnp.maximum(jnp.max(jnp.abs(want)), 1e-6)
    rel = float(jnp.max(jnp.abs(got - want)) / denom)
    assert rel < 0.03, rel


def test_static_scale_saturates_not_explodes():
    """Inputs past the calibrated max clip to ±127 — bounded error, no wrap."""
    x = jnp.asarray([[100.0, -100.0, 1.0, 0.0]], jnp.float32)
    w = jnp.eye(4, dtype=jnp.float32)
    wq, ws = quantize_weights_int8(w)
    got = static_int8_matmul(x, wq, ws, jnp.asarray(10.0 / 127.0))
    # 100 saturates to 127 * scale = 10; 1.0 quantizes fine
    np.testing.assert_allclose(np.asarray(got)[0, :2], [10.0, -10.0],
                               rtol=0.02)
    np.testing.assert_allclose(np.asarray(got)[0, 2], 1.0, rtol=0.05)


def test_matmul_any_dispatches_on_x_scale():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(32, 16)) * 0.2, jnp.float32)
    wq, ws = quantize_weights_int8(w)
    xs = jnp.max(jnp.abs(x)) / 127.0
    via_any = matmul_any(x, {"q": wq, "scale": ws, "x_scale": xs})
    direct = static_int8_matmul(x, wq, ws, xs)
    np.testing.assert_array_equal(np.asarray(via_any), np.asarray(direct))


def _calib_pixels(cfg, b=1, seed=2):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(b, cfg.num_frames,
                                      cfg.video.image_size,
                                      cfg.video.image_size, 3)).astype(
                                          np.uint8)


@pytest.mark.parametrize("cfg_fn", [micro_vlm_config, tiny_vlm_config],
                         ids=["full-scan", "early-exit"])
def test_calibrate_apply_features_close(cfg_fn):
    """Calibrate → apply on all four legs → trunk runs under both scan
    variants and stays close to the bf16 forward."""
    cfg = cfg_fn("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)
    params = dict(params)
    params["video_encoder"] = quantize_video_encoder_for_serving(
        params["video_encoder"])
    px = _calib_pixels(cfg)
    calib = calibrate.calibrate_video_encoder(params, cfg, [px])
    for leg in calibrate.LEGS:
        assert calib[leg].shape[0] == cfg.video.num_blocks_used
        assert np.isfinite(calib[leg]).all() and (calib[leg] >= 0).all()

    enc_static = calibrate.apply_static_scales(
        params["video_encoder"], calib, legs=calibrate.LEGS)
    # the x_scale leaf must span the FULL stacked depth for the scan
    n_total = np.asarray(enc_static["blocks"]["norm1_w"]).shape[0]
    assert enc_static["blocks"]["fc2"]["kernel"]["x_scale"].shape == (n_total,)

    vcfg = cfg.video
    clips = jnp.asarray(
        (np.random.default_rng(3).normal(size=(2, vcfg.num_frames,
                                                vcfg.image_size,
                                                vcfg.image_size, 3)) * 0.5
         ).astype(np.float32))
    ref = internvideo2.features(
        vlm.init_params(jax.random.key(0), cfg)["video_encoder"], vcfg, clips)
    got = internvideo2.features(enc_static, vcfg, clips)
    assert got.shape == ref.shape
    cos = float(jnp.sum(ref * got)
                / (jnp.linalg.norm(ref) * jnp.linalg.norm(got)))
    assert cos > 0.99, cos


def test_apply_requires_quantized_kernels():
    cfg = micro_vlm_config("phi3.5")
    enc = vlm.init_params(jax.random.key(0), cfg)["video_encoder"]
    fake = {leg: np.ones((cfg.video.num_blocks_used, 8), np.float32)
            for leg in calibrate.LEGS}
    with pytest.raises(ValueError, match="not W8A8-quantized"):
        calibrate.apply_static_scales(enc, fake)


def test_calibrate_and_apply_encode_video():
    """One-call wrapper feeds the full dual-stream encode (uint8 pixels)."""
    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)
    params = dict(params)
    params["video_encoder"] = quantize_video_encoder_for_serving(
        params["video_encoder"])
    px = _calib_pixels(cfg)
    params2 = calibrate.calibrate_and_apply(params, cfg, [px])
    assert "x_scale" in params2["video_encoder"]["blocks"]["fc2"]["kernel"]
    assert "x_scale" not in params2["video_encoder"]["blocks"]["fc1"]["kernel"]
    sp = jnp.zeros((1, cfg.num_segs, cfg.clip.image_size,
                    cfg.clip.image_size, 3), jnp.float32)
    tp = jnp.zeros((1, cfg.num_frames, cfg.video.image_size,
                    cfg.video.image_size, 3), jnp.float32)
    feats = vlm.encode_video(params2, cfg, sp, tp)
    assert np.isfinite(np.asarray(feats)).all()


def test_static_vs_dynamic_quant_close():
    """Static scales approximate the dynamic-quant serving forward (same
    weights, same pixels): the two int8 schemes must agree closely on the
    distribution they were calibrated on."""
    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)
    params = dict(params)
    params["video_encoder"] = quantize_video_encoder_for_serving(
        params["video_encoder"])
    vcfg = cfg.video
    clips = jnp.asarray(
        (np.random.default_rng(4).normal(size=(2, vcfg.num_frames,
                                                vcfg.image_size,
                                                vcfg.image_size, 3)) * 0.5
         ).astype(np.float32))
    dyn = internvideo2.features(params["video_encoder"], vcfg, clips)
    stats = internvideo2.features_absmax(params["video_encoder"], vcfg,
                                         clips)[1]
    calib = jax.tree_util.tree_map(np.asarray, stats)
    enc_static = calibrate.apply_static_scales(params["video_encoder"], calib)
    sta = internvideo2.features(enc_static, vcfg, clips)
    cos = float(jnp.sum(dyn * sta)
                / (jnp.linalg.norm(dyn) * jnp.linalg.norm(sta)))
    assert cos > 0.995, cos
