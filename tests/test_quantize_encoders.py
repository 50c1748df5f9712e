"""W8A8 encoder serving quantization: accuracy + plumbing.

The int8 path is a serving approximation (per-out-channel weights, dynamic
per-row activations) — these tests bound its error against the bf16 forward
on the micro config and check the dispatch plumbing end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from grounded_video_llm_tpu.core.config import micro_vlm_config
from grounded_video_llm_tpu.models import clip_vit, internvideo2, vlm
from grounded_video_llm_tpu.ops.int8_matmul import (dynamic_int8_matmul,
                                                    quantize_weights_int8)
from grounded_video_llm_tpu.serve.quantize import (
    quantize_clip_for_serving, quantize_video_encoder_for_serving)


def test_dynamic_int8_matmul_close():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 128)) * 0.5, jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 96)) * 0.1, jnp.float32)
    wq, ws = quantize_weights_int8(w)
    got = dynamic_int8_matmul(x, wq, ws)
    want = x @ w
    denom = jnp.maximum(jnp.max(jnp.abs(want)), 1e-6)
    rel = float(jnp.max(jnp.abs(got - want)) / denom)
    assert rel < 0.02, rel  # int8 x int8: ~1% worst-case at these dims


def test_video_encoder_quantized_features_close():
    cfg = micro_vlm_config("phi3.5").video
    params = internvideo2.init_params(jax.random.key(0), cfg)
    pixels = jax.random.normal(jax.random.key(1),
                               (2, cfg.num_frames, cfg.image_size,
                                cfg.image_size, 3), jnp.float32) * 0.5
    ref = internvideo2.features(params, cfg, pixels)
    qparams = quantize_video_encoder_for_serving(params)
    got = internvideo2.features(qparams, cfg, pixels)
    assert got.shape == ref.shape
    cos = float(jnp.sum(ref * got)
                / (jnp.linalg.norm(ref) * jnp.linalg.norm(got)))
    assert cos > 0.995, cos


def test_clip_quantized_features_close():
    cfg = micro_vlm_config("phi3.5").clip
    params = clip_vit.init_params(jax.random.key(0), cfg)
    pixels = jax.random.normal(jax.random.key(1),
                               (3, cfg.image_size, cfg.image_size, 3),
                               jnp.float32) * 0.5
    ref = clip_vit.features(params, cfg, pixels)
    got = clip_vit.features(quantize_clip_for_serving(params), cfg, pixels)
    assert got.shape == ref.shape
    cos = float(jnp.sum(ref * got)
                / (jnp.linalg.norm(ref) * jnp.linalg.norm(got)))
    assert cos > 0.995, cos


def test_encode_video_with_quantized_encoders():
    """Full dual-stream encode runs through the quantized trunks."""
    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)
    params = dict(params)
    params["video_encoder"] = quantize_video_encoder_for_serving(
        params["video_encoder"])
    params["clip"] = quantize_clip_for_serving(params["clip"])
    sp = jnp.zeros((1, cfg.num_segs, cfg.clip.image_size, cfg.clip.image_size,
                    3), jnp.float32)
    tp = jnp.zeros((1, cfg.num_frames, cfg.video.image_size, cfg.video.image_size,
                    3), jnp.float32)
    feats = vlm.encode_video(params, cfg, sp, tp)
    assert feats.shape[0] == 1 and np.isfinite(np.asarray(feats)).all()
