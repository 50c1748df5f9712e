"""Fused IV2-block GEMM kernels (ops/fused_block) vs the unfused W8A8 chain.

The fused kernels must reproduce the unfused serving path's math exactly
(same per-row dynamic activation quant, same per-out-channel weight scales,
same fp32 islands) — only the HBM traffic changes. Interpret mode on CPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grounded_video_llm_tpu.core.config import InternVideo2Config
from grounded_video_llm_tpu.models import internvideo2
from grounded_video_llm_tpu.ops.fused_block import (
    fused_norm_quant_gemm, fused_quant_gemm_ls_residual)
from grounded_video_llm_tpu.ops.int8_matmul import quantize_weights_int8
from grounded_video_llm_tpu.ops.normalization import layer_scale, rms_norm
from grounded_video_llm_tpu.serve.quantize import \
    quantize_video_encoder_for_serving

EPS = 1e-6


def _quant_rows_ref(x):
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _w8a8_ref(h, wq, ws):
    q, s = _quant_rows_ref(h)
    y = jax.lax.dot_general(q, wq, (((h.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * s * ws


def test_fused_norm_quant_gemm_plain():
    rng = np.random.default_rng(0)
    M, D, O = 40, 128, 256
    x = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    nw = jnp.asarray(rng.normal(size=(D,)) * 0.1 + 1.0, jnp.float32)
    w = jnp.asarray(rng.normal(size=(D, O)) * 0.1, jnp.float32)
    wq, ws = quantize_weights_int8(w)
    got = fused_norm_quant_gemm(x, nw, wq, ws, eps=EPS, block_o=128)
    want = _w8a8_ref(rms_norm(x, nw, EPS), wq, ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_norm_quant_gemm_qk_norm():
    rng = np.random.default_rng(1)
    M, D = 24, 128
    x = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    nw = jnp.ones((D,), jnp.float32)
    w = jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.1, jnp.float32)
    wq, ws = quantize_weights_int8(w)
    qn = jnp.asarray(rng.normal(size=(2, D)) * 0.1 + 1.0, jnp.float32)
    got = fused_norm_quant_gemm(x, nw, wq, ws, eps=EPS, epilogue="qk_norm",
                                qk_norm_w=qn)
    qkv = _w8a8_ref(rms_norm(x, nw, EPS), wq, ws)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    want = jnp.concatenate([rms_norm(q, qn[0], EPS),
                            rms_norm(k, qn[1], EPS), v], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_norm_quant_gemm_gelu_bias():
    rng = np.random.default_rng(2)
    M, D, O = 16, 128, 512
    x = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    nw = jnp.ones((D,), jnp.float32)
    w = jnp.asarray(rng.normal(size=(D, O)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(O,)) * 0.1, jnp.float32)
    wq, ws = quantize_weights_int8(w)
    got = fused_norm_quant_gemm(x, nw, wq, ws, eps=EPS, epilogue="gelu",
                                bias=b, block_o=256)
    want = jax.nn.gelu(_w8a8_ref(rms_norm(x, nw, EPS), wq, ws) + b,
                       approximate=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_quant_gemm_ls_residual():
    rng = np.random.default_rng(3)
    M, D, O = 16, 256, 128
    x = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(D, O)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(O,)) * 0.1, jnp.float32)
    ls = jnp.asarray(rng.normal(size=(O,)) * 0.01, jnp.float32)
    res = jnp.asarray(rng.normal(size=(M, O)), jnp.float32)
    wq, ws = quantize_weights_int8(w)
    got = fused_quant_gemm_ls_residual(x, wq, ws, b, ls, res, block_o=128)
    want = res + layer_scale(_w8a8_ref(x, wq, ws) + b, ls)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def _aligned_cfg():
    return InternVideo2Config(
        embed_dim=128, depth=2, num_heads=2, mlp_ratio=4.0,
        image_size=28, patch_size=14, num_frames=2, num_blocks_used=2)


def test_fused_block_matches_unfused_quant_block(monkeypatch):
    """Block level: the fused path must equal the unfused W8A8 block up to
    the bf16-vs-fp32 rounding of the normed activations at quantization."""
    monkeypatch.setenv("GVLLM_FUSED_IV2", "1")  # measured-slower opt-in
    cfg = _aligned_cfg()
    assert cfg.mlp_hidden % 512 == 0, cfg.mlp_hidden
    params = internvideo2.init_params(jax.random.key(0), cfg)
    qparams = quantize_video_encoder_for_serving(params)
    bp = jax.tree_util.tree_map(lambda a: a[0], qparams["blocks"])
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 16, cfg.embed_dim)), jnp.float32)

    assert internvideo2._fused_int8_ok(bp, cfg)
    got = internvideo2._block(x, bp, cfg)

    monkeypatch.setattr(internvideo2, "_fused_int8_ok", lambda *_: False)
    want = internvideo2._block(x, bp, cfg)
    cos = float(jnp.sum(got * want)
                / (jnp.linalg.norm(got) * jnp.linalg.norm(want)))
    assert cos > 0.9999, cos
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-2, atol=5e-3)


def test_fused_features_run_end_to_end(monkeypatch):
    """features() with a quantized trunk at aligned dims routes through the
    fused kernels and stays finite."""
    monkeypatch.setenv("GVLLM_FUSED_IV2", "1")
    cfg = _aligned_cfg()
    params = internvideo2.init_params(jax.random.key(0), cfg)
    qparams = quantize_video_encoder_for_serving(params)
    pixels = jax.random.normal(jax.random.key(1),
                               (1, cfg.num_frames, cfg.image_size,
                                cfg.image_size, 3), jnp.float32) * 0.5
    ref = internvideo2.features(params, cfg, pixels)
    got = internvideo2.features(qparams, cfg, pixels)
    assert got.shape == ref.shape
    assert np.isfinite(np.asarray(got)).all()
    cos = float(jnp.sum(ref * got)
                / (jnp.linalg.norm(ref) * jnp.linalg.norm(got)))
    assert cos > 0.995, cos
