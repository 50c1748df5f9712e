"""Int8 KV cache: quantizer fidelity + quantized-cache decode vs bf16 cache."""

import jax
import jax.numpy as jnp
import numpy as np

from grounded_video_llm_tpu.core.config import LLMConfig, micro_vlm_config
from grounded_video_llm_tpu.models import llm as llm_mod, vlm
from grounded_video_llm_tpu.ops.decode_attention_int8 import (
    decode_attention_int8, quantize_kv)
from grounded_video_llm_tpu.serve.generate import generate_tokens
from grounded_video_llm_tpu.text.templates import IMAGE_TOKEN_INDEX

CFG = LLMConfig(family="phi3", vocab_size=128, hidden_size=64,
                intermediate_size=128, num_layers=2, num_heads=4,
                num_kv_heads=2, head_dim=16)


def test_quantize_kv_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 3, 16)),
                    jnp.float32)
    q, s = quantize_kv(x)
    deq = q.astype(jnp.float32) * s[..., None]
    rel = float(jnp.mean(jnp.abs(deq - x)) / jnp.mean(jnp.abs(x)))
    assert rel < 0.01


def test_decode_attention_int8_matches_bf16():
    from grounded_video_llm_tpu.ops.attention import decode_attention

    rng = np.random.default_rng(1)
    B, L, Hkv, G, D = 2, 16, 2, 2, 16
    H = Hkv * G
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, Hkv, D)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.float32)
    mask = jnp.asarray(np.r_[np.ones((B, 10)), np.zeros((B, 6))].reshape(
        2, B, -1)[0], jnp.int32) if False else jnp.asarray(
        np.concatenate([np.ones((B, 10)), np.zeros((B, 6))], axis=1), jnp.int32)

    ref = decode_attention(q, k, v, mask, k_new=kn, v_new=vn)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    # head-major transposed layout (ops/decode_attention_int8 docstring)
    kq = kq.transpose(0, 2, 3, 1)
    vq = vq.transpose(0, 2, 3, 1)
    ks = ks.transpose(0, 2, 1)[:, :, None, :]
    vs = vs.transpose(0, 2, 1)[:, :, None, :]
    got = decode_attention_int8(q.astype(jnp.bfloat16), kq, ks, vq, vs, mask,
                                kn.astype(jnp.bfloat16),
                                vn.astype(jnp.bfloat16), scale=D ** -0.5)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=0.1,
                               atol=0.05)


def test_decode_attention_int8_score_dot_path():
    """The INT8_SCORE_DOT variant (in-kernel q quantization + int8 score
    dots) must track the default bf16-score path; it is off by default
    (measured inside run noise on-chip) but stays covered."""
    from grounded_video_llm_tpu.ops import decode_attention_int8 as da

    rng = np.random.default_rng(3)
    B, L, Hkv, G, D = 2, 16, 2, 2, 16
    H = Hkv * G
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, L, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, Hkv, D)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.bfloat16)
    vn = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.bfloat16)
    mask = jnp.ones((B, L), jnp.int32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    kq = kq.transpose(0, 2, 3, 1)
    vq = vq.transpose(0, 2, 3, 1)
    ks = ks.transpose(0, 2, 1)[:, :, None, :]
    vs = vs.transpose(0, 2, 1)[:, :, None, :]

    args = (q, kq, ks, vq, vs, mask, kn, vn)
    try:
        da.INT8_SCORE_DOT = False
        ref = np.asarray(
            decode_attention_int8(*args, scale=D ** -0.5), np.float32)
        da.INT8_SCORE_DOT = True
        got = np.asarray(
            decode_attention_int8(*args, scale=D ** -0.5), np.float32)
    finally:
        da.INT8_SCORE_DOT = False
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.02)


def test_quantized_cache_generate_matches_top_tokens():
    """Greedy generation with the int8 cache should track the bf16-cache path
    (identical for well-separated logits on the micro model)."""
    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)
    B, S = 1, 8
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 50, size=(B, S)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    mask = np.ones((B, S), np.int32)
    spatial = np.zeros((B, cfg.num_segs, 336, 336, 3), np.float32)
    temporal = np.zeros((B, cfg.num_frames, 224, 224, 3), np.float32)
    kwargs = dict(max_new_tokens=4, do_sample=False, temperature=0.0,
                  eos_token_id=-2, pad_token_id=0)
    ref, _ = generate_tokens(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                             jnp.asarray(spatial), jnp.asarray(temporal),
                             jax.random.key(0), **kwargs)
    got, _ = generate_tokens(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                             jnp.asarray(spatial), jnp.asarray(temporal),
                             jax.random.key(0), quantize_cache=True, **kwargs)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
