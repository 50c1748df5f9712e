"""Int8 weight-only serving quantization: kernel correctness + quantized
decode fidelity on the micro model."""

import jax
import jax.numpy as jnp
import numpy as np

from grounded_video_llm_tpu.core.config import LLMConfig
from grounded_video_llm_tpu.models import llm as llm_mod
from grounded_video_llm_tpu.ops.int8_matmul import (int8_matmul,
                                                    quantize_weights_int8)
from grounded_video_llm_tpu.serve.quantize import quantize_llm_for_serving

CFG = LLMConfig(family="phi3", vocab_size=128, hidden_size=64,
                intermediate_size=128, num_layers=2, num_heads=4,
                num_kv_heads=4, head_dim=16)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 128)) * 0.05, jnp.float32)
    q, s = quantize_weights_int8(w)
    deq = q.astype(jnp.float32) * s[None, :]
    rel = float(jnp.mean(jnp.abs(deq - w)) / jnp.mean(jnp.abs(w)))
    assert rel < 0.01


def test_int8_matmul_matches_dequant():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 128)) * 0.05, jnp.float32)
    q, s = quantize_weights_int8(w)
    got = np.asarray(int8_matmul(x, q, s))
    ref = np.asarray(x @ (q.astype(jnp.float32) * s[None, :]))
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=1e-3)


def test_int8_matmul_fallback_path():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 60)), jnp.float32)  # D%32 != 0
    w = jnp.asarray(rng.normal(size=(60, 100)) * 0.05, jnp.float32)
    q, s = quantize_weights_int8(w)
    got = np.asarray(int8_matmul(x, q, s))
    ref = np.asarray(x @ (q.astype(jnp.float32) * s[None, :]))
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=1e-3)


def test_quantized_llm_forward_close_to_dense():
    params = llm_mod.init_params(jax.random.key(0), CFG)
    qparams = quantize_llm_for_serving(params)
    embeds = jax.random.normal(jax.random.key(1), (1, 6, CFG.hidden_size)) * 0.1
    dense_logits = llm_mod.forward_logits(params, CFG, embeds)
    quant_logits = llm_mod.forward_logits(qparams, CFG, embeds)
    # same top-1 prediction at every position
    np.testing.assert_array_equal(np.argmax(np.asarray(dense_logits), -1),
                                  np.argmax(np.asarray(quant_logits), -1))


def test_quantized_decode_matches_dense_top1():
    params = llm_mod.init_params(jax.random.key(0), CFG)
    qparams = quantize_llm_for_serving(params)
    B, S, max_len = 1, 5, 10
    embeds = jax.random.normal(jax.random.key(1), (B, S, CFG.hidden_size)) * 0.1
    mask = jnp.ones((B, S), jnp.int32)
    for p in (params, qparams):
        cache = llm_mod.KVCache.create(CFG, B, max_len, dtype=jnp.float32)
        logits, cache = llm_mod.prefill(p, CFG, embeds, mask, cache)
        valid = jnp.zeros((B, max_len), bool).at[:, :S].set(True)
        nxt = jax.random.normal(jax.random.key(2), (B, 1, CFG.hidden_size)) * 0.1
        logits2, _, _ = llm_mod.decode_step(p, CFG, nxt, cache, valid,
                                            jnp.asarray([S]))
        if p is params:
            ref1, ref2 = np.asarray(logits), np.asarray(logits2)
    np.testing.assert_array_equal(np.argmax(ref1, -1),
                                  np.argmax(np.asarray(logits), -1))
    np.testing.assert_array_equal(np.argmax(ref2, -1),
                                  np.argmax(np.asarray(logits2), -1))
