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


def test_init_llm_params_quantized_matches_structure():
    """The fused init+quantize path (big-vocab flagships: llama-3-8B bf16
    does not fit one v5e, so init-then-quantize is impossible) must produce
    exactly the tree/shapes/dtypes of quantize_llm_for_serving over a bf16
    init, for both weight-only and w8a8 modes."""
    from grounded_video_llm_tpu.serve.quantize import \
        init_llm_params_quantized

    for w8a8 in (False, True):
        a = jax.jit(lambda k, w=w8a8: init_llm_params_quantized(
            k, CFG, w8a8=w))(jax.random.key(0))
        b = jax.jit(lambda k, w=w8a8: quantize_llm_for_serving(
            llm_mod.init_params(k, CFG, jnp.bfloat16), w8a8=w))(
            jax.random.key(0))
        assert (jax.tree_util.tree_structure(a)
                == jax.tree_util.tree_structure(b))
        sa = jax.tree_util.tree_map(lambda x: (x.shape, str(x.dtype)), a)
        assert sa == jax.tree_util.tree_map(
            lambda x: (x.shape, str(x.dtype)), b)


def test_init_vlm_params_serving_generates():
    """The one-program serving init must drive generate end-to-end (micro
    model, int8 cache) — this is the memory-safe setup path bench.py uses."""
    from grounded_video_llm_tpu.core.config import micro_vlm_config
    from grounded_video_llm_tpu.serve.generate import generate_tokens
    from grounded_video_llm_tpu.serve.quantize import init_vlm_params_serving

    cfg = micro_vlm_config()
    params = jax.jit(lambda k: init_vlm_params_serving(
        k, cfg, w8a8=True, quantize_encoders=True))(jax.random.key(0))
    B, S = 1, 8
    ids = np.full((B, S), 5, np.int32)
    ids[:, 1] = -200
    attn = np.ones((B, S), np.int32)
    sp = jnp.zeros((B, cfg.num_segs, 336, 336, 3), jnp.uint8)
    tp = jnp.zeros((B, cfg.num_frames, 224, 224, 3), jnp.uint8)
    toks, lengths = generate_tokens(
        params, cfg, jnp.asarray(ids), jnp.asarray(attn), sp, tp,
        jax.random.key(1), max_new_tokens=4, temperature=0.2, do_sample=True,
        eos_token_id=-1, pad_token_id=0, quantize_cache=True)
    assert np.asarray(toks).shape == (B, 4)
    assert np.all(np.asarray(lengths) >= 1)


def test_upload_llm_quantized_bit_identical():
    """The chunked upload+quantize path (real-weights loading for flagships
    whose bf16 tree exceeds HBM) must produce BIT-IDENTICAL int8/scales to
    quantize_llm_for_serving over a whole bf16 tree — per-out-channel absmax
    is chunk-invariant over layers."""
    from grounded_video_llm_tpu.serve.quantize import upload_llm_quantized

    host = jax.tree_util.tree_map(
        np.asarray,
        jax.jit(lambda k: llm_mod.init_params(k, CFG, jnp.float32))(
            jax.random.key(7)))
    want = quantize_llm_for_serving(
        jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16), host),
        w8a8=True)
    got = upload_llm_quantized(host, w8a8=True, chunk_layers=1)
    assert (jax.tree_util.tree_structure(got)
            == jax.tree_util.tree_structure(want))
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(got),
            jax.tree_util.tree_leaves_with_path(want)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        if a.dtype != b.dtype or "scale" in str(pa):
            np.testing.assert_allclose(a, b, rtol=1e-6, err_msg=str(pa))
        else:
            # int8 values: 1-ulp scale differences (jit-vs-eager reduction
            # order) may flip round() at exact ties on a handful of elements
            diff = np.abs(a - b)
            assert diff.max() <= 1 and (diff > 0).mean() < 1e-3, str(pa)


def test_build_params_quantized_and_engine_skip():
    """build_params(quantize=...) returns a pre-quantized tree and the
    engine detects it and does not re-quantize (the llama-3-8B path where
    quantize-after-load cannot fit)."""
    from grounded_video_llm_tpu.cli.model_loading import build_params
    from grounded_video_llm_tpu.core.config import micro_vlm_config
    from grounded_video_llm_tpu.serve.engine import InferenceEngine
    from grounded_video_llm_tpu.serve.quantize import is_quantized

    cfg = micro_vlm_config()
    params = build_params(cfg, quantize="int8_full")
    assert is_quantized(params["llm"]["lm_head"])
    assert "w8a8" in params["llm"]["layers"]["qkv_kernel"]

    class _Tok:  # engine only needs it at run() time
        pass

    eng = InferenceEngine(params, cfg, _Tok(), quantize="int8_full")
    # the same (pre-quantized) llm object must have been kept, not rebuilt
    assert eng.params["llm"]["lm_head"] is params["llm"]["lm_head"]
    # int8_full still quantizes the encoders engine-side
    assert is_quantized(eng.params["video_encoder"]["blocks"]["qkv_kernel"])
    assert is_quantized(eng.params["clip"]["layers"]["q"]["kernel"])
