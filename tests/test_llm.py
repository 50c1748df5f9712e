"""LLM decoder tests: loss semantics, GQA, prefill/decode vs full forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grounded_video_llm_tpu.core.config import LLMConfig
from grounded_video_llm_tpu.models import llm as llm_mod

CFG_PHI = LLMConfig(family="phi3", vocab_size=128, hidden_size=32,
                    intermediate_size=64, num_layers=2, num_heads=4,
                    num_kv_heads=4, head_dim=8)
CFG_LLAMA = LLMConfig(family="llama", vocab_size=128, hidden_size=32,
                      intermediate_size=64, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=8, rope_theta=500000.0)


@pytest.mark.parametrize("cfg", [CFG_PHI, CFG_LLAMA], ids=["phi3", "llama"])
def test_forward_shapes(cfg):
    params = llm_mod.init_params(jax.random.key(0), cfg)
    B, S = 2, 10
    embeds = jax.random.normal(jax.random.key(1), (B, S, cfg.hidden_size))
    logits = llm_mod.forward_logits(params, cfg, embeds)
    assert logits.shape == (B, S, cfg.padded_vocab_size)
    assert logits.dtype == jnp.float32


def test_causal_lm_loss_matches_manual():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 7)),
                         jnp.float32)
    labels = jnp.asarray([[ -100, 2, -100, 5]], jnp.int32)
    loss = llm_mod.causal_lm_loss(logits, labels)
    lp = jax.nn.log_softmax(logits, axis=-1)
    expected = -(lp[0, 0, 2] + lp[0, 2, 5]) / 2
    np.testing.assert_allclose(float(loss), float(expected), rtol=1e-6)


def test_causality():
    """Future tokens must not affect earlier logits."""
    cfg = CFG_PHI
    params = llm_mod.init_params(jax.random.key(0), cfg)
    e1 = jax.random.normal(jax.random.key(1), (1, 6, cfg.hidden_size))
    e2 = e1.at[:, 4:].set(jax.random.normal(jax.random.key(2), (1, 2, cfg.hidden_size)))
    l1 = llm_mod.forward_logits(params, cfg, e1)
    l2 = llm_mod.forward_logits(params, cfg, e2)
    np.testing.assert_allclose(np.asarray(l1[:, :4]), np.asarray(l2[:, :4]),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cfg", [CFG_PHI, CFG_LLAMA], ids=["phi3", "llama"])
def test_prefill_decode_matches_full_forward(cfg):
    """Greedy logits from prefill+decode must equal slicing the full forward."""
    params = llm_mod.init_params(jax.random.key(0), cfg)
    B, S_prompt, S_total, max_len = 2, 5, 8, 12
    embeds_all = jax.random.normal(jax.random.key(1),
                                   (B, S_total, cfg.hidden_size)) * 0.1
    mask_full = jnp.ones((B, S_total), jnp.int32)
    full_logits = llm_mod.forward_logits(params, cfg, embeds_all, mask_full)

    cache = llm_mod.KVCache.create(cfg, B, max_len, dtype=jnp.float32)
    prompt_mask = jnp.ones((B, S_prompt), jnp.int32)
    logits, cache = llm_mod.prefill(params, cfg, embeds_all[:, :S_prompt],
                                    prompt_mask, cache)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(full_logits[:, S_prompt - 1]),
                               rtol=2e-4, atol=2e-4)

    valid = jnp.zeros((B, max_len), jnp.int32).at[:, :S_prompt].set(1)
    for step in range(S_prompt, S_total):
        pos = jnp.full((B,), step, jnp.int32)
        logits, cache, valid = llm_mod.decode_step(
            params, cfg, embeds_all[:, step:step + 1], cache, valid, pos)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full_logits[:, step]),
                                   rtol=2e-4, atol=2e-4)


def test_prefill_decode_left_padded():
    """Left-padded prompts: decode must ignore padding slots."""
    cfg = CFG_PHI
    params = llm_mod.init_params(jax.random.key(0), cfg)
    S, pad, max_len = 6, 2, 10
    real = jax.random.normal(jax.random.key(1), (1, S, cfg.hidden_size)) * 0.1

    # unpadded reference
    full = llm_mod.forward_logits(params, cfg, real, jnp.ones((1, S), jnp.int32))

    # left-padded variant
    padded = jnp.concatenate(
        [jnp.zeros((1, pad, cfg.hidden_size)), real], axis=1)
    mask = jnp.concatenate([jnp.zeros((1, pad), jnp.int32),
                            jnp.ones((1, S), jnp.int32)], axis=1)
    cache = llm_mod.KVCache.create(cfg, 1, max_len, dtype=jnp.float32)
    logits, cache = llm_mod.prefill(params, cfg, padded, mask, cache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, -1]),
                               rtol=2e-4, atol=2e-4)

    valid = jnp.zeros((1, max_len), jnp.int32).at[:, :S + pad].set(mask[0])
    nxt = jax.random.normal(jax.random.key(2), (1, 1, cfg.hidden_size)) * 0.1
    pos = jnp.asarray([S], jnp.int32)  # next position id continues from S
    logits_dec, _, _ = llm_mod.decode_step(params, cfg, nxt, cache, valid, pos)

    full2 = llm_mod.forward_logits(
        params, cfg, jnp.concatenate([real, nxt], axis=1),
        jnp.ones((1, S + 1), jnp.int32))
    np.testing.assert_allclose(np.asarray(logits_dec), np.asarray(full2[:, -1]),
                               rtol=2e-4, atol=2e-4)


def test_longrope_switches_factors():
    cfg = LLMConfig(family="phi3", vocab_size=64, hidden_size=16,
                    intermediate_size=32, num_layers=1, num_heads=2,
                    num_kv_heads=2, head_dim=8,
                    original_max_position_embeddings=8,
                    max_position_embeddings=64,
                    rope_scaling_short=tuple([1.0] * 4),
                    rope_scaling_long=tuple([4.0] * 4))
    from grounded_video_llm_tpu.ops.rope import llm_rope_tables
    pos = jnp.arange(6)[None]
    cos_s, _ = llm_rope_tables(cfg, pos, seq_len_hint=6)
    cos_l, _ = llm_rope_tables(cfg, pos, seq_len_hint=20)
    assert not np.allclose(np.asarray(cos_s), np.asarray(cos_l))


def test_prefill_decode_share_longrope_factors():
    """Regression for the factor-selection split: a prompt short enough for
    short factors but a cache budget in the long regime must use the LONG
    table in BOTH prefill and decode (one rule per generation) — otherwise
    cached keys and decode queries get different scalings and decode logits
    drift from the full forward."""
    cfg = LLMConfig(family="phi3", vocab_size=128, hidden_size=32,
                    intermediate_size=64, num_layers=2, num_heads=4,
                    num_kv_heads=4, head_dim=8,
                    original_max_position_embeddings=6,
                    max_position_embeddings=64,
                    rope_scaling_short=tuple([1.0] * 4),
                    rope_scaling_long=tuple([3.0] * 4))
    params = llm_mod.init_params(jax.random.key(0), cfg)
    B, S_prompt, S_total, max_len = 1, 4, 8, 12  # prompt 4 ≤ 6 < max_len 12
    embeds_all = jax.random.normal(jax.random.key(1),
                                   (B, S_total, cfg.hidden_size)) * 0.1
    # oracle: full forward at S_total=8 > 6 → long factors everywhere
    full_logits = llm_mod.forward_logits(params, cfg, embeds_all,
                                         jnp.ones((B, S_total), jnp.int32))

    cache = llm_mod.KVCache.create(cfg, B, max_len, dtype=jnp.float32)
    logits, cache = llm_mod.prefill(params, cfg, embeds_all[:, :S_prompt],
                                    jnp.ones((B, S_prompt), jnp.int32), cache)
    valid = jnp.zeros((B, max_len), jnp.int32).at[:, :S_prompt].set(1)
    for step in range(S_prompt, S_total):
        pos = jnp.full((B,), step, jnp.int32)
        logits, cache, valid = llm_mod.decode_step(
            params, cfg, embeds_all[:, step:step + 1], cache, valid, pos)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full_logits[:, step]),
                                   rtol=2e-4, atol=2e-4)


def test_phi35_config_ships_longrope_tables():
    from grounded_video_llm_tpu.core.config import phi35_mini_config

    cfg = phi35_mini_config()
    assert len(cfg.rope_scaling_short) == cfg.head_dim // 2 == 48
    assert len(cfg.rope_scaling_long) == 48
    # short factors are mild (<3), long factors reach ~65 at high frequencies
    assert max(cfg.rope_scaling_short) < 3.0
    assert max(cfg.rope_scaling_long) > 60.0
    assert cfg.rope_scaling_short[0] == 1.0


def test_lora_dropout_perturbs_training_loss_only():
    """drop-rate>0 with an rng must change the forward (train-time), while
    rate 0 and inference (no rng) stay bit-identical to the base LoRA path."""
    from grounded_video_llm_tpu.train import lora as lora_mod

    cfg = CFG_PHI
    params = llm_mod.init_params(jax.random.key(0), cfg)
    params["layers"] = dict(params["layers"])
    lora = lora_mod.init_lora(jax.random.key(1), cfg, rank=4)
    # nonzero B so the lora branch actually contributes
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 if x.ndim == 3 else x, lora)
    params = lora_mod.attach_lora(params, lora)

    embeds = jax.random.normal(jax.random.key(2), (2, 6, cfg.hidden_size)) * 0.1
    base = llm_mod.forward_logits(params, cfg, embeds)
    no_drop = llm_mod.forward_logits(params, cfg, embeds, lora_dropout=0.0,
                                     dropout_rng=jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(no_drop))

    dropped = llm_mod.forward_logits(params, cfg, embeds, lora_dropout=0.5,
                                     dropout_rng=jax.random.key(3))
    assert not np.allclose(np.asarray(base), np.asarray(dropped))
    # deterministic per rng
    dropped2 = llm_mod.forward_logits(params, cfg, embeds, lora_dropout=0.5,
                                      dropout_rng=jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(dropped), np.asarray(dropped2))


def test_remat_matches():
    cfg = CFG_PHI
    params = llm_mod.init_params(jax.random.key(0), cfg)
    embeds = jax.random.normal(jax.random.key(1), (1, 5, cfg.hidden_size))
    l1 = llm_mod.forward_logits(params, cfg, embeds, remat=False)
    l2 = llm_mod.forward_logits(params, cfg, embeds, remat=True)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)


def test_chunked_loss_matches_full():
    """causal_lm_loss_from_hidden == logits+causal_lm_loss (chunk smaller
    than, equal to, and larger than the sequence)."""
    cfg = CFG_PHI
    params = llm_mod.init_params(jax.random.key(3), cfg)
    B, S = 2, 11
    hidden = jax.random.normal(jax.random.key(4), (B, S, cfg.hidden_size))
    labels = np.random.default_rng(0).integers(0, cfg.vocab_size, (B, S))
    labels[:, :3] = -100
    labels = jnp.asarray(labels, jnp.int32)
    full = llm_mod.causal_lm_loss(
        llm_mod.logits_from_hidden(params, hidden), labels)
    for chunk in (4, 10, 16):
        got = llm_mod.causal_lm_loss_from_hidden(params, hidden, labels,
                                                 chunk=chunk)
        np.testing.assert_allclose(float(got), float(full), rtol=1e-5)
