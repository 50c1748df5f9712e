"""Sliding-window attention parity (reference modeling_phi3.py:688-718).

Semantics: causal attention restricted to the most recent `window` keys —
keep iff kpos <= qpos and qpos - kpos < window (HF
_make_sliding_window_causal_mask). Verified across: xla_mha vs a hand-built
dense mask, the Pallas causal kernel (interpret mode) vs xla_mha, and
prefill+decode vs the full forward on a windowed config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grounded_video_llm_tpu.core.config import LLMConfig
from grounded_video_llm_tpu.models import llm as llm_mod
from grounded_video_llm_tpu.ops.attention import xla_mha
from grounded_video_llm_tpu.ops.flash_attention import flash_mha


def _dense_window_reference(q, k, v, window, mask=None):
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    scores = scores * (D ** -0.5)
    qpos = jnp.arange(Sq)[:, None] + (Sk - Sq)
    kpos = jnp.arange(Sk)[None, :]
    keep = (kpos <= qpos) & (qpos - kpos < window)
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(keep[None, None], scores, neg)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :].astype(bool), scores, neg)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


@pytest.mark.parametrize("window", [1, 3, 7, 100])
def test_xla_mha_window_matches_dense(window):
    rng = np.random.default_rng(0)
    B, S, H, D = 2, 9, 2, 8
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    got = xla_mha(q, k, v, causal=True, sliding_window=window)
    want = _dense_window_reference(q, k, v, window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("window", [2, 5, 1000])
@pytest.mark.parametrize("sq,sk", [(9, 9), (4, 9)])
def test_flash_window_matches_xla(window, sq, sk):
    """Pallas causal kernel (interpret mode on CPU) with the window."""
    rng = np.random.default_rng(1)
    B, H, D = 2, 2, 8
    q = jnp.asarray(rng.normal(size=(B, sq, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, sk, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, sk, H, D)), jnp.float32)
    mask = jnp.ones((B, sk), jnp.int32).at[0, :2].set(0)  # left padding
    got = flash_mha(q, k, v, causal=True, mask=mask, sliding_window=window)
    want = xla_mha(q, k, v, causal=True, mask=mask, sliding_window=window)
    # rows whose keys are ALL masked (padding ∩ window): the flash kernel
    # emits exactly 0 (the XLA path emits a finite uniform average) — value
    # comparison is only meaningful on rows with ≥1 attendable key, but the
    # flash output must be FINITE everywhere (a NaN here poisons the whole
    # residual stream at the next layer)
    assert np.all(np.isfinite(np.asarray(got)))
    qpos = np.arange(sq) + (sk - sq)
    ok_rows = qpos >= 2  # rows attending ≥1 unpadded key for batch 0
    dead_rows = ~ok_rows
    if dead_rows.any():
        np.testing.assert_array_equal(np.asarray(got[0, dead_rows]), 0.0)
    np.testing.assert_allclose(np.asarray(got[0, ok_rows]),
                               np.asarray(want[0, ok_rows]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               rtol=1e-5, atol=1e-5)


def test_flash_window_grad_matches_xla():
    rng = np.random.default_rng(2)
    B, S, H, D = 1, 8, 2, 8
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_mha(q, k, v, causal=True, sliding_window=3) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_mha(q, k, v, causal=True, sliding_window=3) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_prefill_decode_windowed_matches_full_forward():
    """decode_step's slot-space window must equal the full forward's
    position-space window, including under left padding."""
    cfg = LLMConfig(family="phi3", vocab_size=128, hidden_size=32,
                    intermediate_size=64, num_layers=2, num_heads=4,
                    num_kv_heads=4, head_dim=8, sliding_window=4)
    params = llm_mod.init_params(jax.random.key(0), cfg)
    B, S_prompt, S_total, max_len = 2, 6, 10, 12
    embeds_all = jax.random.normal(jax.random.key(1),
                                   (B, S_total, cfg.hidden_size)) * 0.1
    full_logits = llm_mod.forward_logits(params, cfg, embeds_all,
                                         jnp.ones((B, S_total), jnp.int32))

    cache = llm_mod.KVCache.create(cfg, B, max_len, dtype=jnp.float32)
    logits, cache = llm_mod.prefill(params, cfg, embeds_all[:, :S_prompt],
                                    jnp.ones((B, S_prompt), jnp.int32), cache)
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


def test_window_actually_restricts():
    """A window smaller than the context must change the output vs full
    causal (sanity that the mask binds)."""
    rng = np.random.default_rng(3)
    B, S, H, D = 1, 8, 2, 8
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    full = xla_mha(q, k, v, causal=True)
    windowed = xla_mha(q, k, v, causal=True, sliding_window=2)
    assert not np.allclose(np.asarray(full[:, -1]),
                           np.asarray(windowed[:, -1]), atol=1e-3)
    # window ≥ S is a no-op
    wide = xla_mha(q, k, v, causal=True, sliding_window=S)
    np.testing.assert_allclose(np.asarray(full), np.asarray(wide),
                               rtol=1e-6, atol=1e-6)
