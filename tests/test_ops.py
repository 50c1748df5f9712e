"""Unit tests for core ops: rmsnorm/layernorm, rope, attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grounded_video_llm_tpu.ops.attention import decode_attention, xla_mha
from grounded_video_llm_tpu.ops.normalization import (layer_norm, layer_scale,
                                                      rms_norm)
from grounded_video_llm_tpu.ops.rope import (apply_rope, longrope_mscale,
                                             rope_tables, rotate_half)


def test_rms_norm_matches_manual():
    x = np.random.default_rng(0).normal(size=(2, 5, 8)).astype(np.float32)
    w = np.random.default_rng(1).normal(size=(8,)).astype(np.float32) + 1.0
    out = rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6)
    expected = w * (x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-5)


def test_layer_norm_matches_manual():
    x = np.random.default_rng(0).normal(size=(3, 8)).astype(np.float32)
    w = np.ones(8, np.float32) * 2
    b = np.ones(8, np.float32)
    out = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-5)
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out),
                               2 * (x - mu) / np.sqrt(var + 1e-5) + 1,
                               rtol=2e-5, atol=2e-5)


def test_layer_scale_fp32_island():
    x = jnp.ones((2, 4), jnp.bfloat16)
    g = jnp.full((4,), 1e-5, jnp.float32)
    out = layer_scale(x, g)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.full((2, 4), 1e-5), rtol=1e-2)


def test_rope_rotation_preserves_norm():
    q = jnp.asarray(np.random.default_rng(0).normal(size=(1, 6, 2, 8)),
                    jnp.float32)
    k = q
    pos = jnp.arange(6)[None]
    cos, sin = rope_tables(pos, 8, 10000.0)
    q2, k2 = apply_rope(q, k, cos, sin)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q2), axis=-1),
                               np.linalg.norm(np.asarray(q), axis=-1),
                               rtol=1e-5)
    # position 0 is identity
    np.testing.assert_allclose(np.asarray(q2[:, 0]), np.asarray(q[:, 0]),
                               rtol=1e-5)


def test_rope_relative_phase():
    """Attention score q_m · k_n must depend only on m - n."""
    rng = np.random.default_rng(0)
    qv = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    def score(m, n):
        pos = jnp.asarray([[m, n]])
        cos, sin = rope_tables(pos, 8, 100.0)
        qs = jnp.tile(qv.reshape(1, 1, 1, 8), (1, 2, 1, 1))
        ks = jnp.tile(kv.reshape(1, 1, 1, 8), (1, 2, 1, 1))
        q, k = apply_rope(qs, ks, cos, sin)
        return float(jnp.sum(q[0, 0, 0] * k[0, 1, 0]))
    assert abs(score(3, 1) - score(7, 5)) < 1e-4
    assert abs(score(3, 1) - score(4, 1)) > 1e-6


def test_longrope_mscale():
    assert longrope_mscale(4096, 4096) == 1.0
    assert longrope_mscale(131072, 4096) == pytest.approx(
        np.sqrt(1 + np.log(32) / np.log(4096)))


def _ref_attn(q, k, v, causal, mask=None):
    B, Sq, H, D = q.shape
    Hkv = k.shape[2]
    k_r = np.repeat(k, H // Hkv, axis=2)
    v_r = np.repeat(v, H // Hkv, axis=2)
    scores = np.einsum("bqhd,bkhd->bhqk", q, k_r) / np.sqrt(D)
    if causal:
        Sk = k.shape[1]
        qpos = np.arange(Sq)[:, None] + (Sk - Sq)
        kpos = np.arange(Sk)[None, :]
        scores = np.where(kpos <= qpos, scores, -1e30)
    if mask is not None:
        scores = np.where(mask[:, None, None, :].astype(bool), scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, v_r)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("hkv", [4, 2, 1])
def test_xla_mha_vs_numpy(causal, hkv):
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, 6, 4, 8)).astype(np.float32)
    k = rng.normal(size=(2, 6, hkv, 8)).astype(np.float32)
    v = rng.normal(size=(2, 6, hkv, 8)).astype(np.float32)
    out = xla_mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal)
    ref = _ref_attn(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_xla_mha_padding_mask():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(1, 4, 2, 8)).astype(np.float32)
    k = rng.normal(size=(1, 4, 2, 8)).astype(np.float32)
    v = rng.normal(size=(1, 4, 2, 8)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0]], np.int32)
    out = xla_mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask=jnp.asarray(mask))
    ref = _ref_attn(q, k, v, False, mask)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_decode_attention_matches_full():
    """Decoding the last token over a cache must equal full attention's last row."""
    rng = np.random.default_rng(2)
    S = 5
    q_all = rng.normal(size=(1, S, 4, 8)).astype(np.float32)
    k_all = rng.normal(size=(1, S, 2, 8)).astype(np.float32)
    v_all = rng.normal(size=(1, S, 2, 8)).astype(np.float32)
    full = xla_mha(jnp.asarray(q_all), jnp.asarray(k_all), jnp.asarray(v_all),
                   causal=True)
    # cache padded to 8 slots
    k_cache = np.zeros((1, 8, 2, 8), np.float32)
    v_cache = np.zeros((1, 8, 2, 8), np.float32)
    k_cache[:, :S] = k_all
    v_cache[:, :S] = v_all
    valid = np.zeros((1, 8), np.int32)
    valid[:, :S] = 1
    out = decode_attention(jnp.asarray(q_all[:, -1:]), jnp.asarray(k_cache),
                           jnp.asarray(v_cache), jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(out)[0, 0], np.asarray(full)[0, -1],
                               rtol=1e-4, atol=1e-5)
