"""Pallas flash attention vs XLA reference (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grounded_video_llm_tpu.ops.attention import xla_mha
from grounded_video_llm_tpu.ops.flash_attention import flash_mha


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape),
                       jnp.float32)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("hkv", [4, 2])
def test_flash_matches_xla(causal, hkv):
    B, Sq, H, D = 2, 128, 4, 16
    q = _rand((B, Sq, H, D), 0)
    k = _rand((B, Sq, hkv, D), 1)
    v = _rand((B, Sq, hkv, D), 2)
    out_flash = flash_mha(q, k, v, causal=causal)
    out_xla = xla_mha(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_xla),
                               rtol=2e-4, atol=2e-5)


def test_flash_padding_mask():
    B, S, H, D = 1, 128, 2, 16
    q, k, v = _rand((B, S, H, D)), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    mask = jnp.asarray(np.r_[np.ones(100), np.zeros(28)][None], jnp.int32)
    out_flash = flash_mha(q, k, v, causal=True, mask=mask)
    out_xla = xla_mha(q, k, v, causal=True, mask=mask)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_xla),
                               rtol=2e-4, atol=2e-5)


def test_flash_unaligned_seq_pads():
    B, Sq, H, D = 1, 100, 2, 16  # not a multiple of any block size
    q, k, v = _rand((B, Sq, H, D)), _rand((B, Sq, H, D), 1), _rand((B, Sq, H, D), 2)
    out_flash = flash_mha(q, k, v, causal=True)
    out_xla = xla_mha(q, k, v, causal=True)
    assert out_flash.shape == (B, Sq, H, D)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_xla),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("hkv", [2, 1])
@pytest.mark.parametrize("sq", [128, 100])
def test_flash_backward_matches_xla(causal, hkv, sq):
    B, H, D = 1, 2, 16
    q = _rand((B, sq, H, D))
    k, v = _rand((B, sq, hkv, D), 1), _rand((B, sq, hkv, D), 2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_mha(q, k, v, causal=causal) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_mha(q, k, v, causal=causal) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)


def test_flash_backward_with_padding_mask():
    B, S, H, D = 1, 128, 2, 16
    q, k, v = _rand((B, S, H, D)), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    mask = jnp.asarray(np.r_[np.ones(90), np.zeros(38)][None], jnp.int32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_mha(q, k, v, causal=True, mask=mask) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_mha(q, k, v, causal=True, mask=mask) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)


def test_bounded_softmax_matches_full():
    """Fixed-offset softmax must equal max-subtracted softmax (offset
    invariance) for scores inside the bounded range."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grounded_video_llm_tpu.ops.flash_attention import flash_mha

    rng = np.random.default_rng(11)
    B, S, H, D = 2, 64, 2, 16
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    mask = jnp.asarray(np.concatenate(
        [np.ones((B, S - 8)), np.zeros((B, 8))], axis=1), jnp.int32)
    full = flash_mha(q, k, v, mask=mask)
    bounded = flash_mha(q, k, v, mask=mask, bounded_softmax=True)
    np.testing.assert_allclose(np.asarray(bounded), np.asarray(full),
                               rtol=2e-5, atol=2e-5)

    # gradients flow through the bounded forward via the true-max backward
    def loss(fn_args):
        qq, kk, vv = fn_args
        return jnp.sum(flash_mha(qq, kk, vv, bounded_softmax=True) ** 2)

    g = jax.grad(loss)((q, k, v))
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in g)


@pytest.mark.parametrize("sq,sk", [(128, 128), (100, 128), (128, 60),
                                   (96, 256)])
@pytest.mark.parametrize("hkv", [2, 1])
def test_chunked_rectangles_match_unchunked(monkeypatch, sq, sk, hkv):
    """Forcing tiny chunk limits must reproduce the single-kernel result
    exactly in math (rtol only for fp reassociation): exercises the
    q-chunk×k-chunk rectangle decomposition + lse merge that keeps each
    compiled program under the axon helper's size ceiling
    (COMPILE_HELPER_REGRESSION_r04.md) for the 7516-token grounded step.

    For Sq > Sk, bottom-aligned causal gives the top Sq−Sk rows no visible
    key: flash (chunked or not) emits exactly 0 there, while xla_mha's
    all-masked softmax degenerates to a uniform average — compare only the
    rows that have at least one valid key."""
    B, H, D = 2, 2, 16
    q = _rand((B, sq, H, D), 0)
    k, v = _rand((B, sk, hkv, D), 1), _rand((B, sk, hkv, D), 2)
    mask = jnp.asarray(
        np.r_[np.ones((B, sk - 11)).T, np.zeros((B, 11)).T].T, jnp.int32)
    want = xla_mha(q, k, v, causal=True, mask=mask)
    monkeypatch.setenv("GVLLM_FLASH_CHUNK", "48")
    monkeypatch.setenv("GVLLM_FLASH_CHUNK_K", "56")
    got = flash_mha(q, k, v, causal=True, mask=mask)
    dead = max(0, sq - sk)
    np.testing.assert_array_equal(np.asarray(got)[:, :dead], 0.0)
    np.testing.assert_allclose(np.asarray(got)[:, dead:],
                               np.asarray(want)[:, dead:],
                               rtol=2e-4, atol=2e-5)


def test_chunk_trigger_law_and_batch_scaled_limit(monkeypatch):
    """The 2026-08-20 B=2 probe law: the helper crashes iff B*Sq AND Sk are
    both past the threshold, so (a) _needs_chunking triggers on that AND
    condition — serving prefill (B=6, Sq=Sk=3548 < lq) must NOT chunk —
    and (b) the q limit divides by B so every rectangle keeps B*Sq_chunk
    under the proven envelope."""
    from grounded_video_llm_tpu.ops.flash_attention import (_limit_q_for,
                                                            _needs_chunking)

    monkeypatch.setenv("GVLLM_FLASH_CHUNK", "6912")
    monkeypatch.setenv("GVLLM_FLASH_CHUNK_K", "13824")
    # the r4 grounded square (B=1) and the r5 B=2 case both chunk
    assert _needs_chunking(True, 1, 7515, 7515)
    assert _needs_chunking(True, 2, 3758, 7515)
    # big-batch serving prefill: B*Sq huge but Sk small — no chunking
    assert not _needs_chunking(True, 6, 3548, 3548)
    # rectangles with one small side compile (probed r4) — no chunking
    assert not _needs_chunking(True, 1, 7515, 3758)
    assert not _needs_chunking(True, 1, 3758, 7515)
    assert not _needs_chunking(False, 1, 7515, 7515)  # encoder: non-causal
    # q limit scales down with batch
    assert _limit_q_for(1) == 6912
    assert _limit_q_for(2) == 3456
    assert _limit_q_for(4096) == 8  # alignment floor


def test_chunked_batch2_matches_unchunked(monkeypatch):
    """B=2 with the B-scaled q limit must equal the unchunked kernel — the
    shape class of the B=2 grounded train step fix."""
    B, S, H, D = 2, 128, 2, 16
    q = _rand((B, S, H, D))
    k, v = _rand((B, S, 1, D), 1), _rand((B, S, 1, D), 2)
    want = flash_mha(q, k, v, causal=True)
    monkeypatch.setenv("GVLLM_FLASH_CHUNK", "96")  # B=2 -> limit_q 48
    monkeypatch.setenv("GVLLM_FLASH_CHUNK_K", "1024")
    got = flash_mha(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_chunked_backward_matches_xla(monkeypatch):
    B, S, H, D = 1, 160, 4, 16
    q = _rand((B, S, H, D))
    k, v = _rand((B, S, 2, D), 1), _rand((B, S, 2, D), 2)
    mask = jnp.asarray(np.r_[np.ones(140), np.zeros(20)][None], jnp.int32)

    def loss(fn):
        return lambda q, k, v: jnp.sum(
            fn(q, k, v, causal=True, mask=mask) ** 2)

    gx = jax.grad(loss(xla_mha), argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("GVLLM_FLASH_CHUNK", "64")
    monkeypatch.setenv("GVLLM_FLASH_CHUNK_K", "48")
    gf = jax.grad(loss(flash_mha), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)


def test_chunked_sliding_window(monkeypatch):
    B, S, H, D = 1, 128, 2, 16
    q, k, v = _rand((B, S, H, D)), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    want = xla_mha(q, k, v, causal=True, sliding_window=40)
    monkeypatch.setenv("GVLLM_FLASH_CHUNK", "32")
    monkeypatch.setenv("GVLLM_FLASH_CHUNK_K", "32")
    got = flash_mha(q, k, v, causal=True, sliding_window=40)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)

    def loss(fn):
        return lambda q, k, v: jnp.sum(
            fn(q, k, v, causal=True, sliding_window=40) ** 2)

    gx = jax.grad(loss(xla_mha), argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss(flash_mha), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)


def test_chunked_left_padded_dead_rows(monkeypatch):
    """Dead rows (fully masked under left padding) must stay exactly 0
    through the chunk merge — lse=+inf partials merge with weight 0, and a
    row dead in EVERY chunk stays (0, +inf)."""
    B, S, H, D = 1, 96, 2, 16
    pad = 37  # dead rows span the whole first q-chunk and part of the second
    mask = jnp.asarray(
        np.concatenate([np.zeros((B, pad)), np.ones((B, S - pad))], axis=1),
        jnp.int32)
    q, k, v = _rand((B, S, H, D)), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    monkeypatch.setenv("GVLLM_FLASH_CHUNK", "32")
    monkeypatch.setenv("GVLLM_FLASH_CHUNK_K", "32")
    out = np.asarray(flash_mha(q, k, v, causal=True, mask=mask))
    assert np.all(np.isfinite(out))
    np.testing.assert_array_equal(out[:, :pad], 0.0)
    want = np.asarray(xla_mha(q, k, v, causal=True, mask=mask))
    np.testing.assert_allclose(out[:, pad:], want[:, pad:], rtol=2e-3,
                               atol=2e-4)


@pytest.mark.parametrize("bounded", [False, True])
def test_left_padded_fully_masked_rows_finite(bounded):
    """Left-padded prompts make PAD query rows fully masked (every key they
    may attend is masked). The kernel must emit exactly 0 for those rows —
    a NaN there becomes the row's k/v at the NEXT layer and poisons every
    valid row from layer 2 on (additive key bias can't mask NaN). Regression
    test for the l==0 → 0/0 normalization bug."""
    B, S, H, D = 2, 64, 2, 16
    pad = 9
    mask = jnp.asarray(
        np.concatenate([np.zeros((B, pad)), np.ones((B, S - pad))], axis=1),
        jnp.int32)

    def two_layer(q, k, v, causal):
        h = flash_mha(q, k, v, causal=causal, mask=mask,
                      bounded_softmax=bounded and not causal)
        # reuse the attention output as next-layer q/k/v (the residual-stream
        # contamination path)
        return flash_mha(h, h, h, causal=causal, mask=mask,
                         bounded_softmax=bounded and not causal)

    q, k, v = _rand((B, S, H, D)), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    for causal in (False, True):
        out = np.asarray(two_layer(q, k, v, causal))
        assert np.all(np.isfinite(out)), f"NaN/Inf at causal={causal}"
        if causal:
            # pad rows (qpos < pad) are fully masked → exactly 0
            np.testing.assert_array_equal(out[:, :pad], 0.0)
        # valid rows must match the XLA reference through both layers
        h_x = xla_mha(q, k, v, causal=causal, mask=mask)
        want = xla_mha(h_x, h_x, h_x, causal=causal, mask=mask)
        np.testing.assert_allclose(out[:, pad:], np.asarray(want)[:, pad:],
                                   rtol=2e-3, atol=2e-4)

        # backward: gradients w.r.t. q/k/v stay finite (the saved lse for
        # dead rows must replay p == 0, not exp(+inf))
        def loss(args):
            qq, kk, vv = args
            return jnp.sum(two_layer(qq, kk, vv, causal) ** 2)

        g = jax.grad(loss)((q, k, v))
        for a in g:
            assert bool(jnp.all(jnp.isfinite(a)))
