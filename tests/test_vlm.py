"""Composite VLM tests: fusion arithmetic, splice parity, end-to-end loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grounded_video_llm_tpu.core.config import (micro_vlm_config,
                                                tiny_vlm_config)
from grounded_video_llm_tpu.models import vlm
from grounded_video_llm_tpu.text.templates import (IGNORE_INDEX,
                                                   IMAGE_TOKEN_INDEX)


@pytest.fixture(scope="module", params=["phi3.5", "llama3"])
def setup(request):
    cfg = micro_vlm_config(request.param)
    params = vlm.init_params(jax.random.key(0), cfg)
    return cfg, params


def test_token_arithmetic():
    cfg = tiny_vlm_config("phi3.5")
    assert cfg.spatial_tokens_per_seg == 156
    assert cfg.temporal_tokens_per_seg == 128
    assert cfg.tokens_per_seg == 285
    assert cfg.num_video_tokens == 3420  # reference llava_next_video.py:563
    cfg_l = tiny_vlm_config("llama3")
    assert cfg_l.spatial_tokens_per_seg == 64
    assert cfg_l.tokens_per_seg == 193
    assert cfg_l.num_video_tokens == 2316


def test_merge_2x2():
    # 2x2 merge groups adjacent patches: verify index mapping explicitly
    N, C = 1, 2
    feats = jnp.arange(N * 576 * C, dtype=jnp.float32).reshape(N, 576, C)
    out = vlm.merge_2x2_phi3(feats)
    assert out.shape == (N, 12, 12, 4 * C)
    # output cell (0,0) must contain patches (0,0),(0,1),(1,0),(1,1) of the 24x24 grid
    grid = np.asarray(feats).reshape(24, 24, C)
    expected = np.concatenate([grid[0, 0], grid[0, 1], grid[1, 0], grid[1, 1]])
    np.testing.assert_array_equal(np.asarray(out)[0, 0, 0], expected)


def test_pool_grid_mean():
    x = jnp.arange(16 * 2, dtype=jnp.float32).reshape(1, 16, 2)
    out = vlm._pool_grid(x, 4, 2)
    assert out.shape == (1, 4, 2)
    grid = np.arange(16 * 2, dtype=np.float32).reshape(4, 4, 2)
    np.testing.assert_allclose(np.asarray(out)[0, 0],
                               grid[:2, :2].mean((0, 1)))


def test_encode_video_shape(setup):
    cfg, params = setup
    B = 1
    spatial = jnp.zeros((B, cfg.num_segs, 336, 336, 3))
    temporal = jnp.zeros((B, cfg.num_frames, 224, 224, 3))
    out = vlm.encode_video(params, cfg, spatial, temporal)
    assert out.shape == (B, cfg.num_video_tokens, cfg.llm.hidden_size)
    assert bool(jnp.all(jnp.isfinite(out)))


def _splice_python(ids, labels, mask, video, embed_table, is_text):
    """Direct per-sample reimplementation of reference llava_next_video.py:568-596."""
    out_e, out_l, out_m = [], [], []
    for b in range(ids.shape[0]):
        idx = int(np.where(ids[b] == IMAGE_TOKEN_INDEX)[0][0])
        pre_e = embed_table[ids[b, :idx]]
        post_e = embed_table[ids[b, idx + 1:]]
        nv = video.shape[1]
        if is_text[b]:
            e = np.concatenate([pre_e, post_e, video[b]])
            l = np.concatenate([labels[b, :idx], labels[b, idx + 1:],
                                np.full(nv, IGNORE_INDEX)])
            m = np.concatenate([mask[b, :idx], mask[b, idx + 1:], np.zeros(nv)])
        else:
            e = np.concatenate([pre_e, video[b], post_e])
            l = np.concatenate([labels[b, :idx], np.full(nv, IGNORE_INDEX),
                                labels[b, idx + 1:]])
            m = np.concatenate([mask[b, :idx], np.ones(nv), mask[b, idx + 1:]])
        out_e.append(e)
        out_l.append(l)
        out_m.append(m)
    return np.stack(out_e), np.stack(out_l), np.stack(out_m)


def test_splice_parity_with_python_reference():
    rng = np.random.default_rng(0)
    B, S, NV, H, V = 3, 7, 4, 5, 11
    ids = rng.integers(1, V, size=(B, S)).astype(np.int32)
    img_pos = [2, 0, 5]
    for b, p in enumerate(img_pos):
        ids[b, p] = IMAGE_TOKEN_INDEX
    labels = rng.integers(0, V, size=(B, S)).astype(np.int32)
    labels[0, :3] = IGNORE_INDEX
    mask = np.ones((B, S), np.int32)
    mask[1, -2:] = 0
    video = rng.normal(size=(B, NV, H)).astype(np.float32)
    table = rng.normal(size=(V, H)).astype(np.float32)
    is_text = np.array([False, False, True])

    e, l, m = vlm.splice_multimodal(jnp.asarray(ids), jnp.asarray(labels),
                                    jnp.asarray(mask), jnp.asarray(video),
                                    jnp.asarray(table), jnp.asarray(is_text))
    re, rl, rm = _splice_python(ids, labels, mask, video, table, is_text)
    np.testing.assert_allclose(np.asarray(e), re, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(l), rl)
    np.testing.assert_array_equal(np.asarray(m), rm.astype(np.int32))


def test_forward_loss_finite(setup):
    cfg, params = setup
    B, S = 1, 12
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 50, size=(B, S)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :4] = IGNORE_INDEX
    batch = vlm.Batch(
        input_ids=jnp.asarray(ids),
        labels=jnp.asarray(labels),
        attn_mask=jnp.ones((B, S), jnp.int32),
        spatial_pixels=jnp.asarray(rng.normal(size=(B, cfg.num_segs, 336, 336, 3)),
                                   jnp.float32),
        temporal_pixels=jnp.asarray(rng.normal(size=(B, cfg.num_frames, 224, 224, 3)),
                                    jnp.float32),
        is_text=jnp.zeros((B,), bool),
    )
    loss = vlm.forward_loss(params, cfg, batch)
    assert np.isfinite(float(loss))
    assert float(loss) > 0


def test_forward_loss_grad_flows(setup):
    cfg, params = setup
    B, S = 1, 8
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 50, size=(B, S)).astype(np.int32)
    ids[:, 0] = IMAGE_TOKEN_INDEX
    batch = vlm.Batch(
        input_ids=jnp.asarray(ids), labels=jnp.asarray(ids),
        attn_mask=jnp.ones((B, S), jnp.int32),
        spatial_pixels=jnp.zeros((B, cfg.num_segs, 336, 336, 3)),
        temporal_pixels=jnp.zeros((B, cfg.num_frames, 224, 224, 3)),
        is_text=jnp.zeros((B,), bool),
    )
    grads = jax.grad(lambda p: vlm.forward_loss(p, cfg, batch))(params)
    gnorm = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32) ** 2), grads, 0.0))
    assert np.isfinite(gnorm) and gnorm > 0
    # encoders are frozen in every reference stage → stop_gradient makes their
    # grads exactly zero (and XLA drops their backward graph entirely)
    enc_norm = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32) ** 2),
        {"c": grads["clip"], "v": grads["video_encoder"]}, 0.0))
    assert enc_norm == 0.0
    proj_norm = float(jnp.sum(grads["video_projector"]["fc1"]["kernel"] ** 2))
    assert proj_norm > 0


def test_internvideo2_clip_projector():
    """CLIP-teacher attention-pooling head (off the VLM runtime path)."""
    import jax

    from grounded_video_llm_tpu.models import internvideo2 as iv2

    cfg = micro_vlm_config().video
    params = iv2.init_clip_projector(jax.random.key(0), cfg, out_dim=24)
    x = jax.random.normal(jax.random.key(1), (2, 17, cfg.embed_dim))
    out = iv2.clip_projector(params, cfg, x)
    assert out.shape == (2, 24)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_encoder_chunking_matches_whole_batch():
    """Clip-chunked temporal encode (lax.map over chunks) must produce the
    same features as the whole-batch encode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grounded_video_llm_tpu.core.config import micro_vlm_config, replace
    from grounded_video_llm_tpu.models import vlm

    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(9)
    B = 2
    sp = jnp.asarray(rng.normal(size=(B, cfg.num_segs, 336, 336, 3)),
                     jnp.float32)
    tp = jnp.asarray(rng.normal(size=(B, cfg.num_frames, 224, 224, 3)),
                     jnp.float32)
    whole = vlm.encode_video(params, cfg, sp, tp)
    chunked_cfg = replace(cfg, encoder_chunk_clips=2)  # 2*2=4 clips → 2 chunks
    chunked = vlm.encode_video(params, chunked_cfg, sp, tp)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(whole),
                               rtol=1e-5, atol=1e-5)
