"""Feature-cache serving path: split encode/generate parity + engine LRU.

Grounding/QA evals ask several queries per video (Charades-STA ≈2.8 q/video);
serve/engine.run_stream_cached encodes each unique video once (~80% of
per-request device time) and batches queries over the cached features via
serve/generate.generate_tokens_from_features. Reference counterpart: none —
the reference re-encodes per query (inference.py:65-123); beyond-parity
serving axis."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grounded_video_llm_tpu.core.config import (GenerateConfig,
                                                micro_vlm_config)
from grounded_video_llm_tpu.models import vlm
from grounded_video_llm_tpu.serve.engine import InferenceEngine
from grounded_video_llm_tpu.serve.generate import (
    generate_tokens, generate_tokens_from_features)
from grounded_video_llm_tpu.text.templates import IMAGE_TOKEN_INDEX
from grounded_video_llm_tpu.text.tokenizer import build_test_tokenizer


@pytest.fixture(scope="module")
def micro_model():
    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)
    tok = build_test_tokenizer("phi3.5")
    return cfg, params, tok


@pytest.fixture(scope="module")
def two_videos(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    d = tmp_path_factory.mktemp("vids")
    paths = []
    for v, n_frames in enumerate((20, 30)):  # distinct durations
        p = str(d / f"v{v}.mp4")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
        for i in range(n_frames):
            f = np.zeros((64, 64, 3), np.uint8)
            f[:] = (10 + 60 * v, 20 + 5 * (i % 8), 200 - 60 * v)
            x = (5 * i) % 40
            f[10:30, x:x + 12] = 255
            w.write(f)
        w.release()
        paths.append(p)
    return paths


def test_from_features_matches_fused_generate(micro_model):
    """Same features + rng → generate_tokens_from_features is token-exact vs
    the fused pixels-in program (greedy; the traced post-encode graph is
    identical)."""
    cfg, params, tok = micro_model
    B, S = 2, 10
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 50, size=(B, S)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    mask = np.ones((B, S), np.int32)
    spatial = rng.normal(size=(B, cfg.num_segs, 336, 336, 3)).astype(
        np.float32)
    temporal = rng.normal(size=(B, cfg.num_frames, 224, 224, 3)).astype(
        np.float32)
    kwargs = dict(max_new_tokens=5, temperature=0.0, do_sample=False,
                  eos_token_id=tok.eos_token_id,
                  pad_token_id=tok.pad_token_id)
    t1, l1 = generate_tokens(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                             jnp.asarray(spatial), jnp.asarray(temporal),
                             jax.random.key(7), **kwargs)
    feats = vlm.encode_video_jit(params, cfg, jnp.asarray(spatial),
                                 jnp.asarray(temporal))
    t2, l2 = generate_tokens_from_features(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask), feats,
        jax.random.key(7), **kwargs)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_spec_from_features_matches_fused(micro_model):
    """Speculative from-features program == fused spec program (greedy)."""
    from grounded_video_llm_tpu.serve.speculative import (
        generate_tokens_spec, generate_tokens_spec_from_features)

    cfg, params, tok = micro_model
    B, S = 2, 10
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 50, size=(B, S)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    mask = np.ones((B, S), np.int32)
    spatial = rng.normal(size=(B, cfg.num_segs, 336, 336, 3)).astype(
        np.float32)
    temporal = rng.normal(size=(B, cfg.num_frames, 224, 224, 3)).astype(
        np.float32)
    kwargs = dict(max_new_tokens=6, draft_len=3, do_sample=False,
                  eos_token_id=tok.eos_token_id,
                  pad_token_id=tok.pad_token_id)
    t1, l1 = generate_tokens_spec(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(spatial), jnp.asarray(temporal), jax.random.key(3),
        **kwargs)
    feats = vlm.encode_video_jit(params, cfg, jnp.asarray(spatial),
                                 jnp.asarray(temporal))
    t2, l2 = generate_tokens_spec_from_features(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask), feats,
        jax.random.key(3), **kwargs)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_run_stream_cached_spec_route(micro_model, two_videos):
    """run_stream_cached with spec_draft_len>0 routes through the spec
    from-features program and still dedups encodes."""
    cfg, params, tok = micro_model
    g = GenerateConfig(max_new_tokens=4, do_sample=False, temperature=0.0,
                       spec_draft_len=2)
    eng = InferenceEngine(params, cfg, tok, gen_cfg=g, feature_cache_size=4)
    calls = []
    orig = eng.encode_features
    eng.encode_features = lambda t, s: (calls.append(1), orig(t, s))[1]
    v0, v1 = two_videos
    out = eng.run_stream_cached([v0, v0, v1], ["a", "b", "c"], mode="qa",
                                batch_size=2)
    assert len(calls) == 2
    assert all(r is not None for r in out)


def _counting_engine(params, cfg, tok, cache_size):
    g = GenerateConfig(max_new_tokens=4, do_sample=False, temperature=0.0)
    eng = InferenceEngine(params, cfg, tok, gen_cfg=g,
                          feature_cache_size=cache_size)
    calls = []
    orig = eng.encode_features

    def counting(temporal, spatial):
        calls.append(1)
        return orig(temporal, spatial)

    eng.encode_features = counting
    return eng, calls


def test_run_stream_cached_dedups_and_preserves_order(micro_model,
                                                      two_videos):
    cfg, params, tok = micro_model
    v0, v1 = two_videos
    paths = [v0, v1, v0, v1, v0]
    prompts = [f"what happens in query {i}?" for i in range(len(paths))]

    # cache disabled: same code path (batch-1 encode + from-features
    # generate), every query re-encodes
    base_eng, base_calls = _counting_engine(params, cfg, tok, cache_size=0)
    base = base_eng.run_stream_cached(paths, prompts, mode="qa",
                                      batch_size=2)
    assert len(base_calls) == 5

    eng, calls = _counting_engine(params, cfg, tok, cache_size=4)
    out = eng.run_stream_cached(paths, prompts, mode="qa", batch_size=2)
    assert len(calls) == 2  # unique videos only

    # identical programs + identical rng-split sequence → bit-exact texts,
    # and results are restored to input order (durations differ per video)
    assert [r.text for r in out] == [r.text for r in base]
    durs = [r.duration for r in out]
    assert durs[0] == durs[2] == durs[4] and durs[1] == durs[3]
    assert durs[0] != durs[1]


def test_feature_cache_lru_eviction(micro_model, two_videos):
    cfg, params, tok = micro_model
    v0, v1 = two_videos
    eng, calls = _counting_engine(params, cfg, tok, cache_size=1)
    paths = [v0, v1, v0]
    prompts = ["a", "b", "c"]
    # unsorted + batch_size=1 keeps the alternating access pattern: v1
    # evicts v0, so the third query re-encodes
    eng.run_stream_cached(paths, prompts, mode="qa", batch_size=1,
                          sort_by_video=False, pad_last=False)
    assert len(calls) == 3
    eng2, calls2 = _counting_engine(params, cfg, tok, cache_size=2)
    eng2.run_stream_cached(paths, prompts, mode="qa", batch_size=1,
                           sort_by_video=False, pad_last=False)
    assert len(calls2) == 2


def test_eval_routes_duplicates_through_cache():
    """serve.eval._run_items picks run_stream_cached iff the engine caches
    features AND the item list repeats a video."""
    from grounded_video_llm_tpu.serve import eval as eval_mod

    class StubEngine:
        feature_cache_size = 8

        def __init__(self):
            self.called = []

        def run_stream(self, paths, prompts, mode, batch_size):
            self.called.append("plain")
            return ["r"] * len(paths)

        def run_stream_cached(self, paths, prompts, mode, batch_size):
            self.called.append("cached")
            return ["r"] * len(paths)

    dup = [{"video": "a.mp4"}, {"video": "a.mp4"}, {"video": "b.mp4"}]
    uniq = [{"video": "a.mp4"}, {"video": "b.mp4"}]
    eng = StubEngine()
    eval_mod._run_items(eng, dup, ["p"] * 3, "grounding", "", 2)
    eval_mod._run_items(eng, uniq, ["p"] * 2, "grounding", "", 2)
    assert eng.called == ["cached", "plain"]

    eng2 = StubEngine()
    eng2.feature_cache_size = 0
    eval_mod._run_items(eng2, dup, ["p"] * 3, "grounding", "", 2)
    assert eng2.called == ["plain"]


def test_make_continuous_request_rejects_truncated_image(micro_model,
                                                         two_videos):
    """A prompt bucket too small to hold the <image> token must raise — the
    tail-keeping truncation would otherwise splice video features at slot 0
    and return garbage with no error."""
    cfg, params, tok = micro_model
    eng, _ = _counting_engine(params, cfg, tok, cache_size=2)
    with pytest.raises(ValueError, match="image"):
        eng.make_continuous_request(two_videos[0], "what happens?",
                                    prompt_len=8)


def test_make_continuous_request(micro_model, two_videos):
    """Engine → feature-backed continuous Request: encode dedup via the
    cache, fixed prompt bucket, exactly one image token, servable."""
    from grounded_video_llm_tpu.serve.continuous import ContinuousServer

    cfg, params, tok = micro_model
    eng, calls = _counting_engine(params, cfg, tok, cache_size=4)
    r1, d1 = eng.make_continuous_request(two_videos[0], "what happens?",
                                         prompt_len=256)
    r2, d2 = eng.make_continuous_request(two_videos[0], "when exactly?",
                                         prompt_len=256)
    assert len(calls) == 1  # same video encodes once
    assert d1 == d2
    assert r1.input_ids.shape == (256,) and r1.attn_mask.shape == (256,)
    assert int(np.sum(r1.input_ids == IMAGE_TOKEN_INDEX)) == 1
    assert r1.features is not None and r1.spatial_pixels is None
    server = ContinuousServer(
        params, cfg, pool_size=2, prompt_len=256, max_new_tokens=4, chunk=2,
        temperature=0.0, do_sample=False, eos_token_id=tok.eos_token_id,
        pad_token_id=tok.pad_token_id)
    out = server.serve([r1, r2])
    assert len(out) == 2
    assert all(o.dtype == np.int32 for o in out)
