"""Prefix-KV caching: generation over a per-video cached prefix
(build_prefix_kv + llm.prefill_continue) must produce the same tokens as
full-prompt prefill (generate_tokens_from_features). The prefix path is the
serving analogue of vLLM prompt-prefix caching: eval workloads ask ~2.8
queries/video (Charades-STA), and the spliced prompt shares everything up to
the question."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grounded_video_llm_tpu.core.config import micro_vlm_config
from grounded_video_llm_tpu.models import vlm
from grounded_video_llm_tpu.serve.generate import (
    build_prefix_kv, generate_tokens_from_features,
    generate_tokens_from_prefix)
from grounded_video_llm_tpu.text.templates import IMAGE_TOKEN_INDEX

EOS, PAD = 2, 0
MAX_NEW = 5


@pytest.fixture(scope="module")
def micro_model():
    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)
    return cfg, params


def _inputs(cfg, B, pre_len=3, q_lens=(4, 4, 4), seed=0):
    """Shared pre-image prefix + per-row questions. Returns the FULL padded
    ids/mask (one-shot path) and the split (pre_ids, post_ids, post_mask)."""
    rng = np.random.default_rng(seed)
    pre = rng.integers(3, 50, size=(pre_len,)).astype(np.int32)
    qs = [rng.integers(3, 50, size=(n,)).astype(np.int32) for n in q_lens]
    Sq = max(q_lens)
    S = pre_len + 1 + Sq
    ids = np.full((B, S), PAD, np.int32)
    mask = np.zeros((B, S), np.int32)
    post_ids = np.full((B, Sq), PAD, np.int32)
    post_mask = np.zeros((B, Sq), np.int32)
    for b, q in enumerate(qs):
        row = np.concatenate([pre, [IMAGE_TOKEN_INDEX], q])
        ids[b, S - len(row):] = row          # left-padded full prompt
        mask[b, S - len(row):] = 1
        post_ids[b, Sq - len(q):] = q        # left-padded question chunk
        post_mask[b, Sq - len(q):] = 1
    feats = (rng.normal(size=(1, cfg.num_video_tokens, cfg.llm.hidden_size))
             * 0.05).astype(np.float32)
    return ids, mask, pre[None], post_ids, post_mask, feats


def _run_both(cfg, params, q_lens, quantize_cache, seed=0,
              shared_prefix=False):
    B = len(q_lens)
    ids, mask, pre_ids, post_ids, post_mask, feats = _inputs(
        cfg, B, q_lens=q_lens, seed=seed)
    kw = dict(max_new_tokens=MAX_NEW, temperature=0.0, do_sample=False,
              eos_token_id=EOS, pad_token_id=PAD,
              quantize_cache=quantize_cache)
    ref, ref_len = generate_tokens_from_features(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(np.broadcast_to(feats, (B, *feats.shape[1:]))),
        jax.random.key(0), **kw)

    Sp = pre_ids.shape[1] + cfg.num_video_tokens
    Sq = post_ids.shape[1]
    rope_hint = -(-(Sp + Sq + MAX_NEW) // 128) * 128
    k, v, pmask = build_prefix_kv(
        params, cfg, jnp.asarray(pre_ids),
        jnp.ones_like(jnp.asarray(pre_ids)), jnp.asarray(feats), rope_hint)
    got, got_len = generate_tokens_from_prefix(
        params, cfg, jnp.asarray(post_ids), jnp.asarray(post_mask),
        k, v, pmask, jax.random.key(0), shared_prefix=shared_prefix, **kw)
    return (np.asarray(ref), np.asarray(ref_len),
            np.asarray(got), np.asarray(got_len))


@pytest.mark.parametrize("quantize_cache", [True, False])
def test_prefix_generation_matches_full_prefill(micro_model, quantize_cache):
    """Uniform question lengths (no pad anywhere): the split computation
    sees identical attention sets and identical cache values — greedy
    tokens must match the one-shot program."""
    cfg, params = micro_model
    ref, ref_len, got, got_len = _run_both(cfg, params, (4, 4, 4),
                                           quantize_cache)
    np.testing.assert_array_equal(ref, got)
    np.testing.assert_array_equal(ref_len, got_len)


def test_prefix_generation_ragged_questions(micro_model):
    """Ragged question lengths exercise the left-pad holes in the chunk
    (positions from mask cumsum, causal keep-mask, per-row valid slots)."""
    cfg, params = micro_model
    ref, ref_len, got, got_len = _run_both(cfg, params, (2, 5, 3), True,
                                           seed=3)
    np.testing.assert_array_equal(ref, got)
    np.testing.assert_array_equal(ref_len, got_len)


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
            w.write(f)
        w.release()
        paths.append(p)
    return paths


@pytest.mark.parametrize("mode", ["qa", "grounding"])
def test_run_stream_prefix_matches_cached(micro_model, two_videos, mode):
    """Engine-level: run_stream_prefix (prefix-KV per video) returns the
    same greedy texts as run_stream_cached (full prefill per query), builds
    each prefix from ONE encode per unique video, and restores input
    order."""
    from grounded_video_llm_tpu.core.config import GenerateConfig
    from grounded_video_llm_tpu.serve.engine import InferenceEngine
    from grounded_video_llm_tpu.text.tokenizer import build_test_tokenizer

    cfg, params = micro_model
    tok = build_test_tokenizer("phi3.5")
    v0, v1 = two_videos
    paths = [v0, v1, v0, v1, v0]
    prompts = [f"what happens in query {i}?" for i in range(len(paths))]
    g = GenerateConfig(max_new_tokens=4, do_sample=False, temperature=0.0)

    def engine():
        eng = InferenceEngine(params, cfg, tok, gen_cfg=g,
                              feature_cache_size=4)
        calls = []
        orig = eng.encode_features
        eng.encode_features = lambda t, s: (calls.append(1), orig(t, s))[1]
        return eng, calls

    base_eng, _ = engine()
    base = base_eng.run_stream_cached(paths, prompts, mode=mode,
                                      batch_size=2)
    eng, calls = engine()
    out = eng.run_stream_prefix(paths, prompts, mode=mode, batch_size=2,
                                question_len=32)
    assert len(calls) == 2  # unique videos only
    assert [r.text for r in out] == [r.text for r in base]
    durs = [r.duration for r in out]
    assert durs[0] == durs[2] == durs[4] and durs[1] == durs[3]


def test_spec_from_prefix_matches_greedy_lockstep(micro_model):
    """Speculative generation over the cascade cache (verify_step_shared +
    tail commits + question-chunk drafting) is token-exact vs the lockstep
    one-shot program under greedy — the standard speculative contract,
    compounded with the prefix/cascade layout."""
    from grounded_video_llm_tpu.serve.speculative import (
        generate_tokens_spec_from_prefix)

    cfg, params = micro_model
    ids, mask, pre_ids, post_ids, post_mask, feats = _inputs(
        cfg, 3, q_lens=(4, 4, 4), seed=2)
    kw = dict(max_new_tokens=MAX_NEW, temperature=0.0, do_sample=False,
              eos_token_id=EOS, pad_token_id=PAD)
    ref, ref_len = generate_tokens_from_features(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(np.broadcast_to(feats, (3, *feats.shape[1:]))),
        jax.random.key(0), quantize_cache=True, **kw)

    Sp = pre_ids.shape[1] + cfg.num_video_tokens
    Sq = post_ids.shape[1]
    S_v = 3
    hint = -(-(Sp + Sq + MAX_NEW + S_v) // 128) * 128
    k, v, pmask = build_prefix_kv(
        params, cfg, jnp.asarray(pre_ids),
        jnp.ones_like(jnp.asarray(pre_ids)), jnp.asarray(feats), hint)
    got, got_len = generate_tokens_spec_from_prefix(
        params, cfg, jnp.asarray(post_ids), jnp.asarray(post_mask),
        k, v, pmask, jax.random.key(0), draft_len=S_v - 1, **kw)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    np.testing.assert_array_equal(np.asarray(ref_len), np.asarray(got_len))


def test_run_stream_prefix_shared_route(micro_model, two_videos):
    """quantize_cache=True routes run_stream_prefix through the cascade
    decode (decode_step_shared); greedy texts must match the full-prefill
    cached path under the same gen config."""
    from grounded_video_llm_tpu.core.config import GenerateConfig
    from grounded_video_llm_tpu.serve.engine import InferenceEngine
    from grounded_video_llm_tpu.text.tokenizer import build_test_tokenizer

    cfg, params = micro_model
    tok = build_test_tokenizer("phi3.5")
    g = GenerateConfig(max_new_tokens=4, do_sample=False, temperature=0.0,
                       quantize_cache=True)
    v0, v1 = two_videos
    paths = [v0, v0, v1, v0]
    prompts = [f"query {i}?" for i in range(len(paths))]
    eng = InferenceEngine(params, cfg, tok, gen_cfg=g, feature_cache_size=4)
    base = eng.run_stream_cached(paths, prompts, mode="qa", batch_size=2)
    out = eng.run_stream_prefix(paths, prompts, mode="qa", batch_size=2,
                                question_len=32)
    assert [r.text for r in out] == [r.text for r in base]


def test_eval_routes_prefix_when_enabled():
    """serve.eval._run_items picks run_stream_prefix iff the engine opts in
    (prefix_cache=True) AND the workload repeats videos."""
    from grounded_video_llm_tpu.serve import eval as eval_mod

    class StubEngine:
        feature_cache_size = 8
        prefix_cache = True

        def __init__(self):
            self.called = []

        def run_stream(self, paths, prompts, mode, batch_size):
            self.called.append("plain")
            return ["r"] * len(paths)

        def run_stream_cached(self, paths, prompts, mode, batch_size):
            self.called.append("cached")
            return ["r"] * len(paths)

        def run_stream_prefix(self, paths, prompts, mode, batch_size):
            self.called.append("prefix")
            return ["r"] * len(paths)

    dup = [{"video": "a.mp4"}, {"video": "a.mp4"}, {"video": "b.mp4"}]
    eng = StubEngine()
    eval_mod._run_items(eng, dup, ["p"] * 3, "grounding", "", 2)
    assert eng.called == ["prefix"]
    eng2 = StubEngine()
    eng2.prefix_cache = False
    eval_mod._run_items(eng2, dup, ["p"] * 3, "grounding", "", 2)
    assert eng2.called == ["cached"]


def test_shared_prefix_decode_matches_full_prefill(micro_model):
    """Cascade decode (decode_step_shared over SharedPrefixCache: the
    prefix int8 KV stored once at batch dim 1, per-row tails) must produce
    the same greedy tokens as the one-shot full-prefill program — ragged
    questions included."""
    cfg, params = micro_model
    ref, ref_len, got, got_len = _run_both(cfg, params, (2, 5, 3), True,
                                           seed=11, shared_prefix=True)
    np.testing.assert_array_equal(ref, got)
    np.testing.assert_array_equal(ref_len, got_len)


def test_shared_prefix_decode_with_sliding_window(micro_model):
    """Cascade decode under a finite sliding window (positional windowing
    across the prefix/tail split): TEACHER-FORCED step-level logits must
    track the single-cache decode closely. (Free-running token equality is
    the wrong contract here: a window of 4 on the micro model produces
    top-2 margins down to ~3e-4, so the XLA-vs-Pallas attention reduction
    order legitimately flips near-ties — measured logits agreement is
    ~1e-3 while margins collapse.)"""
    from dataclasses import replace

    import jax.numpy as jnp

    from grounded_video_llm_tpu.models import llm as llm_mod

    cfg0, params = micro_model
    cfg = replace(cfg0, llm=replace(cfg0.llm, sliding_window=4))
    ids, mask, pre_ids, post_ids, post_mask, feats = _inputs(
        cfg, 3, q_lens=(3, 4, 2), seed=13)
    Sp = pre_ids.shape[1] + cfg.num_video_tokens
    Sq = post_ids.shape[1]
    max_len = -(-(Sp + Sq + MAX_NEW) // 128) * 128
    tail_len = -(-(Sq + MAX_NEW) // 128) * 128
    k, v, pmask = build_prefix_kv(
        params, cfg, jnp.asarray(pre_ids),
        jnp.ones_like(jnp.asarray(pre_ids)), jnp.asarray(feats), max_len)
    lp = params["llm"]
    emb = llm_mod.embed_lookup(lp["embed"], jnp.asarray(post_ids),
                               llm_mod.embed_dtype(lp["embed"]))
    lg1, c1, v1, p1 = llm_mod.prefill_continue(
        lp, cfg.llm, emb, jnp.asarray(post_mask), k, v, pmask, max_len,
        quantize_cache=True)
    lg2, c2, v2, p2 = llm_mod.prefill_continue(
        lp, cfg.llm, emb, jnp.asarray(post_mask), k, v, pmask, max_len,
        quantize_cache=True, tail_len=tail_len)
    np.testing.assert_array_equal(np.asarray(lg1), np.asarray(lg2))
    cur = jnp.argmax(lg1, -1).astype(jnp.int32)  # same forced stream
    for _ in range(4):
        e = llm_mod.embed_lookup(lp["embed"], cur)[:, None, :]
        lg1, c1, v1 = llm_mod.decode_step(lp, cfg.llm, e, c1, v1, p1)
        lg2, c2, v2 = llm_mod.decode_step_shared(lp, cfg.llm, e, c2, v2, p2,
                                                 rope_hint=max_len)
        np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2),
                                   atol=2e-2, rtol=0)
        p1, p2 = p1 + 1, p2 + 1
        cur = jnp.argmax(lg1, -1).astype(jnp.int32)


def test_prefix_generation_with_sliding_window(micro_model):
    """Finite sliding window over a PREFIX-BUILT cache: decode_step windows
    on token positions via valid-slot rank (slot arithmetic would over-mask
    prefix keys by the question chunk's pad count) — tokens must still
    match the one-shot program, ragged questions included."""
    from dataclasses import replace

    cfg, params = micro_model
    cfg_sw = replace(cfg, llm=replace(cfg.llm, sliding_window=4))
    ref, ref_len, got, got_len = _run_both(cfg_sw, params, (2, 5, 3), True,
                                           seed=9)
    np.testing.assert_array_equal(ref, got)
    np.testing.assert_array_equal(ref_len, got_len)


def test_prefix_kv_is_shared_across_batches(micro_model):
    """The same prefix arrays serve two different query batches (the engine
    builds the prefix once per video and reuses it across batch chunks)."""
    cfg, params = micro_model
    ids, mask, pre_ids, post_ids, post_mask, feats = _inputs(
        cfg, 3, q_lens=(4, 4, 4), seed=5)
    Sp = pre_ids.shape[1] + cfg.num_video_tokens
    rope_hint = -(-(Sp + post_ids.shape[1] + MAX_NEW) // 128) * 128
    k, v, pmask = build_prefix_kv(
        params, cfg, jnp.asarray(pre_ids),
        jnp.ones_like(jnp.asarray(pre_ids)), jnp.asarray(feats), rope_hint)
    kw = dict(max_new_tokens=MAX_NEW, temperature=0.0, do_sample=False,
              eos_token_id=EOS, pad_token_id=PAD, quantize_cache=True)
    a, _ = generate_tokens_from_prefix(
        params, cfg, jnp.asarray(post_ids), jnp.asarray(post_mask),
        k, v, pmask, jax.random.key(0), **kw)
    b, _ = generate_tokens_from_prefix(
        params, cfg, jnp.asarray(post_ids), jnp.asarray(post_mask),
        k, v, pmask, jax.random.key(0), **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
