"""Continuous batching: slot pool greedy outputs must match per-request
lockstep generation bit-for-bit (same model, same greedy decode), including
mid-stream admission into freed slots."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grounded_video_llm_tpu.core.config import micro_vlm_config
from grounded_video_llm_tpu.models import vlm
from grounded_video_llm_tpu.serve.continuous import ContinuousServer, Request
from grounded_video_llm_tpu.serve.generate import generate_tokens
from grounded_video_llm_tpu.text.templates import IMAGE_TOKEN_INDEX

EOS, PAD = 2, 0


@pytest.fixture(scope="module")
def micro_model():
    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)
    return cfg, params


def _make_requests(cfg, n, S=10):
    rng = np.random.default_rng(7)
    reqs = []
    for i in range(n):
        ids = rng.integers(3, 50, size=(S,)).astype(np.int32)
        ids[2] = IMAGE_TOKEN_INDEX
        reqs.append(Request(
            input_ids=ids,
            attn_mask=np.ones((S,), np.int32),
            spatial_pixels=rng.normal(size=(cfg.num_segs, 336, 336, 3)
                                      ).astype(np.float32) * 0.1,
            temporal_pixels=rng.normal(size=(cfg.num_frames, 224, 224, 3)
                                       ).astype(np.float32) * 0.1,
        ))
    return reqs


def _reference_greedy(params, cfg, req, max_new):
    toks, length = generate_tokens(
        params, cfg, jnp.asarray(req.input_ids[None]),
        jnp.asarray(req.attn_mask[None]),
        jnp.asarray(req.spatial_pixels[None]),
        jnp.asarray(req.temporal_pixels[None]), jax.random.key(0),
        max_new_tokens=max_new, temperature=0.0, do_sample=False,
        eos_token_id=EOS, pad_token_id=PAD)
    out = [int(t) for t in np.asarray(toks)[0][:int(length[0])]]
    return np.asarray([t for t in out if t != EOS], np.int32)


def test_continuous_matches_lockstep_greedy(micro_model):
    """3 requests through a 2-slot pool == each request generated alone."""
    cfg, params = micro_model
    max_new = 6
    reqs = _make_requests(cfg, 3)
    server = ContinuousServer(params, cfg, pool_size=2, prompt_len=10,
                              max_new_tokens=max_new, chunk=2,
                              temperature=0.0, do_sample=False,
                              eos_token_id=EOS, pad_token_id=PAD)
    got = server.serve(reqs)
    for i, req in enumerate(reqs):
        want = _reference_greedy(params, cfg, req, max_new)
        np.testing.assert_array_equal(got[i], want), i


def test_pool_reuse_after_retirement(micro_model):
    """A slot freed by one request must serve a later one uncorrupted
    (second serve() call reuses the same pool state)."""
    cfg, params = micro_model
    reqs = _make_requests(cfg, 2)
    server = ContinuousServer(params, cfg, pool_size=1, prompt_len=10,
                              max_new_tokens=4, chunk=2,
                              temperature=0.0, do_sample=False,
                              eos_token_id=EOS, pad_token_id=PAD)
    first = server.serve([reqs[0]])
    second = server.serve([reqs[1]])
    np.testing.assert_array_equal(
        first[0], _reference_greedy(params, cfg, reqs[0], 4))
    np.testing.assert_array_equal(
        second[0], _reference_greedy(params, cfg, reqs[1], 4))


def test_batched_admission_pad_by_repeat(micro_model):
    """3 requests admitted into a 3-slot pool with admit_batch=4 pads the
    prefill bucket by repeating a request (k=3 → bucket 4); outputs must
    still match lockstep, including ragged per-request budgets."""
    cfg, params = micro_model
    reqs = _make_requests(cfg, 3)
    budgets = [3, 6, 4]
    reqs = [r._replace(max_new_tokens=b) for r, b in zip(reqs, budgets)]
    server = ContinuousServer(params, cfg, pool_size=3, prompt_len=10,
                              max_new_tokens=8, chunk=2,
                              temperature=0.0, do_sample=False,
                              eos_token_id=EOS, pad_token_id=PAD,
                              admit_batch=4)
    got = server.serve(reqs)
    for i, req in enumerate(reqs):
        want = _reference_greedy(params, cfg, req, budgets[i])
        np.testing.assert_array_equal(got[i], want), i


def test_threaded_scheduler_matches_reference(micro_model):
    """Futures submitted concurrently through ContinuousScheduler resolve to
    the same greedy outputs as standalone generation."""
    from grounded_video_llm_tpu.serve.continuous import ContinuousScheduler

    cfg, params = micro_model
    reqs = _make_requests(cfg, 3)
    server = ContinuousServer(params, cfg, pool_size=2, prompt_len=10,
                              max_new_tokens=5, chunk=2,
                              temperature=0.0, do_sample=False,
                              eos_token_id=EOS, pad_token_id=PAD)
    sched = ContinuousScheduler(server)
    try:
        futs = [sched.submit(r) for r in reqs]
        outs = [f.result(timeout=300) for f in futs]
    finally:
        sched.shutdown()
    for req, out in zip(reqs, outs):
        want = _reference_greedy(params, cfg, req, 5)
        np.testing.assert_array_equal(out, want)


def test_continuous_spec_matches_lockstep_greedy(micro_model):
    """Speculative chunks (spec_draft_len>0) through the pool must emit the
    same greedy tokens as per-request lockstep generation — the spec verify
    path's exactness contract, here composed with mid-stream admission,
    per-row commit bases, and host-side budget retirement."""
    cfg, params = micro_model
    max_new = 6
    reqs = _make_requests(cfg, 3)
    budgets = [6, 3, 5]
    reqs = [r._replace(max_new_tokens=b) for r, b in zip(reqs, budgets)]
    server = ContinuousServer(params, cfg, pool_size=2, prompt_len=10,
                              max_new_tokens=max_new, chunk=2,
                              temperature=0.0, do_sample=False,
                              eos_token_id=EOS, pad_token_id=PAD,
                              spec_draft_len=2)
    got = server.serve(reqs)
    for i, req in enumerate(reqs):
        want = _reference_greedy(params, cfg, req, budgets[i])
        np.testing.assert_array_equal(got[i], want), i


def test_continuous_matches_lockstep_greedy_llama_gqa():
    """Same pool-vs-alone parity over the llama micro config (GQA G=2):
    the grouped decode-attention unroll, GQA-shaped pool cache, and llama
    fusion arithmetic run through continuous batching — phi (MHA) covers
    none of those shapes."""
    cfg = micro_vlm_config("llama3")
    params = vlm.init_params(jax.random.key(1), cfg)
    max_new = 5
    reqs = _make_requests(cfg, 3)
    server = ContinuousServer(params, cfg, pool_size=2, prompt_len=10,
                              max_new_tokens=max_new, chunk=2,
                              temperature=0.0, do_sample=False,
                              eos_token_id=EOS, pad_token_id=PAD)
    got = server.serve(reqs)
    for i, req in enumerate(reqs):
        want = _reference_greedy(params, cfg, req, max_new)
        np.testing.assert_array_equal(got[i], want), i


def _featureize(params, cfg, reqs):
    """Pixel requests → feature-backed requests (Request.features), pixels
    zeroed to prove they're unused."""
    zsp = np.zeros_like(reqs[0].spatial_pixels)
    ztp = np.zeros_like(reqs[0].temporal_pixels)
    out = []
    for r in reqs:
        f = np.asarray(vlm.encode_video_jit(
            params, cfg, jnp.asarray(r.spatial_pixels[None]),
            jnp.asarray(r.temporal_pixels[None]))[0])
        out.append(r._replace(features=f, spatial_pixels=zsp,
                              temporal_pixels=ztp))
    return out


def test_feature_backed_requests_match_pixel_requests(micro_model):
    """Requests carrying precomputed features (the engine's video-feature
    cache) admit through _prefill_batch_from_features and must generate the
    same tokens as pixel-backed admission."""
    cfg, params = micro_model
    max_new = 5
    reqs = _make_requests(cfg, 3)
    kw = dict(pool_size=2, prompt_len=10, max_new_tokens=max_new, chunk=2,
              temperature=0.0, do_sample=False, eos_token_id=EOS,
              pad_token_id=PAD)
    got_pix = ContinuousServer(params, cfg, **kw).serve(reqs)
    got_feat = ContinuousServer(params, cfg, **kw).serve(
        _featureize(params, cfg, reqs))
    for i, (a, b) in enumerate(zip(got_pix, got_feat)):
        np.testing.assert_array_equal(a, b), i


def _prefixize(params, cfg, reqs, rope_hint):
    """Pixel requests → prefix-backed requests: each request's own
    [pre-image | video] head becomes a bf16 prefix KV; input_ids keep only
    the post-image chunk. (_make_requests puts IMAGE_TOKEN_INDEX at 2.)"""
    from grounded_video_llm_tpu.serve.generate import build_prefix_kv

    out = []
    for r in reqs:
        feats = vlm.encode_video_jit(
            params, cfg, jnp.asarray(r.spatial_pixels[None]),
            jnp.asarray(r.temporal_pixels[None]))
        pre = jnp.asarray(r.input_ids[None, :2])
        prefix = build_prefix_kv(params, cfg, pre, jnp.ones_like(pre),
                                 feats, rope_hint)
        out.append(r._replace(
            input_ids=r.input_ids[3:], attn_mask=r.attn_mask[3:],
            spatial_pixels=None, temporal_pixels=None, prefix=prefix))
    return out


def test_prefix_backed_requests_match_pixel_requests(micro_model):
    """Requests carrying a cached prefix KV admit through
    _prefill_batch_from_prefix (question-chunk prefill only) and must
    generate the same tokens as full pixel-backed admission."""
    cfg, params = micro_model
    max_new = 5
    reqs = _make_requests(cfg, 3)
    kw = dict(pool_size=2, max_new_tokens=max_new, chunk=2,
              temperature=0.0, do_sample=False, eos_token_id=EOS,
              pad_token_id=PAD)
    got_pix = ContinuousServer(params, cfg, prompt_len=10, **kw).serve(reqs)
    server = ContinuousServer(params, cfg, prompt_len=7,
                              prefix_len=2 + cfg.num_video_tokens, **kw)
    got_pref = server.serve(_prefixize(params, cfg, reqs, server.max_len))
    for i, (a, b) in enumerate(zip(got_pix, got_pref)):
        np.testing.assert_array_equal(a, b), i


def test_mixed_prefix_admission_batches_same_prefix_only(micro_model):
    """admit_batch=2: two requests SHARING one prefix batch into one
    admission program; a different-prefix request cuts the take. Outputs
    match the lockstep reference."""
    cfg, params = micro_model
    max_new = 4
    reqs = _make_requests(cfg, 3)
    # queries 0 and 1 share video 0's prefix (same pixels AND the same
    # pre-image tokens — only the question differs); query 2 has its own
    ids1 = np.concatenate([reqs[0].input_ids[:3], reqs[1].input_ids[3:]])
    shared_src = [reqs[0], reqs[0]._replace(input_ids=ids1), reqs[2]]
    kw = dict(pool_size=3, max_new_tokens=max_new, chunk=2, temperature=0.0,
              do_sample=False, eos_token_id=EOS, pad_token_id=PAD)
    server = ContinuousServer(params, cfg, prompt_len=7,
                              prefix_len=2 + cfg.num_video_tokens,
                              admit_batch=2, **kw)
    pref = _prefixize(params, cfg, [shared_src[0], shared_src[2]],
                      server.max_len)
    shared = pref[0].prefix
    mixed = [pref[0],
             pref[0]._replace(input_ids=shared_src[1].input_ids[3:],
                              prefix=shared),
             pref[1]]
    got = server.serve(mixed)
    for i, src in enumerate(shared_src):
        want = _reference_greedy(params, cfg, src, max_new)
        np.testing.assert_array_equal(got[i], want), i


def test_prefix_admission_with_speculative_chunks(micro_model):
    """Prefix-admitted slots under speculative decode chunks (draft buffers
    seed from the question chunk only) still match the lockstep reference —
    the server allows --prefix_cache and --spec_draft_len together."""
    cfg, params = micro_model
    max_new = 5
    reqs = _make_requests(cfg, 3)
    kw = dict(pool_size=2, max_new_tokens=max_new, chunk=2, temperature=0.0,
              do_sample=False, eos_token_id=EOS, pad_token_id=PAD)
    server = ContinuousServer(params, cfg, prompt_len=7,
                              prefix_len=2 + cfg.num_video_tokens,
                              spec_draft_len=2, **kw)
    got = server.serve(_prefixize(params, cfg, reqs, server.max_len))
    for i, req in enumerate(reqs):
        want = _reference_greedy(params, cfg, req, max_new)
        np.testing.assert_array_equal(got[i], want), i


def test_scheduler_recovers_after_admission_error(micro_model):
    """An admission failure (oversized prefix for the pool) must fail the
    offending future AND leave the pool serviceable: queued work is
    dropped, slots free, and a subsequent good request completes."""
    from grounded_video_llm_tpu.serve.continuous import ContinuousScheduler

    cfg, params = micro_model
    max_new = 4
    reqs = _make_requests(cfg, 2)
    # pool sized WITHOUT prefix_len → a LONG-pre prefix request overflows
    server = ContinuousServer(params, cfg, pool_size=1, prompt_len=10,
                              max_new_tokens=max_new, chunk=2,
                              temperature=0.0, do_sample=False,
                              eos_token_id=EOS, pad_token_id=PAD)
    from grounded_video_llm_tpu.serve.generate import build_prefix_kv

    long_pre = jnp.asarray(
        np.random.default_rng(0).integers(3, 50, size=(1, 160)).astype(
            np.int32))
    feats = vlm.encode_video_jit(
        params, cfg, jnp.asarray(reqs[0].spatial_pixels[None]),
        jnp.asarray(reqs[0].temporal_pixels[None]))
    prefix = build_prefix_kv(params, cfg, long_pre,
                             jnp.ones_like(long_pre), feats, server.max_len)
    bad = reqs[0]._replace(input_ids=reqs[0].input_ids[3:],
                           attn_mask=reqs[0].attn_mask[3:],
                           spatial_pixels=None, temporal_pixels=None,
                           prefix=prefix)
    sched = ContinuousScheduler(server)
    try:
        fut_bad = sched.submit(bad)
        with pytest.raises(ValueError):
            fut_bad.result(timeout=120)
        fut_ok = sched.submit(reqs[1])
        got = fut_ok.result(timeout=300)
        want = _reference_greedy(params, cfg, reqs[1], max_new)
        np.testing.assert_array_equal(got, want)
    finally:
        sched.shutdown()


def test_mixed_admission_does_not_mix_programs(micro_model):
    """admit_batch=2 with alternating pixel/feature requests: the take must
    cut at the type switch and still produce lockstep-parity tokens."""
    cfg, params = micro_model
    max_new = 4
    reqs = _make_requests(cfg, 4)
    feat = _featureize(params, cfg, reqs[1::2])
    mixed = [reqs[0], feat[0], reqs[2], feat[1]]
    server = ContinuousServer(params, cfg, pool_size=4, prompt_len=10,
                              max_new_tokens=max_new, chunk=2,
                              temperature=0.0, do_sample=False,
                              eos_token_id=EOS, pad_token_id=PAD,
                              admit_batch=2)
    got = server.serve(mixed)
    for i, req in enumerate([reqs[0], reqs[1], reqs[2], reqs[3]]):
        want = _reference_greedy(params, cfg, req, max_new)
        np.testing.assert_array_equal(got[i], want), i


def test_shared_prefix_pool_matches_plain_prefix_pool(micro_model):
    """Cascade pool (shared_prefix=True: pinned int8 prefix at batch dim 1,
    per-slot tails, decode_step_shared chunks) must emit the same greedy
    tokens as the plain prefix pool for the same (prefix, question) pairs —
    four same-video requests through two slots exercises mid-stream
    admission into freed tail rows."""
    cfg, params = micro_model
    max_new = 6
    reqs = _make_requests(cfg, 4)
    kw = dict(pool_size=2, prompt_len=7, max_new_tokens=max_new, chunk=2,
              temperature=0.0, do_sample=False, eos_token_id=EOS,
              pad_token_id=PAD, prefix_len=2 + cfg.num_video_tokens)
    plain = ContinuousServer(params, cfg, **kw)
    # ONE shared video: every request rides request 0's prefix with its own
    # question chunk (the repeated-video serving workload)
    pref = _prefixize(params, cfg, reqs, plain.max_len)
    qs = [p._replace(prefix=pref[0].prefix) for p in pref]
    got_plain = plain.serve(qs)
    cascade = ContinuousServer(params, cfg, shared_prefix=True, **kw)
    got_shared = cascade.serve(qs)
    for i, (a, b) in enumerate(zip(got_plain, got_shared)):
        np.testing.assert_array_equal(a, b), i


def test_shared_prefix_pool_repins_across_videos(micro_model):
    """Requests for two different videos interleaved: the pool admits one
    video's requests, drains, repins to the other video's prefix — outputs
    must match the plain prefix pool serving the identical request list."""
    cfg, params = micro_model
    reqs = _make_requests(cfg, 4)
    kw = dict(pool_size=2, prompt_len=7, max_new_tokens=5, chunk=2,
              temperature=0.0, do_sample=False, eos_token_id=EOS,
              pad_token_id=PAD, prefix_len=2 + cfg.num_video_tokens)
    plain = ContinuousServer(params, cfg, **kw)
    pref = _prefixize(params, cfg, reqs, plain.max_len)
    pa, pb = pref[0].prefix, pref[1].prefix
    qs = [pref[0], pref[1], pref[2]._replace(prefix=pa),
          pref[3]._replace(prefix=pb)]
    got_plain = plain.serve(qs)
    cascade = ContinuousServer(params, cfg, shared_prefix=True, **kw)
    got_shared = cascade.serve(qs)
    for i, (a, b) in enumerate(zip(got_plain, got_shared)):
        np.testing.assert_array_equal(a, b), i


def test_shared_prefix_pool_rejects_unsupported(micro_model):
    """Construction/admission guards: the shared-prefix pool needs
    prefix_len and serves prefix-backed requests only."""
    cfg, params = micro_model
    kw = dict(pool_size=2, prompt_len=7, max_new_tokens=4, chunk=2,
              temperature=0.0, do_sample=False, eos_token_id=EOS,
              pad_token_id=PAD)
    with pytest.raises(ValueError, match="prefix_len"):
        ContinuousServer(params, cfg, shared_prefix=True, **kw)
    server = ContinuousServer(params, cfg, shared_prefix=True,
                              prefix_len=2 + cfg.num_video_tokens, **kw)
    with pytest.raises(ValueError, match="prefix-backed"):
        server.serve(_make_requests(cfg, 1))


def test_shared_prefix_pool_with_speculative_chunks(micro_model):
    """Speculative chunks over the CASCADE pool (verify_step_shared + tail
    commit_verify: the weight stream amortizes across draft_len+1 tokens AND
    the prefix stream across the pool) still produce lockstep-greedy
    parity — including a mid-stream admission into a freed tail row."""
    cfg, params = micro_model
    max_new = 5
    reqs = _make_requests(cfg, 3)
    kw = dict(pool_size=2, prompt_len=7, max_new_tokens=max_new, chunk=2,
              temperature=0.0, do_sample=False, eos_token_id=EOS,
              pad_token_id=PAD, prefix_len=2 + cfg.num_video_tokens)
    plain = ContinuousServer(params, cfg, **kw)
    pref = _prefixize(params, cfg, reqs, plain.max_len)
    qs = [p._replace(prefix=pref[0].prefix) for p in pref]
    got_plain = plain.serve(qs)
    spec = ContinuousServer(params, cfg, shared_prefix=True,
                            spec_draft_len=2, **kw)
    got_spec = spec.serve(qs)
    for i, (a, b) in enumerate(zip(got_plain, got_spec)):
        np.testing.assert_array_equal(a, b), i


def test_longest_first_admission_matches_fifo(micro_model):
    """admission_policy="longest_first" (LPT makespan heuristic) reorders
    WHICH request admits first but must not change any request's tokens —
    ragged budgets through a 2-slot pool, both pool flavors."""
    cfg, params = micro_model
    reqs = _make_requests(cfg, 4)
    budgets = [2, 6, 3, 5]
    reqs = [r._replace(max_new_tokens=b) for r, b in zip(reqs, budgets)]
    kw = dict(pool_size=2, prompt_len=10, max_new_tokens=8, chunk=2,
              temperature=0.0, do_sample=False, eos_token_id=EOS,
              pad_token_id=PAD)
    fifo = ContinuousServer(params, cfg, **kw).serve(reqs)
    lpt = ContinuousServer(params, cfg, admission_policy="longest_first",
                           **kw).serve(reqs)
    for i, (a, b) in enumerate(zip(fifo, lpt)):
        np.testing.assert_array_equal(a, b), i
    with pytest.raises(ValueError, match="admission_policy"):
        ContinuousServer(params, cfg, admission_policy="shortest", **kw)


def test_tail_chunk_long_matches_short_chunks(micro_model):
    """chunk_long (adaptive tail chunk) amortizes per-chunk dispatch over
    the straggler tail; greedy outputs must be bit-identical to the plain
    chunk=2 pool — per-step math is unchanged, only the fori_loop trip
    count differs. Budgets straddle the gate (one row's remaining budget
    falls below chunk_long mid-run, forcing a short-chunk finish)."""
    cfg, params = micro_model
    reqs = _make_requests(cfg, 3)
    budgets = [3, 8, 8]
    reqs = [r._replace(max_new_tokens=b) for r, b in zip(reqs, budgets)]
    kw = dict(pool_size=2, prompt_len=10, max_new_tokens=8, chunk=2,
              temperature=0.0, do_sample=False, eos_token_id=EOS,
              pad_token_id=PAD)
    base = ContinuousServer(params, cfg, **kw).serve(reqs)
    tailed = ContinuousServer(params, cfg, chunk_long=4, **kw)
    got = tailed.serve(reqs)
    for i, (a, b) in enumerate(zip(base, got)):
        np.testing.assert_array_equal(a, b), i
    # chunk_long <= chunk is a no-op, not an error
    assert ContinuousServer(params, cfg, chunk_long=2, **kw).chunk_long == 0


def test_tail_chunk_long_with_shared_prefix_and_spec(micro_model):
    """chunk_long composes with the cascade pool and speculative chunks
    (the long _spec_chunk program commits at most chunk_long*(draft+1)
    tokens, covered by the same budget gate)."""
    cfg, params = micro_model
    max_new = 8
    reqs = _make_requests(cfg, 3)
    kw = dict(pool_size=2, prompt_len=7, max_new_tokens=max_new, chunk=2,
              temperature=0.0, do_sample=False, eos_token_id=EOS,
              pad_token_id=PAD, prefix_len=2 + cfg.num_video_tokens)
    plain = ContinuousServer(params, cfg, **kw)
    pref = _prefixize(params, cfg, reqs, plain.max_len)
    qs = [p._replace(prefix=pref[0].prefix) for p in pref]
    got_plain = plain.serve(qs)
    cascade = ContinuousServer(params, cfg, shared_prefix=True,
                               chunk_long=4, **kw)
    got_cascade = cascade.serve(qs)
    spec = ContinuousServer(params, cfg, shared_prefix=True,
                            spec_draft_len=2, chunk_long=3, **kw)
    got_spec = spec.serve(qs)
    for i, (a, b, c) in enumerate(zip(got_plain, got_cascade, got_spec)):
        np.testing.assert_array_equal(a, b), i
        np.testing.assert_array_equal(a, c), i


def test_pipelined_chunks_match_unpipelined(micro_model):
    """pipeline_chunks=True (dispatch chunk k+1 before fetching chunk k's
    tokens — the token fetch overlaps device execution) must be greedy
    bit-identical to the plain loop: rows are independent under the active
    mask, and the one-chunk retirement/admission lag only changes WHEN a
    slot turns over, never any row's math. Ragged budgets force retirement
    lag + slot reuse through the pipelined path."""
    cfg, params = micro_model
    reqs = _make_requests(cfg, 4)
    budgets = [2, 6, 3, 5]
    reqs = [r._replace(max_new_tokens=b) for r, b in zip(reqs, budgets)]
    kw = dict(pool_size=2, prompt_len=10, max_new_tokens=8, chunk=2,
              temperature=0.0, do_sample=False, eos_token_id=EOS,
              pad_token_id=PAD)
    base = ContinuousServer(params, cfg, **kw).serve(reqs)
    piped = ContinuousServer(params, cfg, pipeline_chunks=True, **kw)
    assert piped._chunk_margin == 2 * 2  # doubled overshoot margin
    got = piped.serve(reqs)
    for i, (a, b) in enumerate(zip(base, got)):
        np.testing.assert_array_equal(a, b), i


def test_pipelined_composes_with_cascade_spec_and_chunk_long(micro_model):
    """pipeline_chunks composes with the shared-prefix pool, speculative
    chunks, and the adaptive tail chunk (whose budget gate widens by the
    inflight chunk's staleness) — all bit-identical to the plain prefix
    pool."""
    cfg, params = micro_model
    max_new = 8
    reqs = _make_requests(cfg, 3)
    kw = dict(pool_size=2, prompt_len=7, max_new_tokens=max_new, chunk=2,
              temperature=0.0, do_sample=False, eos_token_id=EOS,
              pad_token_id=PAD, prefix_len=2 + cfg.num_video_tokens)
    plain = ContinuousServer(params, cfg, **kw)
    pref = _prefixize(params, cfg, reqs, plain.max_len)
    qs = [p._replace(prefix=pref[0].prefix) for p in pref]
    got_plain = plain.serve(qs)
    piped = ContinuousServer(params, cfg, shared_prefix=True,
                             pipeline_chunks=True, chunk_long=3, **kw)
    got_piped = piped.serve(qs)
    spec = ContinuousServer(params, cfg, shared_prefix=True,
                            pipeline_chunks=True, spec_draft_len=2, **kw)
    got_spec = spec.serve(qs)
    for i, (a, b, c) in enumerate(zip(got_plain, got_piped, got_spec)):
        np.testing.assert_array_equal(a, b), i
        np.testing.assert_array_equal(a, c), i


def test_pipelined_scheduler_matches_reference(micro_model):
    """The threaded scheduler's pipelined loop (inflight chunk carried
    across iterations) resolves futures to the same greedy outputs."""
    from grounded_video_llm_tpu.serve.continuous import ContinuousScheduler

    cfg, params = micro_model
    reqs = _make_requests(cfg, 3)
    server = ContinuousServer(params, cfg, pool_size=2, prompt_len=10,
                              max_new_tokens=5, chunk=2,
                              temperature=0.0, do_sample=False,
                              eos_token_id=EOS, pad_token_id=PAD,
                              pipeline_chunks=True)
    sched = ContinuousScheduler(server)
    try:
        futs = [sched.submit(r) for r in reqs]
        outs = [f.result(timeout=300) for f in futs]
    finally:
        sched.shutdown()
    for req, out in zip(reqs, outs):
        want = _reference_greedy(params, cfg, req, 5)
        np.testing.assert_array_equal(out, want)


def test_warmup_is_transparent(micro_model):
    """warmup() pre-compiles the pool's programs (admission + chunk +
    chunk_long) and must leave the server indistinguishable from a fresh
    one — identical greedy outputs, plain and cascade flavors."""
    cfg, params = micro_model
    reqs = _make_requests(cfg, 2)
    kw = dict(pool_size=2, prompt_len=10, max_new_tokens=6, chunk=2,
              chunk_long=4, temperature=0.0, do_sample=False,
              eos_token_id=EOS, pad_token_id=PAD)
    base = ContinuousServer(params, cfg, **kw).serve(reqs)
    warmed = ContinuousServer(params, cfg, **kw)
    warmed.warmup(kind="pixels")
    np.testing.assert_array_equal(base[0], warmed.serve(reqs)[0])

    pkw = dict(pool_size=2, prompt_len=7, max_new_tokens=6, chunk=2,
               temperature=0.0, do_sample=False, eos_token_id=EOS,
               pad_token_id=PAD, prefix_len=2 + cfg.num_video_tokens)
    plain = ContinuousServer(params, cfg, **pkw)
    pref = _prefixize(params, cfg, reqs, plain.max_len)
    qs = [p._replace(prefix=pref[0].prefix) for p in pref]
    got_plain = plain.serve(qs)
    cascade = ContinuousServer(params, cfg, shared_prefix=True, **pkw)
    cascade.warmup()  # default kind: prefix-backed
    got = cascade.serve(qs)
    for i, (a, b) in enumerate(zip(got_plain, got)):
        np.testing.assert_array_equal(a, b), i
