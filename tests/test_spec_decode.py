"""Speculative multi-token decode: verify-attention kernel, multi-slot cache
commit, verify_step/commit_verify, and the in-jit spec-decode loop.

The verify path amortizes the decode DMA economics (CLAUDE.md: decode
attention streams the whole int8 cache per token at the box's 515 GB/s
plateau) over S draft tokens: one cache stream scores S queries. Exactness
contract: greedy speculative decoding emits the SAME tokens as greedy
lockstep decoding for ANY drafter (the verify logits are the model's own).
"""

import jax
import jax.numpy as jnp
import numpy as np

from grounded_video_llm_tpu.ops.cache_write import (
    scatter_write_kv_multi, scatter_write_scale_multi)
from grounded_video_llm_tpu.ops.decode_attention_int8 import (
    decode_attention_int8, quantize_kv, verify_attention_int8)


def _to_quant_layout(k, v):
    """[B, L, Hkv, D] float → head-major transposed int8 cache pieces."""
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    kq = kq.transpose(0, 2, 3, 1)
    vq = vq.transpose(0, 2, 3, 1)
    ks = ks.transpose(0, 2, 1)[:, :, None, :]
    vs = vs.transpose(0, 2, 1)[:, :, None, :]
    return kq, ks, vq, vs


def _ref_verify(q, k_cache, v_cache, mask, k_new, v_new, scale):
    """Reference S-query attention: cache slots per mask + causal new block.

    q [B,S,H,D]; caches [B,L,Hkv,D]; mask [B,S,L] bool; new [B,S,Hkv,D].
    Head order (hkv, g): head h uses kv head h // G."""
    B, S, H, D = q.shape
    L = k_cache.shape[1]
    Hkv = k_cache.shape[2]
    G = H // Hkv
    k_all = jnp.concatenate([k_cache, k_new], axis=1)   # [B, L+S, Hkv, D]
    v_all = jnp.concatenate([v_cache, v_new], axis=1)
    causal = jnp.tril(jnp.ones((S, S), bool))
    mask_all = jnp.concatenate(
        [mask.astype(bool), jnp.broadcast_to(causal[None], (B, S, S))],
        axis=-1)                                        # [B, S, L+S]
    kv_idx = jnp.arange(H) // G
    kh = k_all[:, :, kv_idx]                            # [B, L+S, H, D]
    vh = v_all[:, :, kv_idx]
    scores = jnp.einsum("bshd,blhd->bhsl", q.astype(jnp.float32),
                        kh.astype(jnp.float32)) * scale
    scores = jnp.where(mask_all[:, None], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhsl,blhd->bshd", p, vh.astype(jnp.float32))
    return out


def test_verify_attention_matches_reference():
    rng = np.random.default_rng(7)
    B, L, Hkv, G, D, S = 2, 32, 2, 2, 16, 4
    H = Hkv * G
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, Hkv, D)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    # ragged validity incl. fully-padded tail slots
    mask = np.ones((B, L), np.int32)
    mask[0, :7] = 0
    mask[1, :3] = 0
    mask = jnp.asarray(np.broadcast_to(mask[:, None, :], (B, S, L)))

    kq, ks, vq, vs = _to_quant_layout(k, v)
    got = verify_attention_int8(
        q.astype(jnp.bfloat16), kq, ks, vq, vs, mask,
        kn.astype(jnp.bfloat16), vn.astype(jnp.bfloat16), scale=D ** -0.5)
    ref = _ref_verify(q, k, v, mask, kn, vn, D ** -0.5)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=0.1,
                               atol=0.05)


def test_verify_attention_s1_matches_decode_attention():
    """With one new token, verify attention IS decode attention."""
    rng = np.random.default_rng(9)
    B, L, Hkv, G, D = 2, 16, 2, 2, 16
    H = Hkv * G
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, L, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, Hkv, D)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.bfloat16)
    vn = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.bfloat16)
    mask = jnp.asarray(
        np.concatenate([np.ones((B, 10)), np.zeros((B, 6))], axis=1),
        jnp.int32)
    kq, ks, vq, vs = _to_quant_layout(k, v)
    ref = decode_attention_int8(q, kq, ks, vq, vs, mask, kn, vn,
                                scale=D ** -0.5)
    got = verify_attention_int8(q, kq, ks, vq, vs,
                                mask[:, None, :], kn, vn, scale=D ** -0.5)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=0.02,
                               atol=0.01)


def test_scatter_write_kv_multi():
    rng = np.random.default_rng(11)
    L, B, Hkv, D, S, max_len = 2, 3, 2, 16, 5, 256
    cache = jnp.asarray(rng.integers(-100, 100, size=(L, B, Hkv, D, max_len)),
                        jnp.int8)
    new = jnp.asarray(rng.integers(-100, 100, size=(L, B, S, Hkv, D)),
                      jnp.int8)
    # row 0 mid-tile, row 1 SPANS the 128-lane tile boundary, row 2 at the
    # array edge (idx + S == max_len, second tile clamps + idempotent rewrite)
    idx = jnp.asarray([40, 126, max_len - S], jnp.int32)
    got = np.asarray(scatter_write_kv_multi(cache, new, idx))
    want = np.asarray(cache).copy()
    for b, base in enumerate([40, 126, max_len - S]):
        for s in range(S):
            want[:, b, :, :, base + s] = np.asarray(new)[:, b, s]
    np.testing.assert_array_equal(got, want)


def _micro_llm_setup(B=2, S=8, seed=0):
    """Random micro LLM + quantized prefill cache on a left-padded prompt."""
    from grounded_video_llm_tpu.core.config import micro_vlm_config
    from grounded_video_llm_tpu.models import llm as llm_mod

    cfg = micro_vlm_config("phi3.5").llm
    params = llm_mod.init_params(jax.random.key(seed), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    embeds = jnp.asarray(rng.normal(size=(B, S, cfg.hidden_size)) * 0.1,
                         jnp.float32)
    mask = np.ones((B, S), np.int32)
    mask[0, :2] = 0                                  # left padding
    mask = jnp.asarray(mask)
    max_len = 128
    cache = llm_mod.KVCache.create(cfg, B, max_len)
    logits, cache = llm_mod.prefill(params, cfg, embeds, mask, cache,
                                    quantize_cache=True)
    valid = jnp.zeros((B, max_len), bool).at[:, :S].set(mask.astype(bool))
    pos0 = jnp.sum(mask, axis=-1).astype(jnp.int32)
    return cfg, params, cache, valid, pos0, logits


def test_verify_step_matches_sequential_decode():
    """verify_step's S logits == S sequential decode_step logits, and the
    fully-committed caches agree (same quantized writes, multi vs single)."""
    from grounded_video_llm_tpu.models import llm as llm_mod

    cfg, params, cache0, valid0, pos0, logits0 = _micro_llm_setup()
    B = 2
    S_v = 3
    rng = np.random.default_rng(5)
    toks = jnp.asarray(rng.integers(3, cfg.vocab_size, size=(B, S_v)),
                       jnp.int32)

    # sequential decode_steps
    cache, valid = cache0, valid0
    seq_logits = []
    for i in range(S_v):
        emb = llm_mod.embed_lookup(params["embed"], toks[:, i])[:, None, :]
        lg, cache, valid = llm_mod.decode_step(
            params, cfg, emb.astype(jnp.float32), cache, valid, pos0 + i)
        seq_logits.append(lg)
    seq_logits = jnp.stack(seq_logits, axis=1)           # [B, S_v, V]

    # one verify pass + full commit
    embs = llm_mod.embed_lookup(params["embed"], toks).astype(jnp.float32)
    positions = pos0[:, None] + jnp.arange(S_v)[None, :]
    v_logits, v_cache = llm_mod.verify_step(params, cfg, embs, cache0,
                                            valid0, positions)
    v_cache, v_valid = llm_mod.commit_verify(
        v_cache, valid0, jnp.full((B,), S_v, jnp.int32), S_v)

    np.testing.assert_allclose(np.asarray(v_logits, np.float32),
                               np.asarray(seq_logits, np.float32),
                               rtol=0.05, atol=0.05)
    np.testing.assert_array_equal(np.asarray(v_valid), np.asarray(valid))
    np.testing.assert_array_equal(np.asarray(v_cache.length),
                                  np.asarray(cache.length))
    # k/v math is identical but accumulation ORDER differs (one [B*S, D]
    # GEMM vs S [B, 1, D] GEMMs) → the int8 rounding can flip by 1 on a
    # handful of elements near the .5 boundary
    np.testing.assert_allclose(np.asarray(v_cache.k, np.float32),
                               np.asarray(cache.k, np.float32), atol=1)
    np.testing.assert_allclose(np.asarray(v_cache.v, np.float32),
                               np.asarray(cache.v, np.float32), atol=1)


def test_ngram_draft():
    from grounded_video_llm_tpu.serve.speculative import ngram_draft

    buf = jnp.asarray([[5, 6, 7, 8, 9, 5, 6, 0, 0, 0],
                       [1, 2, 3, 4, 1, 2, 9, 9, 0, 0]], jnp.int32)
    ptr = jnp.asarray([7, 6], jnp.int32)  # committed prefixes end here
    # row 0: bigram (5,6) recurs at pos 0-1 → drafts = buf[2:5] = 7,8,9
    # row 1: bigram (1,2) recurs at pos 0-1 → drafts = buf[2:5] = 3,4,1
    drafts = np.asarray(ngram_draft(buf, ptr, 3))
    np.testing.assert_array_equal(drafts, [[7, 8, 9], [3, 4, 1]])
    # no match → start 0 fallback
    buf2 = jnp.asarray([[1, 2, 3, 4, 5, 0, 0, 0]], jnp.int32)
    d2 = np.asarray(ngram_draft(buf2, jnp.asarray([5]), 2))
    np.testing.assert_array_equal(d2, [[1, 2]])
    # trigram beats the more recent bigram-only match: tail (8,1,2); the
    # bigram (1,2) recurs at pos 6-7 (context 7 — wrong) and pos 1-2
    # (context 8 — right); the trigram match wins → drafts [5, 9, 7]
    buf3 = jnp.asarray([[8, 1, 2, 5, 9, 7, 1, 2, 4, 6, 8, 1, 2, 0, 0, 0]],
                       jnp.int32)
    d3 = np.asarray(ngram_draft(buf3, jnp.asarray([13]), 3))
    np.testing.assert_array_equal(d3, [[5, 9, 7]])


def test_spec_generate_matches_greedy_lockstep():
    """Exactness: greedy speculative generation == greedy lockstep with the
    int8 cache, token for token (drafts only change how many commit/pass)."""
    from grounded_video_llm_tpu.core.config import micro_vlm_config
    from grounded_video_llm_tpu.models import vlm
    from grounded_video_llm_tpu.serve.generate import generate_tokens
    from grounded_video_llm_tpu.serve.speculative import generate_tokens_spec
    from grounded_video_llm_tpu.text.templates import IMAGE_TOKEN_INDEX

    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)
    B, S = 2, 8
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 50, size=(B, S)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    mask = np.ones((B, S), np.int32)
    mask[1, 0] = 0
    spatial = np.zeros((B, cfg.num_segs, 336, 336, 3), np.float32)
    temporal = np.zeros((B, cfg.num_frames, 224, 224, 3), np.float32)
    args = (params, cfg, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(spatial), jnp.asarray(temporal))
    ref, ref_len = generate_tokens(
        *args, jax.random.key(0), max_new_tokens=6, do_sample=False,
        temperature=0.0, eos_token_id=-2, pad_token_id=0,
        quantize_cache=True)
    got, got_len = generate_tokens_spec(
        *args, jax.random.key(0), max_new_tokens=6, draft_len=3,
        do_sample=False, temperature=0.0, eos_token_id=-2, pad_token_id=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(got_len), np.asarray(ref_len))

    # sampled smoke: same loop with the rejection rule; valid token range
    got_s, len_s = generate_tokens_spec(
        *args, jax.random.key(1), max_new_tokens=6, draft_len=3,
        do_sample=True, temperature=0.7, eos_token_id=-2, pad_token_id=0)
    got_s = np.asarray(got_s)
    assert got_s.shape == (B, 6)
    v_total = cfg.llm.vocab_size + cfg.llm.num_extra_tokens  # logits dim
    assert (got_s >= 0).all() and (got_s < v_total).all()
    assert (np.asarray(len_s) == 6).all()


def test_spec_table_drafter_and_stats():
    """External draft-table drafter (table_draft): greedy output stays
    token-exact vs lockstep at ANY table content; an oracle table (the
    model's own greedy stream) commits draft_len+1 tokens/pass (pass count
    via with_stats), a fully-corrupted table degrades to 1 token/pass —
    the acceptance-curve machinery of scripts/bench_spec_decode.py."""
    from grounded_video_llm_tpu.core.config import micro_vlm_config
    from grounded_video_llm_tpu.models import vlm
    from grounded_video_llm_tpu.serve.generate import \
        generate_tokens_from_features
    from grounded_video_llm_tpu.serve.speculative import \
        generate_tokens_spec_from_features
    from grounded_video_llm_tpu.text.templates import IMAGE_TOKEN_INDEX

    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)
    B, S, NEW, K = 2, 8, 6, 3
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 50, size=(B, S)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    mask = jnp.ones((B, S), jnp.int32)
    feats = jnp.zeros((B, cfg.num_video_tokens, cfg.llm.hidden_size),
                      jnp.float32)
    kw = dict(max_new_tokens=NEW, temperature=0.0, do_sample=False,
              eos_token_id=-2, pad_token_id=0)
    ref, ref_len = generate_tokens_from_features(
        params, cfg, jnp.asarray(ids), mask, feats, jax.random.key(0),
        quantize_cache=True, **kw)

    # oracle table = prompt + the greedy stream itself → every draft accepts
    oracle = jnp.concatenate([jnp.asarray(ids), ref.astype(jnp.int32)], 1)
    got, got_len, passes = generate_tokens_spec_from_features(
        params, cfg, jnp.asarray(ids), mask, feats, jax.random.key(0),
        draft_len=K, draft_table=oracle, with_stats=True, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(got_len), np.asarray(ref_len))
    # NEW=6, K+1=4/pass: first token from prefill, then ceil(5/4)=2 passes
    assert int(passes) == 2, int(passes)

    # fully-corrupted table: still exact, but every pass commits 1 token
    bad = (oracle + 1) % 50
    got_b, _, passes_b = generate_tokens_spec_from_features(
        params, cfg, jnp.asarray(ids), mask, feats, jax.random.key(0),
        draft_len=K, draft_table=bad, with_stats=True, **kw)
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(ref))
    assert int(passes_b) == NEW - 1, int(passes_b)


def test_spec_accept_preserves_distribution():
    """Delta-draft rejection sampling: the marginal law of the first emitted
    token equals the model distribution exactly (Leviathan et al. for a
    deterministic drafter). Frequencies over 40k iid rows vs softmax probs."""
    from grounded_video_llm_tpu.serve.speculative import spec_accept_tokens

    B, V, temp = 40_000, 8, 0.8
    base_logits = jnp.asarray([1.2, 0.3, -0.5, 2.0, 0.0, -1.0, 0.7, -2.0],
                              jnp.float32)
    p = np.asarray(jax.nn.softmax(base_logits / temp))
    logits = jnp.broadcast_to(base_logits[None, None, :], (B, 2, V))
    draft_tok = 3                                       # the mode: p≈0.44
    drafts = jnp.full((B, 1), draft_tok, jnp.int32)
    a, emitted = spec_accept_tokens(logits, drafts, jax.random.key(7),
                                    temp, None, True)
    a, emitted = np.asarray(a), np.asarray(emitted)
    freq = np.bincount(emitted[:, 0], minlength=V) / B
    # 4σ at the largest bin ≈ 0.01
    np.testing.assert_allclose(freq, p, atol=0.012)
    # acceptance rate of the draft = p(draft)
    np.testing.assert_allclose((a == 2).mean(), p[draft_tok], atol=0.012)
    # accepted rows emit the draft; rejected rows never do (residual zeroes)
    assert (emitted[a == 2, 0] == draft_tok).all()
    assert (emitted[a == 1, 0] != draft_tok).all()


def test_scatter_write_scale_multi():
    rng = np.random.default_rng(12)
    L, B, Hkv, S, max_len = 2, 2, 3, 4, 256
    scales = jnp.asarray(rng.random(size=(L, B, Hkv, 1, max_len)), jnp.float32)
    new = jnp.asarray(rng.random(size=(L, B, S, Hkv)), jnp.float32)
    idx = jnp.asarray([126, max_len - S], jnp.int32)
    got = np.asarray(scatter_write_scale_multi(scales, new, idx))
    want = np.asarray(scales).copy()
    for b, base in enumerate([126, max_len - S]):
        for s in range(S):
            want[:, b, :, 0, base + s] = np.asarray(new)[:, b, s]
    np.testing.assert_allclose(got, want)
