"""Speculative (multi-token) decoding: prompt-lookup drafts + one-pass verify.

Decode on this box is DMA-bound (CLAUDE.md: the int8 cache + int8 weight
stacks stream once per token at the ~515 GB/s plateau; every compute-side
lever measured a dead end). Speculative decoding is the one lever left that
changes the DMA *economics*: a verify pass streams cache + weights ONCE to
score S candidate tokens (llm.verify_step), so each accepted draft token is
nearly free. With acceptance rate α per draft and S-1 drafts, expected
committed tokens/pass = (1-α^S)/(1-α) for ~1 decode-pass of traffic.

Drafting is DEVICE-SIDE prompt-lookup (n-gram): propose the tokens that
followed the most recent earlier occurrence of the current bigram in the
prompt + generated stream — zero extra model, zero host round-trips (a host
drafter would pay the 25-30 ms axon dispatch per step, twice the token
itself). This is the assisted-generation / prompt-lookup scheme from the HF
generation stack the reference inherits (SURVEY §3.5) — video QA/grounding
answers echo prompt n-grams (timestamps, object phrases) — re-expressed as a
fixed-shape in-jit loop.

Correctness contracts (tests/test_spec_decode.py):
  * greedy: speculative == lockstep `generate_tokens` token-for-token for
    ANY drafter (emitted tokens are always the model's own argmax; drafts
    only decide how many commit per pass);
  * sampling: deterministic (delta) drafts use the Leviathan et al.
    rejection rule — accept draft d at a position with prob p(d), else
    sample the residual p with d zeroed, renormalized — so each emitted
    token is marginally an EXACT sample from the model distribution
    (temperature/top-p applied), verified distributionally in tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import VLMConfig
from ..models import llm as llm_mod
from ..models import vlm


def ngram_draft(buf: jnp.ndarray, ptr: jnp.ndarray, draft_len: int
                ) -> jnp.ndarray:
    """Prompt-lookup drafting: for each row, find the most recent earlier
    position whose context matches the committed tail — TRIGRAM first
    (stronger evidence → higher acceptance), bigram fallback — and propose
    the draft_len tokens that followed it. No match → proposes from the
    buffer head (harmless: wrong drafts cost nothing, the verify pass runs
    anyway).

    buf [B, C]: committed token ids (left-padded prompt then generated,
    pad-filled tail); ptr [B]: index one past the last committed token."""
    B, C = buf.shape
    t1 = jnp.take_along_axis(buf, jnp.maximum(ptr - 1, 0)[:, None], 1)
    t2 = jnp.take_along_axis(buf, jnp.maximum(ptr - 2, 0)[:, None], 1)
    t3 = jnp.take_along_axis(buf, jnp.maximum(ptr - 3, 0)[:, None], 1)
    pos = jnp.arange(1, C)[None, :]                     # match END index
    m2 = (buf[:, :-1] == t2) & (buf[:, 1:] == t1)       # [B, C-1]
    m3 = jnp.concatenate(
        [jnp.zeros((B, 1), bool), m2[:, 1:] & (buf[:, :-2] == t3)], axis=1)
    earlier = pos < (ptr - 1)[:, None]
    best3 = jnp.max(jnp.where(m3 & earlier, pos, -1), axis=-1)  # [B]
    best2 = jnp.max(jnp.where(m2 & earlier, pos, -1), axis=-1)
    best = jnp.where(best3 >= 0, best3, best2)
    start = jnp.where(best >= 0, best + 1, 0)
    idx = jnp.minimum(start[:, None] + jnp.arange(draft_len)[None, :], C - 1)
    return jnp.take_along_axis(buf, idx, 1)             # [B, draft_len]


def table_draft(table: jnp.ndarray, ptr: jnp.ndarray, draft_len: int
                ) -> jnp.ndarray:
    """External-drafter lookup: propose table[b, ptr .. ptr+K-1].

    `table` is aligned with the committed buffer (prompt then generated
    positions): a retrieval hit, an offline draft-model output, or — in
    scripts/bench_spec_decode.py's acceptance-curve mode — the model's own
    greedy stream with controlled corruption. Out-of-range reads clamp to
    the last column (wrong drafts cost nothing; the verify emits ≥1 real
    token per pass regardless)."""
    idx = jnp.minimum(ptr[:, None] + jnp.arange(draft_len)[None, :],
                      table.shape[1] - 1)
    return jnp.take_along_axis(table.astype(jnp.int32), idx, 1)


def _top_p_filter(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """HF top-p semantics (serve.generate.sample_logits) on any [..., V]."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    cutoff = (cum - sorted_probs) >= top_p
    thr = jnp.where(cutoff, jnp.inf, sorted_logits).min(-1, keepdims=True)
    return jnp.where(logits < thr, -jnp.inf, logits)


def spec_accept_tokens(
    logits: jnp.ndarray,     # [B, S_v, V] verify logits (S_v = K drafts + 1)
    drafts: jnp.ndarray,     # [B, K] deterministic draft tokens
    rng: jax.Array,
    temperature: float,
    top_p: Optional[float],
    do_sample: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The per-pass accept/emit rule → (a [B], emitted [B, S_v]).

    a = number of emitted (and committed-input) tokens this pass, in
    [1, S_v]; emitted[:, :a] are the tokens: accepted drafts then one fresh
    token (residual sample on rejection / bonus on full acceptance).

    Greedy: accept while draft == argmax; fresh token = argmax.
    Sampling (delta drafts): accept draft d_i with prob p_i(d_i); on
    rejection sample from max(0, p_i - 1{d_i}) renormalized — the exact
    distribution-preserving rule for a deterministic drafter; on full
    acceptance the bonus samples p_K directly."""
    B, S_v, V = logits.shape
    K = S_v - 1
    iidx = jnp.arange(S_v)[None, :]
    if do_sample and temperature > 0.0:
        lg = logits.astype(jnp.float32) / temperature
        if top_p is not None and top_p < 1.0:
            lg = _top_p_filter(lg, top_p)
        p = jax.nn.softmax(lg, axis=-1)                  # [B, S_v, V]
        r_accept, r_tok = jax.random.split(rng)
        pd = jnp.take_along_axis(p[:, :K], drafts[..., None], -1)[..., 0]
        accept = jax.random.uniform(r_accept, (B, K)) < pd
        # fresh token per position: residual at 0..K-1, plain sample at K
        onehot = jax.nn.one_hot(drafts, V, dtype=p.dtype)      # [B, K, V]
        resid = jnp.maximum(p[:, :K] - onehot, 0.0)
        # all-zero residual ⇔ p(d)=1 ⇔ acceptance was certain; the guard
        # row is never used but categorical needs finite logits
        resid = jnp.where(jnp.sum(resid, -1, keepdims=True) > 0.0,
                          resid, 1.0 / V)
        fresh_r = jax.random.categorical(r_tok, jnp.log(resid), axis=-1)
        fresh_b = jax.random.categorical(r_tok, lg[:, K:], axis=-1)
        fresh = jnp.concatenate([fresh_r, fresh_b], axis=1).astype(jnp.int32)
    else:
        fresh = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, S_v]
        accept = drafts == fresh[:, :-1]
    a = 1 + jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=-1), axis=-1)
    drafts_ext = jnp.concatenate(
        [drafts, jnp.zeros((B, 1), jnp.int32)], axis=1)        # [B, S_v]
    emitted = jnp.where(iidx < (a - 1)[:, None], drafts_ext, fresh)
    return a, emitted


class SpecState(NamedTuple):
    cache: object               # QuantKVCache
    valid_mask: jnp.ndarray     # [B, max_len]
    pos_next: jnp.ndarray       # [B] position id of the next fed token
    buf: jnp.ndarray            # [B, S_prompt + max_new] committed ids
    step: jnp.ndarray           # [B] per-row emitted count
    done: jnp.ndarray           # [B]
    rng: jax.Array
    passes: jnp.ndarray         # [] verify passes run (acceptance stats)


def _spec_from_features(
    params,
    cfg: VLMConfig,
    input_ids: jnp.ndarray,       # [B, S] left-padded, one IMAGE_TOKEN_INDEX
    attn_mask: jnp.ndarray,       # [B, S]
    video_features: jnp.ndarray,  # [B, NV, H_llm]
    rng: jax.Array,
    *,
    max_new_tokens: int,
    draft_len: int,
    temperature: float,
    top_p: Optional[float],
    do_sample: bool,
    eos_token_id: int,
    pad_token_id: int,
    draft_table: Optional[jnp.ndarray] = None,
    with_stats: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Shared splice → prefill → draft/verify loop body, traced under both
    the fused pixels-in program (generate_tokens_spec) and the from-features
    program (generate_tokens_spec_from_features, the feature-cache path).

    draft_table [B, ≥S+max_new]: buf-aligned external drafts (table_draft)
    replacing the n-gram lookup. with_stats appends the verify-pass count to
    the return — accepted-drafts/pass = mean(lengths)/passes − 1 measures
    drafter quality on a real workload."""
    B, S = input_ids.shape
    S_v = draft_len + 1                                  # tokens per verify
    embeds, _, mask = vlm.splice_multimodal(
        input_ids, None, attn_mask, video_features, params["llm"]["embed"])
    S_full = embeds.shape[1]
    # + draft margin: a verify pass may write S_v slots past the last
    # committed token of a nearly-finished row
    max_len = -(-(S_full + max_new_tokens + S_v) // 128) * 128

    cache = llm_mod.KVCache.create(cfg.llm, B, max_len, dtype=embeds.dtype)
    logits, cache = llm_mod.prefill(params["llm"], cfg.llm, embeds, mask,
                                    cache, quantize_cache=True)

    valid0 = jnp.zeros((B, max_len), bool).at[:, :S_full].set(
        mask.astype(bool))
    pos0 = jnp.sum(mask, axis=-1).astype(jnp.int32)
    from .generate import sample_logits

    rng, sub = jax.random.split(rng)
    tok0 = sample_logits(logits, sub, temperature, top_p, do_sample)
    C = S + max_new_tokens
    buf0 = jnp.concatenate(
        [input_ids.astype(jnp.int32),
         jnp.full((B, max_new_tokens), pad_token_id, jnp.int32)], axis=1)
    buf0 = buf0.at[:, S].set(tok0)
    done0 = tok0 == eos_token_id
    state = SpecState(cache, valid0, pos0, buf0,
                      jnp.ones((B,), jnp.int32), done0, rng,
                      jnp.zeros((), jnp.int32))

    iidx = jnp.arange(S_v)[None, :]                      # [1, S_v]
    rows = jnp.arange(B)[:, None]

    def cond(st: SpecState):
        return jnp.any(~st.done & (st.step < max_new_tokens))

    def body(st: SpecState):
        alive = ~st.done & (st.step < max_new_tokens)
        ptr = S + st.step
        if draft_table is not None:
            drafts = table_draft(draft_table, ptr, draft_len)
        else:
            drafts = ngram_draft(st.buf, ptr, draft_len)  # [B, K]
        cur = jnp.take_along_axis(st.buf, (ptr - 1)[:, None], 1)  # [B, 1]
        inputs = jnp.concatenate([cur, drafts], axis=1)  # [B, S_v]
        token_embeds = llm_mod.embed_lookup(params["llm"]["embed"], inputs)
        positions = st.pos_next[:, None] + iidx          # [B, S_v]
        logits, cache = llm_mod.verify_step(
            params["llm"], cfg.llm, token_embeds, st.cache, st.valid_mask,
            positions)
        rng, sub = jax.random.split(st.rng)
        a, emitted = spec_accept_tokens(logits, drafts, sub, temperature,
                                        top_p, do_sample)

        cache, valid = llm_mod.commit_verify(
            cache, st.valid_mask, jnp.where(alive, a, 0), S_v)

        # emitted count e = a, cut at EOS and the token budget
        is_eos = (emitted == eos_token_id) & (iidx < a[:, None])
        eos_pos = jnp.min(jnp.where(is_eos, iidx, S_v), axis=-1)
        e = jnp.minimum(jnp.minimum(a, eos_pos + 1),
                        max_new_tokens - st.step)
        e = jnp.where(alive, e, 0)

        cols = jnp.where(iidx < e[:, None], S + st.step[:, None] + iidx, C)
        buf = st.buf.at[rows, cols].set(emitted, mode="drop")
        done = st.done | jnp.any(is_eos & (iidx < e[:, None]), axis=-1)
        return SpecState(cache, valid, st.pos_next + e, buf,
                         st.step + e, done, rng, st.passes + 1)

    final = jax.lax.while_loop(cond, body, state)
    out = final.buf[:, S:]
    lengths = jnp.sum(out != pad_token_id, axis=-1)
    if with_stats:
        return out, lengths, final.passes
    return out, lengths


_SPEC_STATICS = ("cfg", "max_new_tokens", "draft_len", "temperature",
                 "top_p", "do_sample", "eos_token_id", "pad_token_id",
                 "with_stats")


@functools.partial(jax.jit, static_argnames=_SPEC_STATICS)
def generate_tokens_spec(
    params,
    cfg: VLMConfig,
    input_ids: jnp.ndarray,       # [B, S] left-padded, one IMAGE_TOKEN_INDEX
    attn_mask: jnp.ndarray,       # [B, S]
    spatial_pixels: jnp.ndarray,
    temporal_pixels: jnp.ndarray,
    rng: jax.Array,
    *,
    max_new_tokens: int,
    draft_len: int = 4,
    temperature: float = 0.0,
    top_p: Optional[float] = None,
    do_sample: bool = False,
    eos_token_id: int = 2,
    pad_token_id: int = 0,
    draft_table: Optional[jnp.ndarray] = None,
    with_stats: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Speculative generation → (tokens [B, max_new], lengths [B]).

    Same contract as serve.generate.generate_tokens with quantize_cache=True
    (verify_step requires the int8 cache). Greedy is token-exact vs
    lockstep; sampling is distribution-exact (see module docstring) but
    consumes randomness differently, so individual runs differ from
    lockstep runs the way two lockstep seeds differ from each other.
    draft_table/with_stats: external drafts + pass-count return (see
    _spec_from_features)."""
    video_features = vlm.encode_video(params, cfg, spatial_pixels,
                                      temporal_pixels)
    return _spec_from_features(
        params, cfg, input_ids, attn_mask, video_features, rng,
        max_new_tokens=max_new_tokens, draft_len=draft_len,
        temperature=temperature, top_p=top_p, do_sample=do_sample,
        eos_token_id=eos_token_id, pad_token_id=pad_token_id,
        draft_table=draft_table, with_stats=with_stats)


@functools.partial(jax.jit, static_argnames=_SPEC_STATICS)
def generate_tokens_spec_from_prefix(
    params,
    cfg: VLMConfig,
    post_ids: jnp.ndarray,      # [B, Sq] left-padded question chunk
    post_mask: jnp.ndarray,     # [B, Sq]
    prefix_k: jnp.ndarray,      # [L, 1, Sp, Hkv, Dh] bf16 (build_prefix_kv)
    prefix_v: jnp.ndarray,
    prefix_mask: jnp.ndarray,   # [1, Sp]
    rng: jax.Array,
    *,
    max_new_tokens: int,
    draft_len: int = 4,
    temperature: float = 0.0,
    top_p: Optional[float] = None,
    do_sample: bool = False,
    eos_token_id: int = 2,
    pad_token_id: int = 0,
    draft_table: Optional[jnp.ndarray] = None,
    with_stats: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Speculative generation over the shared-prefix CASCADE cache: the two
    decode DMA levers compound — each verify pass streams the cache once
    for draft_len+1 candidate tokens (this module), and the per-video
    prefix segment streams once for the whole BATCH instead of per row
    (llm.decode_step_shared's layout, here via llm.verify_step_shared).
    Greedy is token-exact vs lockstep; drafting context is the question
    chunk + generated tokens (the prefix's video tokens are not draftable
    text). Same contract as generate_tokens_spec otherwise."""
    B, Sq = post_ids.shape
    Sp = prefix_k.shape[2]
    S_v = draft_len + 1
    max_len = -(-(Sp + Sq + max_new_tokens + S_v) // 128) * 128
    tail_len = -(-(Sq + max_new_tokens + S_v) // 128) * 128
    lp = params["llm"]
    chunk_embeds = llm_mod.embed_lookup(lp["embed"], post_ids,
                                        llm_mod.embed_dtype(lp["embed"]))
    logits, cache, tail_valid, pos0 = llm_mod.prefill_continue(
        lp, cfg.llm, chunk_embeds, post_mask, prefix_k, prefix_v,
        prefix_mask, max_len, quantize_cache=True, tail_len=tail_len)

    from .generate import sample_logits

    rng, sub = jax.random.split(rng)
    tok0 = sample_logits(logits, sub, temperature, top_p, do_sample)
    C = Sq + max_new_tokens
    buf0 = jnp.concatenate(
        [post_ids.astype(jnp.int32),
         jnp.full((B, max_new_tokens), pad_token_id, jnp.int32)], axis=1)
    buf0 = buf0.at[:, Sq].set(tok0)
    done0 = tok0 == eos_token_id
    state = SpecState(cache, tail_valid, pos0, buf0,
                      jnp.ones((B,), jnp.int32), done0, rng,
                      jnp.zeros((), jnp.int32))

    iidx = jnp.arange(S_v)[None, :]
    rows = jnp.arange(B)[:, None]

    def cond(st: SpecState):
        return jnp.any(~st.done & (st.step < max_new_tokens))

    def body(st: SpecState):
        alive = ~st.done & (st.step < max_new_tokens)
        ptr = Sq + st.step
        if draft_table is not None:
            drafts = table_draft(draft_table, ptr, draft_len)
        else:
            drafts = ngram_draft(st.buf, ptr, draft_len)
        cur = jnp.take_along_axis(st.buf, (ptr - 1)[:, None], 1)
        inputs = jnp.concatenate([cur, drafts], axis=1)
        token_embeds = llm_mod.embed_lookup(params["llm"]["embed"], inputs)
        positions = st.pos_next[:, None] + iidx
        logits, cache = llm_mod.verify_step_shared(
            params["llm"], cfg.llm, token_embeds, st.cache, st.valid_mask,
            positions, rope_hint=max_len)
        rng, sub = jax.random.split(st.rng)
        a, emitted = spec_accept_tokens(logits, drafts, sub, temperature,
                                        top_p, do_sample)

        tail, valid = llm_mod.commit_verify(
            cache.tail, st.valid_mask, jnp.where(alive, a, 0), S_v)
        cache = cache._replace(tail=tail)

        is_eos = (emitted == eos_token_id) & (iidx < a[:, None])
        eos_pos = jnp.min(jnp.where(is_eos, iidx, S_v), axis=-1)
        e = jnp.minimum(jnp.minimum(a, eos_pos + 1),
                        max_new_tokens - st.step)
        e = jnp.where(alive, e, 0)

        cols = jnp.where(iidx < e[:, None], Sq + st.step[:, None] + iidx, C)
        buf = st.buf.at[rows, cols].set(emitted, mode="drop")
        done = st.done | jnp.any(is_eos & (iidx < e[:, None]), axis=-1)
        return SpecState(cache, valid, st.pos_next + e, buf,
                         st.step + e, done, rng, st.passes + 1)

    final = jax.lax.while_loop(cond, body, state)
    out = final.buf[:, Sq:]
    lengths = jnp.sum(out != pad_token_id, axis=-1)
    if with_stats:
        return out, lengths, final.passes
    return out, lengths


@functools.partial(jax.jit, static_argnames=_SPEC_STATICS)
def generate_tokens_spec_from_features(
    params,
    cfg: VLMConfig,
    input_ids: jnp.ndarray,       # [B, S]
    attn_mask: jnp.ndarray,       # [B, S]
    video_features: jnp.ndarray,  # [B, NV, H_llm]
    rng: jax.Array,
    *,
    max_new_tokens: int,
    draft_len: int = 4,
    temperature: float = 0.0,
    top_p: Optional[float] = None,
    do_sample: bool = False,
    eos_token_id: int = 2,
    pad_token_id: int = 0,
    draft_table: Optional[jnp.ndarray] = None,
    with_stats: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """generate_tokens_spec from PRECOMPUTED video features — the
    feature-cache path (serve/engine.run_stream_cached): eval workloads with
    repeated videos compound the encode dedup with the verify-pass decode
    amortization. Token-identical to generate_tokens_spec given the same
    features and rng."""
    return _spec_from_features(
        params, cfg, input_ids, attn_mask, video_features, rng,
        max_new_tokens=max_new_tokens, draft_len=draft_len,
        temperature=temperature, top_p=top_p, do_sample=do_sample,
        eos_token_id=eos_token_id, pad_token_id=pad_token_id,
        draft_table=draft_table, with_stats=with_stats)
