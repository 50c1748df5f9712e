"""Slot-level continuous batching: admit new prefills into a running decode
pool.

The dynamic-batching scheduler (serve/scheduler.py) coalesces requests into
batches, but a batch then decodes in lockstep — a 64-token answer waits for
the 2048-token answer sharing its batch. Continuous batching instead keeps a
fixed pool of B decode slots over ONE shared quantized KV cache and:

  * prefills each arriving request alone (a batch-1 compiled program),
    INSERTS its cache rows into a free slot, and
  * decodes the whole pool in jitted chunks of `chunk` steps with per-row
    positions, per-row cache-slot writes (ops/cache_write scatter kernels —
    the per-row-index write that batch serving's shared-index write cannot
    do), and per-row EOS retirement (finished slots idle via decode_step's
    `active` mask and free immediately).

TPU-static-shape notes: everything is fixed-shape — the pool size, the cache
max_len, the chunk length, and the prompt bucket (prompts left-pad to
`prompt_len`). One compile for prefill, one for insert, one for the decode
chunk; admission and retirement are host-side bookkeeping between chunk
dispatches. On a single chip prefill and decode serialize, so admission
happens between chunks (chunked interleave); the win over lockstep batching
is slot-level occupancy under ragged output lengths, not overlap.

Requires quantized serving params (serve/quantize.py) — the pool cache is
the int8 QuantKVCache.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import VLMConfig
from ..models import llm as llm_mod
from ..models import vlm
from .generate import sample_logits


class PoolState(NamedTuple):
    cache: llm_mod.QuantKVCache     # [L, B_pool, ...]; the shared-prefix
    #                                 pool mode (ContinuousServer(
    #                                 shared_prefix=True)) stores a
    #                                 llm.SharedPrefixCache here instead and
    #                                 `valid` covers the per-slot TAIL only
    valid: jnp.ndarray              # [B_pool, max_len] bool
    positions: jnp.ndarray          # [B_pool] next position id
    cur_token: jnp.ndarray          # [B_pool] last sampled token
    active: jnp.ndarray             # [B_pool] bool
    rng: jax.Array
    # per-slot committed token ids (left-padded prompt then generated) +
    # one-past-last index — the device-side n-gram drafting context for
    # speculative chunks (serve/speculative.py). Maintained by _insert_row;
    # dead weight (a few KB) for lockstep chunks.
    buf: jnp.ndarray                # [B_pool, buf_len] int32
    ptr: jnp.ndarray                # [B_pool] int32


class _InflightChunk(NamedTuple):
    """A dispatched-but-unfetched decode chunk (pipeline_chunks=True): the
    device token arrays plus the DISPATCH-time slot→request snapshot that
    _process_chunk attributes them with (the live slot table may have moved
    on by the time the fetch lands)."""
    toks: jax.Array                   # [B_pool, chunk*toks_per_iter] device
    counts: Optional[jax.Array]       # [B_pool] device (spec) / None
    slot_req: tuple                   # slot → rid at dispatch
    slot_cb: tuple                    # slot → on_token at dispatch


class Request(NamedTuple):
    input_ids: np.ndarray           # [S] left-padded, one IMAGE_TOKEN_INDEX
    attn_mask: np.ndarray           # [S]
    spatial_pixels: np.ndarray      # [num_segs, 336, 336, 3]
    temporal_pixels: np.ndarray     # [num_frames, 224, 224, 3]
    max_new_tokens: Optional[int] = None  # per-request budget (ragged
    #                                       output lengths — the continuous-
    #                                       batching motivation); None →
    #                                       the server default
    on_token: Optional[object] = None  # callable(int) fired host-side for
    #                                    each generated token (EOS excluded)
    #                                    as its decode chunk lands — slot-
    #                                    level streaming (pair with
    #                                    text.streaming.TokenTextStream for
    #                                    incremental text). Latency =
    #                                    chunk x ms/token.
    features: Optional[np.ndarray] = None  # [NV, H_llm] precomputed
    #                                    vlm.encode_video features (e.g. the
    #                                    engine's video-feature cache for
    #                                    repeated-video workloads). When set,
    #                                    pixels are ignored (pass zeros) and
    #                                    admission prefill skips the encoders
    #                                    — encode was ~80% of the measured
    #                                    batch-1 admission cost.
    prefix: Optional[tuple] = None  # (k, v, mask) bf16 prefix KV from
    #                                    serve.generate.build_prefix_kv (the
    #                                    engine's prefix-KV cache). When set,
    #                                    input_ids/attn_mask hold only the
    #                                    POST-image question chunk and
    #                                    admission pays just the chunk
    #                                    prefill (llm.prefill_continue) —
    #                                    ~1% of the full prompt at flagship
    #                                    shapes. Requests sharing a video
    #                                    share the same prefix tuple.


@functools.partial(jax.jit, static_argnames=("cfg", "max_len"))
def _prefill_batch(params, cfg: VLMConfig, input_ids, attn_mask, spatial,
                   temporal, max_len: int):
    """Batched multimodal prefill ([k, ...] inputs) into quantized row caches
    at pool cache size. Admission batches amortize the dual-stream encoder —
    batch-1 admission prefills measured 83% of continuous-serving wall time
    (scripts/bench_continuous.py)."""
    video_features = vlm.encode_video(params, cfg, spatial, temporal)
    return _prefill_features_body(params, cfg, input_ids, attn_mask,
                                  video_features, max_len)


@functools.partial(jax.jit, static_argnames=("cfg", "max_len"))
def _prefill_batch_from_features(params, cfg: VLMConfig, input_ids,
                                 attn_mask, video_features, max_len: int):
    """_prefill_batch from PRECOMPUTED features [k, NV, H] (Request.features
    — the engine's video-feature cache): admission for a repeated video pays
    only the text prefill, not the dual-stream encode that dominated the
    measured batch-1 admission cost."""
    return _prefill_features_body(params, cfg, input_ids, attn_mask,
                                  video_features, max_len)


@functools.partial(jax.jit, static_argnames=("cfg", "max_len"))
def _prefill_batch_from_prefix(params, cfg: VLMConfig, input_ids, attn_mask,
                               prefix_k, prefix_v, prefix_mask,
                               max_len: int):
    """Admission prefill for PREFIX-backed requests (Request.prefix): the
    shared [system text | video tokens] head is already prefilled once per
    video; admission pays only the question-chunk prefill
    (llm.prefill_continue) and the prefix quantize-into-slot. input_ids
    [k, Sq] hold the post-image chunk only."""
    emb = llm_mod.embed_lookup(params["llm"]["embed"], input_ids,
                               llm_mod.embed_dtype(params["llm"]["embed"]))
    return llm_mod.prefill_continue(params["llm"], cfg.llm, emb, attn_mask,
                                    prefix_k, prefix_v, prefix_mask,
                                    max_len, quantize_cache=True)


def _prefill_features_body(params, cfg, input_ids, attn_mask,
                           video_features, max_len: int):
    k = input_ids.shape[0]
    embeds, _, mask = vlm.splice_multimodal(
        input_ids, None, attn_mask, video_features, params["llm"]["embed"])
    S_full = embeds.shape[1]
    skeleton = llm_mod.KVCache(
        jnp.zeros((1, k, max_len, 1, 1), jnp.bfloat16),
        jnp.zeros((1, k, max_len, 1, 1), jnp.bfloat16),
        jnp.zeros((k,), jnp.int32))
    logits, cache = llm_mod.prefill(params["llm"], cfg.llm, embeds, mask,
                                    skeleton, quantize_cache=True)
    valid = jnp.zeros((k, max_len), bool).at[:, :S_full].set(mask.astype(bool))
    pos = jnp.sum(mask, axis=-1).astype(jnp.int32)
    return logits, cache, valid, pos


def _insert_row_impl(state: PoolState, batch_cache: llm_mod.QuantKVCache,
                     batch_valid, batch_pos, batch_ids, first_token, slot,
                     row, pad_token):
    """Copy row `row` of a batched prefill's cache/bookkeeping into pool slot
    `slot` (slice + insert fused in one program — no intermediate row-cache
    materialization). batch_ids [k, S]: the prompt token ids, seeding the
    slot's drafting context (buf/ptr) for speculative chunks. Traceable body
    shared by the standalone _insert_row program (admit_batch>1) and the
    fused single-dispatch admission programs (_admit_one*)."""
    def put(pool_arr, batch_arr):
        row_arr = jax.lax.dynamic_slice_in_dim(batch_arr, row, 1, axis=1)
        return jax.lax.dynamic_update_slice(
            pool_arr, row_arr, (0, slot) + (0,) * (pool_arr.ndim - 2))

    cache = llm_mod.QuantKVCache(
        put(state.cache.k, batch_cache.k),
        put(state.cache.k_scale, batch_cache.k_scale),
        put(state.cache.v, batch_cache.v),
        put(state.cache.v_scale, batch_cache.v_scale),
        jax.lax.dynamic_update_slice(
            state.cache.length,
            jax.lax.dynamic_slice_in_dim(batch_cache.length, row, 1, 0),
            (slot,)))
    S = batch_ids.shape[1]
    buf_len = state.buf.shape[1]
    row_ids = jax.lax.dynamic_slice_in_dim(
        batch_ids.astype(jnp.int32), row, 1, 0)             # [1, S]
    row_buf = jnp.concatenate(
        [row_ids, jnp.full((1, buf_len - S), pad_token, jnp.int32)], axis=1)
    buf = jax.lax.dynamic_update_slice(state.buf, row_buf, (slot, 0))
    buf = buf.at[slot, S].set(first_token)
    return PoolState(
        cache,
        jax.lax.dynamic_update_slice(
            state.valid,
            jax.lax.dynamic_slice_in_dim(batch_valid, row, 1, 0), (slot, 0)),
        jax.lax.dynamic_update_slice(
            state.positions,
            jax.lax.dynamic_slice_in_dim(batch_pos, row, 1, 0), (slot,)),
        state.cur_token.at[slot].set(first_token),
        state.active.at[slot].set(True),
        state.rng,
        buf,
        state.ptr.at[slot].set(S + 1))


_insert_row = functools.partial(jax.jit, donate_argnums=0)(_insert_row_impl)


_SAMPLE_STATICS = ("cfg", "temperature", "top_p", "do_sample")


@functools.partial(jax.jit, static_argnames=_SAMPLE_STATICS, donate_argnums=1)
def _admit_one(params, state: PoolState, cfg: VLMConfig, input_ids,
               attn_mask, spatial, temporal, slot, rid, pad_token, *,
               temperature: float, top_p, do_sample: bool):
    """FUSED single-request admission: encode + prefill + first-token sample
    + slot insert in ONE dispatched program → (state, first_token).

    Admission was measured at 1.12 s/request against a 0.88 s/request pure
    device cost (BENCH_CONTINUOUS_r03.txt: admit 20.2s for 18 requests): the
    ~0.24s gap was per-admission dispatch overhead — jnp.stack of ids/mask/
    pixels, prefill, sample_logits, fold_in, _insert_row each cost a ~25-30ms
    tunnel dispatch (CLAUDE.md). One program leaves one dispatch plus the
    scalar first-token fetch."""
    max_len = state.valid.shape[1]
    logits, bcache, bvalid, bpos = _prefill_batch(
        params, cfg, input_ids, attn_mask, spatial, temporal, max_len)
    rng, sub = jax.random.split(state.rng)
    first = sample_logits(logits, jax.random.fold_in(sub, rid),
                          temperature, top_p, do_sample)[0]
    state = _insert_row_impl(state._replace(rng=rng), bcache, bvalid, bpos,
                             input_ids.astype(jnp.int32), first, slot,
                             jnp.asarray(0, jnp.int32), pad_token)
    return state, first


@functools.partial(jax.jit, static_argnames=_SAMPLE_STATICS, donate_argnums=1)
def _admit_one_feats(params, state: PoolState, cfg: VLMConfig, input_ids,
                     attn_mask, features, slot, rid, pad_token, *,
                     temperature: float, top_p, do_sample: bool):
    """_admit_one from precomputed video features (Request.features)."""
    max_len = state.valid.shape[1]
    logits, bcache, bvalid, bpos = _prefill_batch_from_features(
        params, cfg, input_ids, attn_mask, features, max_len)
    rng, sub = jax.random.split(state.rng)
    first = sample_logits(logits, jax.random.fold_in(sub, rid),
                          temperature, top_p, do_sample)[0]
    state = _insert_row_impl(state._replace(rng=rng), bcache, bvalid, bpos,
                             input_ids.astype(jnp.int32), first, slot,
                             jnp.asarray(0, jnp.int32), pad_token)
    return state, first


@jax.jit
def _quantize_prefix_hd(prefix_k, prefix_v, prefix_mask):
    """One-time pinning of a bf16 prefix KV into the SharedPrefixCache's
    head-major int8 layout (llm.quantize_kv_head_major) — paid once per
    video, not per admission."""
    Sp = prefix_k.shape[2]
    pkq, pks = llm_mod.quantize_kv_head_major(prefix_k, Sp)
    pvq, pvs = llm_mod.quantize_kv_head_major(prefix_v, Sp)
    return pkq, pks, pvq, pvs, prefix_mask.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=_SAMPLE_STATICS + ("rope_len",),
                   donate_argnums=1)
def _admit_one_shared(params, state: PoolState, cfg: VLMConfig, input_ids,
                      attn_mask, prefix_k, prefix_v, prefix_mask, slot, rid,
                      pad_token, *, rope_len: int, temperature: float, top_p,
                      do_sample: bool):
    """_admit_one for the SHARED-PREFIX pool (state.cache is a
    SharedPrefixCache): the question chunk prefills against the bf16 prefix
    (llm.prefill_continue, tail_len mode) and only the chunk's k/v land in
    the slot's TAIL — the pool's pinned int8 prefix is untouched. The
    tail_len-mode SharedPrefixCache return re-quantizes the prefix, but
    those outputs are unused here so XLA dead-code-eliminates the work;
    admission pays chunk prefill + tail insert only."""
    tail_len = state.valid.shape[1]
    emb = llm_mod.embed_lookup(params["llm"]["embed"], input_ids,
                               llm_mod.embed_dtype(params["llm"]["embed"]))
    logits, spc1, tval1, pos1 = llm_mod.prefill_continue(
        params["llm"], cfg.llm, emb, attn_mask, prefix_k, prefix_v,
        prefix_mask, rope_len, quantize_cache=True, tail_len=tail_len)
    rng, sub = jax.random.split(state.rng)
    first = sample_logits(logits, jax.random.fold_in(sub, rid),
                          temperature, top_p, do_sample)[0]
    # the generic row insert operates on [L, B, ...] cache stacks — hand it
    # the pool TAIL as the cache, then rewrap the SharedPrefixCache
    tmp = state._replace(cache=state.cache.tail, rng=rng)
    tmp = _insert_row_impl(tmp, spc1.tail, tval1, pos1,
                           input_ids.astype(jnp.int32), first, slot,
                           jnp.asarray(0, jnp.int32), pad_token)
    state = tmp._replace(cache=state.cache._replace(tail=tmp.cache))
    return state, first


@functools.partial(jax.jit, static_argnames=_SAMPLE_STATICS, donate_argnums=1)
def _admit_one_prefix(params, state: PoolState, cfg: VLMConfig, input_ids,
                      attn_mask, prefix_k, prefix_v, prefix_mask, slot, rid,
                      pad_token, *, temperature: float, top_p,
                      do_sample: bool):
    """_admit_one for a prefix-backed request (Request.prefix)."""
    max_len = state.valid.shape[1]
    logits, bcache, bvalid, bpos = _prefill_batch_from_prefix(
        params, cfg, input_ids, attn_mask, prefix_k, prefix_v, prefix_mask,
        max_len)
    rng, sub = jax.random.split(state.rng)
    first = sample_logits(logits, jax.random.fold_in(sub, rid),
                          temperature, top_p, do_sample)[0]
    state = _insert_row_impl(state._replace(rng=rng), bcache, bvalid, bpos,
                             input_ids.astype(jnp.int32), first, slot,
                             jnp.asarray(0, jnp.int32), pad_token)
    return state, first


@functools.partial(
    jax.jit, static_argnames=("cfg", "chunk", "temperature", "top_p",
                              "do_sample", "eos_token_id", "pad_token_id",
                              "rope_len"),
    donate_argnums=1)
def _decode_chunk(params, state: PoolState, cfg: VLMConfig, deactivate,
                  *, chunk: int, temperature: float, top_p, do_sample: bool,
                  eos_token_id: int, pad_token_id: int,
                  rope_len: Optional[int] = None):
    """Run `chunk` pool-wide decode steps; returns (state, tokens [B, chunk])
    with pad_token_id on inactive rows.

    deactivate [B] bool: slots the HOST retired since the last chunk (budget
    exhaustion / freed slots) — applied at entry. Retirement used to be a
    per-slot .at[].set dispatch (~27ms each on the tunnel); riding it on the
    next chunk's arguments makes it free. A retired-but-still-active row
    decodes garbage into its own slot for at most one chunk, which the
    max_len chunk margin covers and the next insert overwrites.

    Shared-prefix pools (state.cache a SharedPrefixCache) decode through
    llm.decode_step_shared — the pinned prefix streams ONCE per token for
    the whole pool; rope_len carries the equivalent single-cache max_len so
    LongRoPE factor selection matches the plain pool."""
    B = state.cur_token.shape[0]
    state = state._replace(active=state.active & ~deactivate)
    shared = isinstance(state.cache, llm_mod.SharedPrefixCache)

    def body(i, carry):
        st, out = carry
        token_embeds = llm_mod.embed_lookup(
            params["llm"]["embed"], st.cur_token)[:, None, :]
        if shared:
            logits, cache, valid = llm_mod.decode_step_shared(
                params["llm"], cfg.llm, token_embeds, st.cache, st.valid,
                st.positions, rope_hint=rope_len, active=st.active)
        else:
            logits, cache, valid = llm_mod.decode_step(
                params["llm"], cfg.llm, token_embeds, st.cache, st.valid,
                st.positions, active=st.active)
        rng, sub = jax.random.split(st.rng)
        nxt = sample_logits(logits, sub, temperature, top_p, do_sample)
        nxt = jnp.where(st.active, nxt, pad_token_id)
        out = out.at[:, i].set(nxt)
        active = st.active & (nxt != eos_token_id)
        # buf/ptr ride along so a later speculative chunk sees the full
        # committed stream even if modes are mixed
        bcol = jnp.where(st.active, jnp.minimum(st.ptr, st.buf.shape[1] - 1),
                         st.buf.shape[1])
        buf = st.buf.at[jnp.arange(B), bcol].set(nxt, mode="drop")
        st = PoolState(cache, valid,
                       st.positions + st.active.astype(jnp.int32),
                       nxt, active, rng, buf,
                       st.ptr + st.active.astype(jnp.int32))
        return st, out

    out0 = jnp.full((B, chunk), pad_token_id, jnp.int32)
    state, out = jax.lax.fori_loop(0, chunk, body, (state, out0))
    return state, out


@functools.partial(
    jax.jit, static_argnames=("cfg", "chunk", "draft_len", "temperature",
                              "top_p", "do_sample", "eos_token_id",
                              "pad_token_id", "rope_len"),
    donate_argnums=1)
def _spec_chunk(params, state: PoolState, cfg: VLMConfig, deactivate,
                *, chunk: int, draft_len: int, temperature: float, top_p,
                do_sample: bool, eos_token_id: int, pad_token_id: int,
                rope_len: Optional[int] = None):
    """`chunk` speculative verify passes over the pool → (state,
    tokens [B, chunk*(draft_len+1)] compacted per row, counts [B]).

    Each pass drafts per-slot from the pool's committed-token buffers
    (ngram_draft), verifies all drafts in ONE cache/weight stream
    (llm.verify_step) and commits per-row accepted counts — the per-row
    write bases the multi-slot scatter kernels support make ragged
    continuous slots and speculative commits the same mechanism.

    Shared-prefix pools verify through llm.verify_step_shared and commit on
    the TAIL — the two decode-DMA levers compound (verify amortizes the
    weight stream across draft_len+1 tokens; the cascade split amortizes
    the prefix stream across the pool)."""
    from .speculative import ngram_draft, spec_accept_tokens

    B = state.cur_token.shape[0]
    state = state._replace(active=state.active & ~deactivate)
    shared = isinstance(state.cache, llm_mod.SharedPrefixCache)
    S_v = draft_len + 1
    out_w = chunk * S_v
    iidx = jnp.arange(S_v)[None, :]
    rows = jnp.arange(B)[:, None]

    def body(i, carry):
        st, out, cnt = carry
        drafts = ngram_draft(st.buf, st.ptr, draft_len)
        cur = jnp.take_along_axis(st.buf,
                                  jnp.maximum(st.ptr - 1, 0)[:, None], 1)
        inputs = jnp.concatenate([cur, drafts], axis=1)      # [B, S_v]
        token_embeds = llm_mod.embed_lookup(params["llm"]["embed"], inputs)
        positions = st.positions[:, None] + iidx
        if shared:
            logits, cache = llm_mod.verify_step_shared(
                params["llm"], cfg.llm, token_embeds, st.cache, st.valid,
                positions, rope_hint=rope_len)
        else:
            logits, cache = llm_mod.verify_step(
                params["llm"], cfg.llm, token_embeds, st.cache, st.valid,
                positions)
        rng, sub = jax.random.split(st.rng)
        a, emitted = spec_accept_tokens(logits, drafts, sub, temperature,
                                        top_p, do_sample)
        if shared:
            tail, valid = llm_mod.commit_verify(
                cache.tail, st.valid, jnp.where(st.active, a, 0), S_v)
            cache = cache._replace(tail=tail)
        else:
            cache, valid = llm_mod.commit_verify(
                cache, st.valid, jnp.where(st.active, a, 0), S_v)
        is_eos = (emitted == eos_token_id) & (iidx < a[:, None])
        eos_pos = jnp.min(jnp.where(is_eos, iidx, S_v), axis=-1)
        e = jnp.where(st.active, jnp.minimum(a, eos_pos + 1), 0)
        within = iidx < e[:, None]
        out = out.at[rows, jnp.where(within, cnt[:, None] + iidx,
                                     out_w)].set(emitted, mode="drop")
        buf = st.buf.at[rows, jnp.where(within, st.ptr[:, None] + iidx,
                                        st.buf.shape[1])].set(
            emitted, mode="drop")
        active = st.active & ~jnp.any(is_eos & within, axis=-1)
        st = PoolState(cache, valid, st.positions + e, st.cur_token, active,
                       rng, buf, st.ptr + e)
        return st, out, cnt + e

    out0 = jnp.full((B, out_w), pad_token_id, jnp.int32)
    state, out, cnt = jax.lax.fori_loop(
        0, chunk, body, (state, out0, jnp.zeros((B,), jnp.int32)))
    return state, out, cnt


class ContinuousServer:
    """Synchronous continuous-batching loop over a fixed slot pool.

    serve(requests) processes a request list to completion, admitting new
    requests into slots as they free. A thread/queue front-end can wrap
    serve()'s admission points the same way scheduler.Scheduler wraps the
    batch engine."""

    def __init__(self, params, cfg: VLMConfig, pool_size: int = 4,
                 prompt_len: int = 64, max_new_tokens: int = 64,
                 chunk: int = 8, temperature: float = 0.0,
                 top_p: Optional[float] = None, do_sample: bool = False,
                 eos_token_id: int = 2, pad_token_id: int = 0,
                 seed: int = 0, admit_batch: int = 1,
                 spec_draft_len: int = 0,
                 prefix_len: Optional[int] = None,
                 shared_prefix: bool = False,
                 admission_policy: str = "fifo",
                 chunk_long: int = 0,
                 pipeline_chunks: bool = False):
        self.params = params
        self.cfg = cfg
        self.pool_size = pool_size
        self.chunk = chunk
        # adaptive TAIL chunk: when the queue is empty (no admission could
        # use a freed slot) and EVERY occupied slot's remaining budget covers
        # it, dispatch a chunk_long-step program instead of chunk. The
        # budget gate means a long chunk can never overshoot a row's budget,
        # so the chunk-sized cache/buffer margins below stay correct; rows
        # that hit EOS mid-long-chunk idle via the device-side active mask
        # exactly as in short chunks. 0 disables (the default).
        #
        # MEASURED A WASH on the ragged LPT mix (BENCH_TAIL_CHUNK_r04.txt:
        # 391.9 vs 393.5 tok/s, 1.004x) — but NOT because sync is free: the
        # all-rows-covered gate almost never fires there (a freshly admitted
        # short-budget row is nearly always present). The uniform-budget
        # control (scripts/bench_chunk_sync.py, BENCH_CHUNK_SYNC_r05.txt)
        # shows pool-wide chunk32 beats chunk8 by 1.17x = ~31ms of host
        # sync per chunk (the tunnel round trip of the token fetch). The
        # general fix for that cost is pipeline_chunks below — measured
        # 1.28x over plain chunk8 and ABOVE chunk32 (542.7 vs 494.8 tok/s,
        # same process) — it helps every chunk regardless of the budget mix;
        # chunk_long stays for uniform-budget workloads where its gate fires.
        self.chunk_long = chunk_long if chunk_long > chunk else 0
        # PIPELINED chunk loop: dispatch chunk k+1 BEFORE fetching chunk k's
        # tokens, so the ~25ms/chunk host sync (np.asarray token fetch over
        # the tunnel) overlaps device execution of the next chunk. Cost:
        # retirement and admission lag ONE chunk (a budget-exhausted row can
        # decode up to 2*chunk garbage steps before its deactivate lands →
        # the cache/buffer margins double), and a freed slot re-admits one
        # chunk later. Greedy outputs are bit-identical — rows are
        # independent under the active mask, and per-row math does not
        # depend on when other rows admit or retire.
        self.pipeline = pipeline_chunks
        # shared-prefix pool (Hydragen/cascade): ONE pinned int8 prefix at
        # batch dim 1 + small per-slot tails. Decode-attention DMA per token
        # drops from B x (Sp + tail) to Sp + B x tail — the measured gap
        # behind prefix-lockstep-with-cascade (405 tok/s) beating the plain
        # prefix pool (270 tok/s, BENCH_CONT_PREFIX_r04.txt): the plain
        # pool's slots each hold a COPY of the ~3.5k-token prefix and the
        # decode kernel streams it B times per token. Admissions must be
        # prefix-backed; the pool pins one prefix at a time (a request for a
        # different video waits until the pool drains, then repins).
        self.shared_prefix = shared_prefix
        if shared_prefix:
            if prefix_len is None:
                raise ValueError("shared_prefix pools need prefix_len to "
                                 "size the RoPE hint / fit checks")
            if admit_batch > 1:
                raise NotImplementedError(
                    "shared-prefix admission is single-request (the fused "
                    "_admit_one_shared program); admit_batch must be 1")
        self._pinned_prefix: Optional[tuple] = None
        # admission order. "fifo" = arrival order (latency fairness).
        # "longest_first" = highest DECLARED budget first (LPT makespan
        # heuristic): long-running requests start early so the pool never
        # drains down to a few straggler slots at the end — the measured gap
        # behind the oracle-sorted lockstep baseline (407.6 vs 355.3 tok/s,
        # BENCH_CONT_PREFIX_r04.txt). Uses the same information that oracle
        # uses (per-request max_new_tokens), but online: admission picks
        # from whatever has ARRIVED, no future knowledge. Trades worst-case
        # short-request latency under backlog for throughput.
        if admission_policy not in ("fifo", "longest_first"):
            raise ValueError(f"unknown admission_policy {admission_policy!r}")
        self.admission_policy = admission_policy
        # speculative chunks (serve/speculative.py): each chunk iteration
        # verifies spec_draft_len prompt-lookup drafts in one cache stream;
        # a row may overshoot its budget within a chunk (retirement is
        # host-side, between chunks) — the cache/buffer margins below cover
        # the worst case chunk*(draft_len+1)
        self.spec_draft_len = spec_draft_len
        self._toks_per_iter = (spec_draft_len + 1) if spec_draft_len else 1
        # max admissions per batched prefill (buckets are powers of 2 up to
        # this). Default 1: on one v5e the batch-12-clip encoder already
        # saturates the chip at admission batch 1, and batch-2 prefills
        # MEASURED SLOWER per request (1.01 vs 0.86 s/req steady-state,
        # scripts/bench_continuous.py) — the admission win came from staging
        # pixel transfers (stage_request), not from batching the prefill.
        # >1 remains available for parts where the encoder underfills the
        # chip; each extra row carries a pool-length int8 cache
        # (~0.75GB/side at flagship pool shapes; 4 measured OOM on v5e).
        self.admit_batch = max(1, admit_batch)
        self.max_new_tokens = max_new_tokens
        self.gen_kwargs = dict(temperature=temperature, top_p=top_p,
                               do_sample=do_sample, eos_token_id=eos_token_id,
                               pad_token_id=pad_token_id)
        self.eos_token_id = eos_token_id
        self.pad_token_id = pad_token_id
        # pool max_len covers the longest spliced prompt + the token budget,
        # rounded to a 128 multiple (lane padding is paid in HBM regardless;
        # the L-chunked decode kernel wants block-divisible L). With
        # prefix-backed admission (Request.prefix) the prefix occupies its
        # own slots BEFORE the question bucket, so pass prefix_len (= Sp =
        # pre-image text + num_video_tokens) to size the pool for it.
        self._prefix_len = prefix_len  # warmup() sizes its dummy prefix
        head = (prefix_len + prompt_len if prefix_len is not None
                else prompt_len - 1 + cfg.num_video_tokens)
        # overshoot margin: a budget-exhausted row decodes up to one chunk of
        # garbage before host retirement lands (two chunks when the
        # pipelined loop delays retirement by one chunk) — the cache/buffer
        # tails must absorb those writes
        self._chunk_margin = ((2 if pipeline_chunks else 1)
                              * chunk * self._toks_per_iter)
        self.max_len = -(-(head + max_new_tokens
                           + self._chunk_margin) // 128) * 128
        # shared-prefix pools size the per-slot TAIL separately (question
        # bucket + budget + chunk margin); max_len stays the equivalent
        # single-cache size for RoPE-factor parity with the plain pool
        self._tail_len = -(-(prompt_len + max_new_tokens
                             + self._chunk_margin) // 128) * 128
        self._prompt_len = prompt_len
        self._buf_len = (prompt_len + max_new_tokens + self._chunk_margin)
        self._seed = seed
        # shared-prefix state is assembled at first admission (the prefix
        # shapes come with the request); state is None until then
        self.state = None if shared_prefix else self._init_state(seed)
        self._slot_req: List[Optional[int]] = [None] * pool_size
        self._slot_budget = [0] * pool_size
        self._slot_cb: List[Optional[object]] = [None] * pool_size
        # size of the most recently dispatched chunk — the pipelined
        # chunk_long gate's staleness allowance (see _dispatch_chunk)
        self._last_dispatch_chunk = chunk

    def _init_state(self, seed: int) -> PoolState:
        lcfg = self.cfg.llm
        B, M = self.pool_size, self.max_len
        shape = (lcfg.num_layers, B, lcfg.num_kv_heads, lcfg.head_dim, M)
        sshape = (lcfg.num_layers, B, lcfg.num_kv_heads, 1, M)
        cache = llm_mod.QuantKVCache(
            jnp.zeros(shape, jnp.int8), jnp.ones(sshape, jnp.float32),
            jnp.zeros(shape, jnp.int8), jnp.ones(sshape, jnp.float32),
            jnp.zeros((B,), jnp.int32))
        return PoolState(cache, jnp.zeros((B, M), bool),
                         jnp.zeros((B,), jnp.int32),
                         jnp.zeros((B,), jnp.int32),
                         jnp.zeros((B,), bool), jax.random.key(seed),
                         jnp.full((B, self._buf_len), self.pad_token_id,
                                  jnp.int32),
                         jnp.zeros((B,), jnp.int32))

    def _pin_shared_prefix(self, prefix: tuple) -> None:
        """(Re)pin the pool to one video's prefix: quantize it ONCE into the
        SharedPrefixCache layout and rebuild the (empty) pool state around
        it. Only legal when no slot is occupied."""
        assert not self._busy()
        pk, pv, pm = prefix
        Sp = pk.shape[2]
        if (Sp + self._prompt_len + self.max_new_tokens
                + self._chunk_margin) > self.max_len:
            raise ValueError(
                f"prefix ({Sp}) + question bucket + budget overflow the "
                f"pool's RoPE envelope (max_len={self.max_len}); build the "
                "server with a larger prefix_len")
        pkq, pks, pvq, pvs, pmask = _quantize_prefix_hd(pk, pv, pm)
        lcfg = self.cfg.llm
        B, Mt = self.pool_size, self._tail_len
        shape = (lcfg.num_layers, B, lcfg.num_kv_heads, lcfg.head_dim, Mt)
        sshape = (lcfg.num_layers, B, lcfg.num_kv_heads, 1, Mt)
        tail = llm_mod.QuantKVCache(
            jnp.zeros(shape, jnp.int8), jnp.ones(sshape, jnp.float32),
            jnp.zeros(shape, jnp.int8), jnp.ones(sshape, jnp.float32),
            jnp.zeros((B,), jnp.int32))
        spc = llm_mod.SharedPrefixCache(pkq, pks, pvq, pvs, pmask, tail)
        # carry the rng stream across repins so sampled serving doesn't
        # replay the same stream for every video
        rng = (self.state.rng if self.state is not None
               else jax.random.key(self._seed))
        self.state = PoolState(
            spc, jnp.zeros((B, Mt), bool), jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.int32), jnp.zeros((B,), bool), rng,
            jnp.full((B, self._buf_len), self.pad_token_id, jnp.int32),
            jnp.zeros((B,), jnp.int32))
        self._pinned_prefix = prefix

    def warmup(self, kind: Optional[str] = None) -> None:
        """Pre-compile the pool's device programs so live serving never pays
        a 20-160s remote compile mid-request: the fused admission program
        for `kind` ("prefix", "feats", or "pixels"; None = the server's
        configured default — prefix-backed for prefix_len pools,
        feature-backed otherwise) via one dummy budget-1 request, then the
        decode/verify chunk program and — when chunk_long is set — the
        long-chunk program, dispatched directly over an all-inactive pool
        with the LIVE static arguments (eos/pad/temperature are jit statics:
        warming with substitutes would compile the wrong program).

        Call BEFORE serving real traffic: the pool state is re-initialized
        afterwards (the dummy programs donate the old state's buffers), so a
        warmed server starts exactly like a fresh one. Requires an idle
        pool."""
        assert not self._busy(), "warmup() needs an idle pool"
        from ..text.templates import IMAGE_TOKEN_INDEX

        if kind is None:
            kind = "prefix" if self._prefix_len is not None else "feats"
        lcfg = self.cfg.llm
        try:
            ids = np.full((self._prompt_len,), 3, np.int32)
            mask = np.ones((self._prompt_len,), np.int32)
            req = Request(ids, mask, None, None, max_new_tokens=1)
            if kind == "prefix":
                Sp = self._prefix_len
                if Sp is None:
                    raise ValueError("prefix warmup needs prefix_len")
                pk = jnp.zeros((lcfg.num_layers, 1, Sp, lcfg.num_kv_heads,
                                lcfg.head_dim), jnp.bfloat16)
                req = req._replace(prefix=(pk, pk, jnp.ones((1, Sp),
                                                            jnp.int32)))
            elif kind == "feats":
                ids[1] = IMAGE_TOKEN_INDEX
                req = req._replace(features=np.zeros(
                    (self.cfg.num_video_tokens, lcfg.hidden_size),
                    np.float32))
            elif kind == "pixels":
                ids[1] = IMAGE_TOKEN_INDEX
                req = req._replace(
                    spatial_pixels=np.zeros(
                        (self.cfg.num_segs, 336, 336, 3), np.float32),
                    temporal_pixels=np.zeros(
                        (self.cfg.num_frames, 224, 224, 3), np.float32))
            else:
                raise ValueError(f"unknown warmup kind {kind!r}")
            # budget-1 admission: warms the fused admission program in one
            # dispatch and retires immediately (no chunk dependency on what
            # token the model happens to emit). Per-program seconds print to
            # stderr: warmup cost is dominated by the FIRST compile of the
            # chunk-program family (~400s on a cold compile service), each
            # additional variant (chunk_long, different chunk statics) lands
            # in ~10s on its tail — see BENCH_CHUNK_SYNC_r05.txt vs
            # BENCH_CONT_PREFIX_r05.txt — so consolidating variants or lazy-
            # compiling optional paths (spec programs only exist when
            # spec_draft_len>0, chunk_long only when set) cannot reclaim the
            # headline; it is compile-service state, not program count.
            import sys as _sys
            import time as _time

            t0 = _time.time()
            self.serve([req])
            print(f"warmup[admission/{kind}]: {_time.time()-t0:.1f}s",
                  file=_sys.stderr)

            # chunk programs, dispatched over an all-deactivated pool (the
            # dummy row above already retired; inactive rows make the
            # programs semantically no-ops) with the live statics
            deact = jnp.ones((self.pool_size,), bool)
            rope_len = self.max_len if self.shared_prefix else None
            state, out = self.state, None
            for ch in ([self.chunk] + ([self.chunk_long]
                                       if self.chunk_long else [])):
                t0 = _time.time()
                if self.spec_draft_len:
                    state, out, _ = _spec_chunk(
                        self.params, state, self.cfg, deact, chunk=ch,
                        draft_len=self.spec_draft_len, rope_len=rope_len,
                        **self.gen_kwargs)
                else:
                    state, out = _decode_chunk(
                        self.params, state, self.cfg, deact, chunk=ch,
                        rope_len=rope_len, **self.gen_kwargs)
                np.asarray(out)  # block until compiled + executed
                print(f"warmup[chunk{ch}"
                      f"{'/spec' if self.spec_draft_len else ''}]: "
                      f"{_time.time()-t0:.1f}s", file=_sys.stderr)
        finally:
            # the dummy programs donated the pool state's buffers — start
            # from a clean slate (identical to a fresh server)
            self._pinned_prefix = None
            self.state = (None if self.shared_prefix
                          else self._init_state(self._seed))
            self._slot_req = [None] * self.pool_size
            self._slot_budget = [0] * self.pool_size
            self._slot_cb = [None] * self.pool_size
            self._last_dispatch_chunk = self.chunk

    def serve(self, requests: List[Request]) -> List[np.ndarray]:
        """→ per-request generated token arrays (EOS excluded)."""
        results: dict = {}
        emitted: dict = {i: [] for i in range(len(requests))}
        pending = [(i, self.stage_request(requests[i]))
                   for i in range(len(requests))]

        if self.pipeline:
            inflight = None
            while pending or self._busy() or inflight is not None:
                self._admit(pending, emitted, results)
                # dispatch chunk k+1 BEFORE fetching chunk k's tokens: the
                # token fetch (a ~31ms tunnel round trip; 1.28x measured,
                # BENCH_CHUNK_SYNC_r05.txt) overlaps device execution
                nxt = (self._dispatch_chunk(tail=not pending)
                       if self._busy() else None)
                if inflight is not None:
                    self._process_chunk(inflight, emitted, results)
                inflight = nxt
        else:
            while pending or self._busy():
                self._admit(pending, emitted, results)
                if self._busy():
                    self._run_chunk(emitted, results, tail=not pending)
        return [results.get(i, np.zeros(0, np.int32))
                for i in range(len(requests))]

    @staticmethod
    def stage_request(req: Request) -> Request:
        """Start the request's pixel host→device transfers NOW (async
        device_put) so they overlap decode chunks instead of serializing
        into the admission prefill — host→device pixel transfer, not encode,
        dominated batch-1 admission cost on tunneled backends (~18.5MB/video
        uint8). The scheduler calls this at submit time; serve() stages its
        whole request list upfront (~19MB/request of HBM).

        Arrays stage with a leading batch dim [1, ...] (a free host-side
        reshape) so the fused single-request admission consumes them with
        ZERO reshape/stack dispatches; admit_batch>1 concatenates them."""
        def stage(x, base_ndim):
            if isinstance(x, jax.Array):  # already staged (idempotent)
                return x if x.ndim == base_ndim + 1 else x[None]
            return jax.device_put(np.asarray(x)[None])

        staged = req._replace(input_ids=stage(req.input_ids, 1),
                              attn_mask=stage(req.attn_mask, 1))
        if req.prefix is not None:
            # prefix-backed request: the prefix KV is already a device
            # array, shared across same-video requests — nothing to stage
            return staged
        if req.features is not None:
            # feature-backed request: stage the features (~20MB bf16 at
            # flagship), skip the pixel transfers entirely
            return staged._replace(features=stage(req.features, 2))
        return staged._replace(
            spatial_pixels=stage(req.spatial_pixels, 4),
            temporal_pixels=stage(req.temporal_pixels, 4))

    # -- incremental engine (shared by serve() and ContinuousScheduler) ------

    def _busy(self) -> bool:
        return any(r is not None for r in self._slot_req)

    def _check_prefix_fit(self, prefix, Sq: int) -> None:
        Sp = prefix[0].shape[2]
        if Sp + Sq + self.max_new_tokens \
                + self._chunk_margin > self.max_len:
            raise ValueError(
                f"prefix ({Sp}) + question bucket ({Sq}) + budget "
                f"overflow the pool cache (max_len={self.max_len}); "
                "build the server with prefix_len set")

    def _book_first_token(self, rid, req, slot, first_i, emitted,
                          results) -> bool:
        """Host bookkeeping after an admission's first token; returns True
        if the request already finished (EOS / budget-1)."""
        self._slot_req[slot] = rid
        self._slot_cb[slot] = req.on_token
        budget = req.max_new_tokens or self.max_new_tokens
        self._slot_budget[slot] = min(budget, self.max_new_tokens) - 1
        if first_i != self.eos_token_id and req.on_token is not None:
            req.on_token(first_i)
        emitted[rid].append(first_i)
        if first_i == self.eos_token_id or self._slot_budget[slot] == 0:
            results[rid] = self._finish(rid, emitted)
            self._slot_req[slot] = None
            self._slot_cb[slot] = None
            return True
        return False

    def _admit(self, pending, emitted, results) -> None:
        """Fill free slots from `pending` [(rid, Request), ...]. The default
        (admit_batch=1) path is the FUSED single-dispatch program
        (_admit_one*): encode+prefill+sample+insert in one dispatch plus one
        scalar fetch — per-admission overhead dropped from ~0.24s (8 tunnel
        dispatches) to one dispatch. admit_batch>1 keeps the batched
        multi-dispatch path (power-of-2 buckets, padded by repeating a
        request). Inputs must be pre-staged (stage_request)."""
        gk = self.gen_kwargs
        sample_kw = dict(temperature=gk["temperature"], top_p=gk["top_p"],
                         do_sample=gk["do_sample"])
        if self.admission_policy == "longest_first" and len(pending) > 1:
            # stable: arrival order breaks budget ties
            pending.sort(key=lambda it: -(it[1].max_new_tokens
                                          or self.max_new_tokens))
        if self.shared_prefix:
            self._admit_shared(pending, emitted, results, sample_kw)
            return
        while pending:
            free = [s for s in range(self.pool_size)
                    if self._slot_req[s] is None]
            if not free:
                return
            take = pending[: min(len(free), self.admit_batch)]

            # a batched prefill is ONE program — pixel-, feature-, and
            # prefix-backed requests can't mix (and prefix requests batch
            # only with requests sharing the SAME prefix arrays), so cut
            # the take at the first kind switch (admit_batch defaults to 1;
            # no-op there)
            def kind(r: Request):
                if r.prefix is not None:
                    return ("prefix", id(r.prefix))
                return ("feats",) if r.features is not None else ("pixels",)

            want = kind(take[0][1])
            for j in range(1, len(take)):
                if kind(take[j][1]) != want:
                    take = take[:j]
                    break
            del pending[: len(take)]
            k = len(take)

            if k == 1:
                rid, req = take[0]
                slot = free[0]
                args = (jnp.asarray(slot, jnp.int32),
                        jnp.asarray(rid, jnp.int32),
                        jnp.asarray(self.pad_token_id, jnp.int32))
                if want[0] == "prefix":
                    pk, pv, pm = req.prefix
                    self._check_prefix_fit(req.prefix, req.input_ids.shape[1])
                    self.state, first = _admit_one_prefix(
                        self.params, self.state, self.cfg, req.input_ids,
                        req.attn_mask, pk, pv, pm, *args, **sample_kw)
                elif want[0] == "feats":
                    self.state, first = _admit_one_feats(
                        self.params, self.state, self.cfg, req.input_ids,
                        req.attn_mask, req.features, *args, **sample_kw)
                else:
                    self.state, first = _admit_one(
                        self.params, self.state, self.cfg, req.input_ids,
                        req.attn_mask, req.spatial_pixels,
                        req.temporal_pixels, *args, **sample_kw)
                self._book_first_token(rid, req, slot, int(first), emitted,
                                       results)
                # EOS-on-first / budget-1: the fused program already inserted
                # the row; _slot_req[slot] is None again, so the next chunk's
                # deactivate vector retires it (no extra dispatch)
                continue

            bucket = 1
            while bucket < k:
                bucket *= 2
            idx = [take[i % k][1] for i in range(bucket)]  # pad by repeat
            bids = jnp.concatenate([r.input_ids for r in idx])
            battn = jnp.concatenate([r.attn_mask for r in idx])
            if want[0] == "prefix":
                pk, pv, pm = take[0][1].prefix
                self._check_prefix_fit(take[0][1].prefix, bids.shape[1])
                logits, bcache, bvalid, bpos = _prefill_batch_from_prefix(
                    self.params, self.cfg, bids, battn, pk, pv, pm,
                    self.max_len)
            elif want[0] == "feats":
                logits, bcache, bvalid, bpos = _prefill_batch_from_features(
                    self.params, self.cfg, bids, battn,
                    jnp.concatenate([r.features for r in idx]),
                    self.max_len)
            else:
                logits, bcache, bvalid, bpos = _prefill_batch(
                    self.params, self.cfg, bids, battn,
                    jnp.concatenate([r.spatial_pixels for r in idx]),
                    jnp.concatenate([r.temporal_pixels for r in idx]),
                    self.max_len)
            self.state = self.state._replace(
                rng=jax.random.split(self.state.rng)[0])
            for i, (rid, req) in enumerate(take):
                slot = free[i]
                first = sample_logits(
                    logits[i:i + 1], jax.random.fold_in(self.state.rng, rid),
                    gk["temperature"], gk["top_p"], gk["do_sample"])
                first_i = int(first[0])
                if self._book_first_token(rid, req, slot, first_i, emitted,
                                          results):
                    continue
                self.state = _insert_row(
                    self.state, bcache, bvalid, bpos, bids,
                    jnp.asarray(first_i, jnp.int32),
                    jnp.asarray(slot, jnp.int32),
                    jnp.asarray(i, jnp.int32),
                    jnp.asarray(self.pad_token_id, jnp.int32))

    def _admit_shared(self, pending, emitted, results, sample_kw) -> None:
        """Admission for the shared-prefix pool: admit pending requests that
        match the PINNED prefix (same bf16 arrays — requests for one video
        share the prefix tuple); requests for other videos wait until the
        pool drains, then the pool repins to the oldest waiter's prefix.
        Same-video requests may therefore admit ahead of an older
        different-video request — slot occupancy over strict FIFO, the same
        trade the lockstep scheduler's video-grouped batches make."""
        while pending:
            free = [s for s in range(self.pool_size)
                    if self._slot_req[s] is None]
            if not free:
                return
            idx = None
            if self._pinned_prefix is not None:
                for j, (_, r) in enumerate(pending):
                    if (r.prefix is not None
                            and r.prefix[0] is self._pinned_prefix[0]):
                        idx = j
                        break
            if idx is None:
                if self._busy():
                    return  # drain first, then repin to pending[0]'s video
                req0 = pending[0][1]
                if req0.prefix is None:
                    raise ValueError(
                        "shared-prefix pools serve prefix-backed requests "
                        "only (set Request.prefix)")
                self._pin_shared_prefix(req0.prefix)
                idx = 0
            rid, req = pending.pop(idx)
            Sq = req.input_ids.shape[1]
            if (Sq + self.max_new_tokens
                    + self._chunk_margin) > self._tail_len:
                raise ValueError(
                    f"question bucket ({Sq}) + budget overflow the per-slot "
                    f"tail (tail_len={self._tail_len}); build the server "
                    "with a larger prompt_len")
            slot = free[0]
            self.state, first = _admit_one_shared(
                self.params, self.state, self.cfg, req.input_ids,
                req.attn_mask, *self._pinned_prefix,
                jnp.asarray(slot, jnp.int32), jnp.asarray(rid, jnp.int32),
                jnp.asarray(self.pad_token_id, jnp.int32),
                rope_len=self.max_len, **sample_kw)
            self._book_first_token(rid, req, slot, int(first), emitted,
                                   results)

    def _run_chunk(self, emitted, results, tail: bool = False) -> None:
        """One jitted decode chunk over the pool + host-side retirement
        (dispatch + immediate host fetch — the unpipelined composition of
        _dispatch_chunk/_process_chunk)."""
        self._process_chunk(self._dispatch_chunk(tail=tail), emitted,
                            results)

    def _dispatch_chunk(self, tail: bool = False) -> "_InflightChunk":
        """Dispatch one jitted decode chunk over the pool WITHOUT fetching
        its tokens — the device arrays plus a dispatch-time snapshot of the
        slot table come back as an _InflightChunk for _process_chunk.

        Ownerless slots ride the chunk's `deactivate` argument: retirement
        needs no standalone device dispatch, the next chunk (or the fused
        admission insert reusing the slot) squares the device's active mask
        with the host's slot table.

        tail=True (caller's queue is empty) enables the chunk_long program
        when every occupied slot's remaining budget covers it — see
        __init__."""
        chunk = self.chunk
        if tail and self.chunk_long:
            budgets = [self._slot_budget[s] for s in range(self.pool_size)
                       if self._slot_req[s] is not None]
            # pipelined loops see budgets STALE by one unprocessed chunk
            # (retirement bookkeeping lags dispatch) — widen the gate by the
            # inflight chunk's worst-case consumption so a long chunk still
            # never overshoots a row's budget
            stale = self._last_dispatch_chunk if self.pipeline else 0
            if budgets and min(budgets) >= (self.chunk_long + stale) \
                    * self._toks_per_iter:
                chunk = self.chunk_long
        deact = jnp.asarray(
            np.asarray([r is None for r in self._slot_req], bool))
        if self.spec_draft_len:
            self.state, toks, counts = _spec_chunk(
                self.params, self.state, self.cfg, deact, chunk=chunk,
                draft_len=self.spec_draft_len,
                rope_len=self.max_len if self.shared_prefix else None,
                **self.gen_kwargs)
        else:
            self.state, toks = _decode_chunk(
                self.params, self.state, self.cfg, deact, chunk=chunk,
                rope_len=self.max_len if self.shared_prefix else None,
                **self.gen_kwargs)
            counts = None
        self._last_dispatch_chunk = chunk
        return _InflightChunk(toks, counts, tuple(self._slot_req),
                              tuple(self._slot_cb))

    def _process_chunk(self, inflight: "_InflightChunk", emitted,
                       results) -> None:
        """Fetch an inflight chunk's tokens to host (the blocking ~25ms
        tunnel round trip) and run retirement bookkeeping. In the pipelined
        loop the NEXT chunk is already dispatched, so the fetch overlaps its
        device execution.

        Attribution uses the DISPATCH-time slot snapshot, skipping slots the
        live table no longer assigns to the snapshot rid: a row that
        finished after dispatch (budget exhausted in the previous chunk —
        its retirement lags into this one) freed its slot, and rids are
        never reused, so `_slot_req[slot] == rid` holds exactly for
        non-stale rows (works under the scheduler too, which pops resolved
        rids from `results`)."""
        toks = np.asarray(inflight.toks)
        counts = (np.asarray(inflight.counts) if inflight.counts is not None
                  else np.full(self.pool_size, toks.shape[1]))
        for slot in range(self.pool_size):
            rid = inflight.slot_req[slot]
            if rid is None or self._slot_req[slot] != rid:
                continue
            # every token up to and including an EOS is real (the device
            # only pads AFTER in-chunk EOS deactivation — lockstep — or
            # compacts per-row counts — speculative; the break below stops
            # before any pads are read)
            cb = inflight.slot_cb[slot]
            for t in toks[slot][:counts[slot]]:
                t = int(t)
                done = t == self.eos_token_id
                if not done:
                    emitted[rid].append(t)
                    self._slot_budget[slot] -= 1
                    if cb is not None:
                        cb(t)
                if done or self._slot_budget[slot] <= 0:
                    results[rid] = self._finish(rid, emitted)
                    # no device dispatch: the next chunk's deactivate vector
                    # (built from _slot_req) retires the row
                    self._slot_req[slot] = None
                    self._slot_cb[slot] = None
                    break

    def _finish(self, ridx: int, emitted) -> np.ndarray:
        return np.asarray(emitted[ridx], np.int32)


class ContinuousScheduler:
    """Threaded front-end over ContinuousServer: submit() returns a Future;
    the scheduler thread admits queued requests into the pool between decode
    chunks — the continuous-batching analogue of scheduler.Scheduler's
    lockstep batching."""

    def __init__(self, server: ContinuousServer):
        import queue
        import threading

        self.server = server
        self._queue: "queue.Queue" = queue.Queue()
        self._futures: dict = {}
        self._emitted: dict = {}
        self._results: dict = {}
        self._next_rid = 0
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, req: Request):
        from concurrent.futures import Future

        fut = Future()
        # stage pixel transfers at submit time — they overlap the pool's
        # decode chunks instead of stalling the admission prefill
        self._queue.put((ContinuousServer.stage_request(req), fut))
        return fut

    def shutdown(self, wait: bool = True) -> None:
        self._running = False
        self._queue.put(None)
        if wait:
            self._thread.join(timeout=120)

    def _drain(self, pending, block: bool) -> bool:
        import queue as queue_mod

        try:
            item = self._queue.get(timeout=0.05 if block else 0.0)
        except queue_mod.Empty:
            return True
        if item is None:
            return False
        req, fut = item
        rid = self._next_rid
        self._next_rid += 1
        self._futures[rid] = fut
        self._emitted[rid] = []
        pending.append((rid, req))
        return True

    def _loop(self) -> None:
        pending: list = []
        alive = True
        inflight = None  # pipeline_chunks: chunk dispatched, tokens unfetched
        while self._running and alive:
            # block for work only when fully idle
            alive = self._drain(pending, block=not (
                pending or self.server._busy() or inflight is not None))
            while alive and not self._queue.empty():
                alive = self._drain(pending, block=False)
            if not (pending or self.server._busy() or inflight is not None):
                continue
            try:
                self.server._admit(pending, self._emitted, self._results)
                tail = not pending and self._queue.empty()
                if self.server.pipeline:
                    # dispatch chunk k+1 BEFORE fetching chunk k's tokens:
                    # the blocking token fetch overlaps device execution
                    nxt = (self.server._dispatch_chunk(tail=tail)
                           if self.server._busy() else None)
                    if inflight is not None:
                        self.server._process_chunk(inflight, self._emitted,
                                                   self._results)
                    inflight = nxt
                elif self.server._busy():
                    # tail only when nothing is waiting anywhere — a long
                    # chunk would delay the next admission otherwise
                    self.server._run_chunk(self._emitted, self._results,
                                           tail=tail)
            except Exception as e:  # noqa: BLE001 — propagate to callers
                for rid, fut in list(self._futures.items()):
                    if not fut.done():
                        fut.set_exception(e)
                self._futures.clear()
                # the pool state is suspect: also drop queued work and free
                # every slot — otherwise orphaned active rows keep decoding
                # with no future to resolve (their results accumulate
                # forever) and _busy() never clears
                pending.clear()
                self._emitted.clear()
                self._results.clear()
                inflight = None  # its snapshot rids no longer have futures
                self.server._slot_req = [None] * self.server.pool_size
                self.server._slot_cb = [None] * self.server.pool_size
                if self.server.state is not None:  # shared pools pin lazily
                    self.server.state = self.server.state._replace(
                        active=self.server.state.active.at[:].set(False))
                continue
            for rid in list(self._results):
                fut = self._futures.pop(rid, None)
                if fut is not None and not fut.done():
                    fut.set_result(self._results.pop(rid))
                self._emitted.pop(rid, None)
