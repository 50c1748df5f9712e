"""Generation engine: multimodal prefill + fixed-shape decode loop.

The serving analogue of reference llava_next_video.py:616-666 +
HF GenerationMixin (SURVEY §3.5), restructured for TPU:

  * prompts are left-padded (flip-pad-flip parity, text/tokenizer.py) so the
    newest token is always at a static position;
  * the KV cache is preallocated [L, B, prompt+video+max_new, Hkv, Dh] — no
    DynamicCache shape growth, one compile per (B, S_prompt_bucket) pair;
  * the decode loop is a jitted lax.while_loop with per-row EOS done-masking
    (stops when all rows finish — HF's unfinished_sequences logic);
  * sampling: greedy / temperature / top-p, matching inference.py:45-49
    defaults (do_sample=True, temperature=0.2, top_p=None, num_beams=1).

Only new tokens are returned (HF generate with inputs_embeds returns no prompt
tokens — the grounding parser depends on this, SURVEY §3.5).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import VLMConfig
from ..models import llm as llm_mod
from ..models import vlm


def sample_logits(logits: jnp.ndarray, rng: jax.Array, temperature: float,
                  top_p: Optional[float], do_sample: bool) -> jnp.ndarray:
    """logits [B, V] → token ids [B]."""
    if not do_sample or temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_p is not None and top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
        cumprobs = jnp.cumsum(sorted_probs, axis=-1)
        # keep the smallest set with cumulative prob > top_p (HF semantics:
        # tokens with cumprob - prob >= top_p are removed)
        cutoff_mask = (cumprobs - sorted_probs) >= top_p
        threshold = jnp.where(cutoff_mask, jnp.inf, sorted_logits).min(
            axis=-1, keepdims=True)
        logits = jnp.where(logits < threshold, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


class DecodeState(NamedTuple):
    cache: llm_mod.KVCache
    valid_mask: jnp.ndarray     # [B, max_len]
    positions: jnp.ndarray      # [B] next position id
    cur_token: jnp.ndarray      # [B] last sampled token
    out_tokens: jnp.ndarray     # [B, max_new] emitted tokens (pad-filled)
    step: jnp.ndarray           # [] int32
    done: jnp.ndarray           # [B] bool
    rng: jax.Array


def _generate_from_features(
    params,
    cfg: VLMConfig,
    input_ids: jnp.ndarray,        # [B, S] left-padded, one IMAGE_TOKEN_INDEX
    attn_mask: jnp.ndarray,        # [B, S]
    video_features: jnp.ndarray,   # [B, NV, H_llm] from vlm.encode_video
    rng: jax.Array,
    *,
    max_new_tokens: int,
    temperature: float,
    top_p: Optional[float],
    do_sample: bool,
    eos_token_id: int,
    pad_token_id: int,
    quantize_cache: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared splice → prefill → decode-loop body. Traced under BOTH the
    fused pixels-in program (generate_tokens, the single-dispatch headline
    path) and the from-features program (generate_tokens_from_features, the
    feature-cache path: encode once per unique video, generate per query)."""
    B, S = input_ids.shape
    embeds, _, mask = vlm.splice_multimodal(
        input_ids, None, attn_mask, video_features, params["llm"]["embed"])
    S_full = embeds.shape[1]
    # cache capacity rounds up to a 128 multiple: the int8 layout puts
    # max_len in the lane dim (pads to 128 in HBM regardless), and the
    # L-chunked decode-attention kernel wants block-divisible L
    max_len = -(-(S_full + max_new_tokens) // 128) * 128

    cache = llm_mod.KVCache.create(cfg.llm, B, max_len, dtype=embeds.dtype)
    logits, cache = llm_mod.prefill(params["llm"], cfg.llm, embeds, mask,
                                    cache, quantize_cache=quantize_cache)

    valid0 = jnp.zeros((B, max_len), bool).at[:, :S_full].set(mask.astype(bool))
    # next position continues after the last valid position (left-padded →
    # number of valid tokens)
    pos0 = jnp.sum(mask, axis=-1).astype(jnp.int32)
    return _decode_loop(
        params, cfg, logits, cache, valid0, pos0, rng,
        max_new_tokens=max_new_tokens, temperature=temperature, top_p=top_p,
        do_sample=do_sample, eos_token_id=eos_token_id,
        pad_token_id=pad_token_id)


def _decode_loop(
    params, cfg: VLMConfig, logits, cache, valid0, pos0, rng,
    *, max_new_tokens, temperature, top_p, do_sample, eos_token_id,
    pad_token_id, step_fn=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample the first token from the prefill logits, then run the jitted
    while-loop decode. Shared by the one-shot, from-features, and from-prefix
    prefill variants. step_fn(params, cfg, emb, cache, valid, positions)
    overrides llm.decode_step (the shared-prefix cascade path)."""
    if step_fn is None:
        step_fn = llm_mod.decode_step
    B = logits.shape[0]
    rng, sub = jax.random.split(rng)
    tok0 = sample_logits(logits, sub, temperature, top_p, do_sample)
    out0 = jnp.full((B, max_new_tokens), pad_token_id, jnp.int32)
    out0 = out0.at[:, 0].set(tok0)
    done0 = tok0 == eos_token_id

    state = DecodeState(cache, valid0, pos0, tok0, out0,
                        jnp.asarray(1, jnp.int32), done0, rng)

    def cond(st: DecodeState):
        return (st.step < max_new_tokens) & ~jnp.all(st.done)

    def body(st: DecodeState):
        # dtype follows the embedding table, NOT the cache (int8-cache mode)
        token_embeds = llm_mod.embed_lookup(
            params["llm"]["embed"], st.cur_token)[:, None, :]
        logits, cache, valid = step_fn(
            params["llm"], cfg.llm, token_embeds,
            st.cache, st.valid_mask, st.positions)
        rng, sub = jax.random.split(st.rng)
        nxt = sample_logits(logits, sub, temperature, top_p, do_sample)
        nxt = jnp.where(st.done, pad_token_id, nxt)
        out = st.out_tokens.at[:, st.step].set(nxt)
        done = st.done | (nxt == eos_token_id)
        return DecodeState(cache, valid, st.positions + 1, nxt, out,
                           st.step + 1, done, rng)

    final = jax.lax.while_loop(cond, body, state)
    lengths = jnp.sum((final.out_tokens != pad_token_id), axis=-1)
    return final.out_tokens, lengths


_GEN_STATICS = ("cfg", "max_new_tokens", "temperature", "top_p", "do_sample",
                "eos_token_id", "pad_token_id", "quantize_cache")


@functools.partial(jax.jit, static_argnames=_GEN_STATICS)
def generate_tokens(
    params,
    cfg: VLMConfig,
    input_ids: jnp.ndarray,       # [B, S] left-padded, one IMAGE_TOKEN_INDEX
    attn_mask: jnp.ndarray,       # [B, S]
    spatial_pixels: jnp.ndarray,  # [B, num_segs, 336, 336, 3]
    temporal_pixels: jnp.ndarray,  # [B, num_frames, 224, 224, 3]
    rng: jax.Array,
    *,
    max_new_tokens: int,
    temperature: float = 0.2,
    top_p: Optional[float] = None,
    do_sample: bool = True,
    eos_token_id: int = 2,
    pad_token_id: int = 0,
    quantize_cache: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (tokens [B, max_new_tokens] pad-filled after EOS, lengths [B])."""
    video_features = vlm.encode_video(params, cfg, spatial_pixels,
                                      temporal_pixels)
    return _generate_from_features(
        params, cfg, input_ids, attn_mask, video_features, rng,
        max_new_tokens=max_new_tokens, temperature=temperature, top_p=top_p,
        do_sample=do_sample, eos_token_id=eos_token_id,
        pad_token_id=pad_token_id, quantize_cache=quantize_cache)


@functools.partial(jax.jit, static_argnames=_GEN_STATICS)
def generate_tokens_from_features(
    params,
    cfg: VLMConfig,
    input_ids: jnp.ndarray,       # [B, S]
    attn_mask: jnp.ndarray,       # [B, S]
    video_features: jnp.ndarray,  # [B, NV, H_llm]
    rng: jax.Array,
    *,
    max_new_tokens: int,
    temperature: float = 0.2,
    top_p: Optional[float] = None,
    do_sample: bool = True,
    eos_token_id: int = 2,
    pad_token_id: int = 0,
    quantize_cache: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """generate_tokens from PRECOMPUTED video features (vlm.encode_video
    output). The feature-cache serving path: grounding/QA eval asks several
    queries per video (Charades-STA ≈2.8), and encode is ~80% of per-request
    device time — encode each unique video once, then batch queries over the
    cached features (serve/engine.py run_stream_cached). Token-identical to
    generate_tokens given the same features and rng."""
    return _generate_from_features(
        params, cfg, input_ids, attn_mask, video_features, rng,
        max_new_tokens=max_new_tokens, temperature=temperature, top_p=top_p,
        do_sample=do_sample, eos_token_id=eos_token_id,
        pad_token_id=pad_token_id, quantize_cache=quantize_cache)


@functools.partial(jax.jit, static_argnames=("cfg", "rope_hint"))
def build_prefix_kv(params, cfg: VLMConfig,
                    pre_ids: jnp.ndarray,         # [Bp, St] left-padded
                    pre_mask: jnp.ndarray,        # [Bp, St]
                    video_features: jnp.ndarray,  # [Bp, NV, H_llm]
                    rope_hint: int):
    """bf16 prefix KV for prefix-cached serving: run the shared
    [pre-image text | video features] prompt head through the decoder once
    per video. Returns (k, v [L, Bp, Sp, Hkv, Dh] bf16, mask [Bp, Sp]) for
    llm.prefill_continue / generate_tokens_from_prefix.

    rope_hint must equal the continuation programs' cache capacity so
    LongRoPE factor selection agrees across the split (llm.forward_hidden)."""
    from ..models import llm as llm_mod

    lp = params["llm"]
    emb = llm_mod.embed_lookup(lp["embed"], pre_ids,
                               llm_mod.embed_dtype(lp["embed"]))
    embeds = jnp.concatenate(
        [emb, video_features.astype(emb.dtype)], axis=1)
    Bp, NV = video_features.shape[:2]
    mask = jnp.concatenate(
        [pre_mask.astype(jnp.int32),
         jnp.ones((Bp, NV), jnp.int32)], axis=1)
    _, (k, v) = llm_mod.forward_hidden(lp, cfg.llm, embeds, mask,
                                       collect_kv=True, rope_hint=rope_hint)
    return k.astype(jnp.bfloat16), v.astype(jnp.bfloat16), mask


_PREFIX_STATICS = ("cfg", "max_new_tokens", "temperature", "top_p",
                   "do_sample", "eos_token_id", "pad_token_id",
                   "quantize_cache", "shared_prefix")


@functools.partial(jax.jit, static_argnames=_PREFIX_STATICS)
def generate_tokens_from_prefix(
    params,
    cfg: VLMConfig,
    post_ids: jnp.ndarray,      # [B, Sq] left-padded question chunk
    post_mask: jnp.ndarray,     # [B, Sq]
    prefix_k: jnp.ndarray,      # [L, Bp, Sp, Hkv, Dh] from build_prefix_kv
    prefix_v: jnp.ndarray,
    prefix_mask: jnp.ndarray,   # [Bp, Sp]
    rng: jax.Array,
    *,
    max_new_tokens: int,
    temperature: float = 0.2,
    top_p: Optional[float] = None,
    do_sample: bool = True,
    eos_token_id: int = 2,
    pad_token_id: int = 0,
    quantize_cache: bool = False,
    shared_prefix: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generation over a per-video cached prefix KV: each query prefills only
    its question chunk (llm.prefill_continue) instead of the full ~3.6k-token
    spliced prompt — the prefix-cache serving path layered on the feature
    cache (encode once AND prefill the shared head once per video). The
    decode phase sees the same int8 cache values full prefill would
    quantize, so tokens match generate_tokens_from_features up to the
    attention-reduction rounding of the question rows.

    shared_prefix: decode through llm.decode_step_shared (Hydragen/cascade
    layout — the prefix int8 KV is stored once at batch dim 1 and streamed
    once per token for ALL rows instead of once per row; decode is
    DMA-bound, so for same-video batches this cuts the dominant decode
    stream ~B-fold). Requires quantize_cache=True."""
    from ..models import llm as llm_mod

    B, Sq = post_ids.shape
    Sp = prefix_k.shape[2]
    max_len = -(-(Sp + Sq + max_new_tokens) // 128) * 128
    lp = params["llm"]
    chunk_embeds = llm_mod.embed_lookup(lp["embed"], post_ids,
                                        llm_mod.embed_dtype(lp["embed"]))
    if shared_prefix:
        tail_len = -(-(Sq + max_new_tokens) // 128) * 128
        logits, cache, valid0, pos0 = llm_mod.prefill_continue(
            lp, cfg.llm, chunk_embeds, post_mask, prefix_k, prefix_v,
            prefix_mask, max_len, quantize_cache=True, tail_len=tail_len)
        step_fn = functools.partial(llm_mod.decode_step_shared,
                                    rope_hint=max_len)
        return _decode_loop(
            params, cfg, logits, cache, valid0, pos0, rng,
            max_new_tokens=max_new_tokens, temperature=temperature,
            top_p=top_p, do_sample=do_sample, eos_token_id=eos_token_id,
            pad_token_id=pad_token_id, step_fn=step_fn)
    logits, cache, valid0, pos0 = llm_mod.prefill_continue(
        lp, cfg.llm, chunk_embeds, post_mask, prefix_k, prefix_v,
        prefix_mask, max_len, quantize_cache=quantize_cache)
    return _decode_loop(
        params, cfg, logits, cache, valid0, pos0, rng,
        max_new_tokens=max_new_tokens, temperature=temperature, top_p=top_p,
        do_sample=do_sample, eos_token_id=eos_token_id,
        pad_token_id=pad_token_id)


def decode_texts(tokenizer, tokens, lengths, eos_token_id: int):
    """Host-side detokenization: strip eos + pad, skip specials, strip
    whitespace (reference llava_next_video.py:663-665)."""
    texts = []
    import numpy as np

    tokens = np.asarray(tokens)
    lengths = np.asarray(lengths)
    for row, n in zip(tokens, lengths):
        ids = [int(t) for t in row[:n] if int(t) != eos_token_id]
        texts.append(tokenizer.decode(ids, skip_special_tokens=True).strip())
    return texts
