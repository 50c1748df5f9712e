"""Beam search decode (num_beams > 1) — HF GenerationMixin beam semantics:
length-penalty 1.0, per-beam log-prob accumulation, EOS freezes a beam, stop
when every sample's best live beam cannot beat its worst finished one
(simplified to: all beams finished or budget exhausted).

The reference exposes --num_beams (inference.py:46) but always runs 1; this
implementation completes the API. Beams ride the batch dimension
(B*num_beams), so prefill/decode_step are reused unchanged; the KV cache is
reordered by beam parent with a gather per step.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.config import VLMConfig
from ..models import llm as llm_mod
from ..models import vlm

NEG = jnp.float32(-1e9)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "num_beams", "eos_token_id",
                     "pad_token_id"))
def beam_search_tokens(
    params,
    cfg: VLMConfig,
    input_ids: jnp.ndarray,       # [B, S]
    attn_mask: jnp.ndarray,       # [B, S]
    spatial_pixels: jnp.ndarray,
    temporal_pixels: jnp.ndarray,
    *,
    max_new_tokens: int,
    num_beams: int = 4,
    eos_token_id: int = 2,
    pad_token_id: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (tokens [B, max_new_tokens] of the best beam, lengths [B])."""
    B, S = input_ids.shape
    K = num_beams
    video_features = vlm.encode_video(params, cfg, spatial_pixels,
                                      temporal_pixels)
    embeds, _, mask = vlm.splice_multimodal(
        input_ids, None, attn_mask, video_features, params["llm"]["embed"])
    S_full = embeds.shape[1]
    max_len = S_full + max_new_tokens

    cache = llm_mod.KVCache.create(cfg.llm, B, max_len, dtype=embeds.dtype)
    logits, cache = llm_mod.prefill(params["llm"], cfg.llm, embeds, mask, cache)

    # expand to beams along batch
    def rep(x):
        return jnp.repeat(x, K, axis=0)

    cache = llm_mod.KVCache(
        jnp.repeat(cache.k, K, axis=1), jnp.repeat(cache.v, K, axis=1),
        rep(cache.length))
    valid = jnp.zeros((B * K, max_len), bool).at[:, :S_full].set(
        rep(mask).astype(bool))
    positions = rep(jnp.sum(mask, axis=-1).astype(jnp.int32))

    logp = jax.nn.log_softmax(logits, axis=-1)              # [B, V]
    V = logp.shape[-1]
    top_lp, top_tok = jax.lax.top_k(logp, K)                # [B, K]
    beam_scores = top_lp.reshape(B * K)
    cur_tok = top_tok.reshape(B * K).astype(jnp.int32)
    out = jnp.full((B * K, max_new_tokens), pad_token_id, jnp.int32)
    out = out.at[:, 0].set(cur_tok)
    done = cur_tok == eos_token_id

    def cond(st):
        step, _, _, _, _, done, _, _ = st
        return (step < max_new_tokens) & ~jnp.all(done)

    def body(st):
        step, beam_scores, cur_tok, out, valid, done, cache, positions = st
        token_embeds = llm_mod.embed_lookup(
            params["llm"]["embed"], cur_tok)[:, None, :]
        logits, cache, valid = llm_mod.decode_step(
            params["llm"], cfg.llm, token_embeds.astype(cache.k.dtype), cache,
            valid, positions)
        logp = jax.nn.log_softmax(logits, axis=-1)          # [B*K, V]
        # finished beams: only pad continues, score unchanged
        frozen = jnp.full((V,), NEG).at[pad_token_id].set(0.0)
        logp = jnp.where(done[:, None], frozen[None, :], logp)
        cand = beam_scores[:, None] + logp                  # [B*K, V]
        cand = cand.reshape(B, K * V)
        new_scores, flat_idx = jax.lax.top_k(cand, K)       # [B, K]
        parent = flat_idx // V                              # beam within sample
        token = (flat_idx % V).astype(jnp.int32)
        # global beam indices for gathering state
        gidx = (jnp.arange(B)[:, None] * K + parent).reshape(B * K)

        cache = llm_mod.KVCache(cache.k[:, gidx], cache.v[:, gidx],
                                cache.length[gidx])
        valid = valid[gidx]
        out = out[gidx].at[:, step].set(token.reshape(B * K))
        done = done[gidx] | (token.reshape(B * K) == eos_token_id)
        positions = positions[gidx] + 1
        return (step + 1, new_scores.reshape(B * K), token.reshape(B * K),
                out, valid, done, cache, positions)

    st = (jnp.asarray(1, jnp.int32), beam_scores, cur_tok, out, valid, done,
          cache, positions + 1)
    st = jax.lax.while_loop(cond, lambda s: body(s), st)
    _, final_scores, _, out, _, _, _, _ = st

    # pick the best beam per sample (length penalty 1.0 → raw score)
    best = jnp.argmax(final_scores.reshape(B, K), axis=-1)  # [B]
    out = out.reshape(B, K, max_new_tokens)[jnp.arange(B), best]
    lengths = jnp.sum(out != pad_token_id, axis=-1)
    return out, lengths
