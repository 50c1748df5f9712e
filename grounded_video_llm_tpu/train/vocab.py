"""Vocab expansion for temporal tokens: mean-of-existing-rows initialization.

Parity with reference llava_next_video.py:231-268 (reset_embeddings): 302 new
rows (<0>..<300> + <timestamp_grounding>) appended to both the input embedding
and lm_head, each initialized to the mean of the pre-existing rows.
"""

from __future__ import annotations

import jax.numpy as jnp


def expand_vocab(llm_params: dict, num_new_tokens: int) -> dict:
    """Append num_new_tokens mean-initialized rows to embed [V,D] and
    columns to lm_head [D,V]."""
    embed = llm_params["embed"]
    lm_head = llm_params["lm_head"]
    mean_embed = embed.mean(axis=0, keepdims=True)
    new_embed = jnp.concatenate(
        [embed, jnp.broadcast_to(mean_embed, (num_new_tokens, embed.shape[1]))],
        axis=0)
    mean_head = lm_head.mean(axis=1, keepdims=True)
    new_head = jnp.concatenate(
        [lm_head, jnp.broadcast_to(mean_head,
                                   (lm_head.shape[0], num_new_tokens))],
        axis=1)
    out = dict(llm_params)
    out["embed"] = new_embed
    out["lm_head"] = new_head
    return out
