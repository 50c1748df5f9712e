"""Rotary position embeddings, fp32 tables, HF rotate-half convention.

Covers plain RoPE (reference modeling_phi3.py:341-369, modeling_llama.py:94-130)
and Phi-3's LongRoPE dual-factor scaling (reference modeling_phi3.py:371-409):
per-dim frequency rescale factors — the `short_factor` table below
original_max_position_embeddings, the `long_factor` table beyond — plus a global
sqrt(1 + ln(scale)/ln(orig_max)) magnitude correction on cos/sin.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def rope_inv_freq(head_dim: int, theta: float,
                  factors: Optional[Tuple[float, ...]] = None) -> jnp.ndarray:
    """inv_freq is a function of static config only, so it is computed on the
    host in float64 and rounded ONCE to fp32 — at position ~7.5k (grounded
    prefill) a couple of fp32 pow/div ulps in inv_freq amplify to ~1e-2 in
    cos/sin; the correctly-rounded table keeps the angle error at a single
    final rounding (strictly more accurate than the reference's fp32 chain,
    modeling_phi3.py:387-388)."""
    exponent = np.arange(0, head_dim, 2, dtype=np.float64) / head_dim
    inv_freq = 1.0 / (theta ** exponent)
    if factors:
        inv_freq = inv_freq / np.asarray(factors, dtype=np.float64)
    return jnp.asarray(inv_freq.astype(np.float32))


def rope_tables(positions: jnp.ndarray, head_dim: int, theta: float,
                factors: Optional[Tuple[float, ...]] = None,
                mscale: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin fp32 tables for given positions [..., S] → [..., S, head_dim]."""
    inv_freq = rope_inv_freq(head_dim, theta, factors)
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [..., S, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)               # [..., S, D]
    return jnp.cos(emb) * mscale, jnp.sin(emb) * mscale


def longrope_mscale(max_position_embeddings: int,
                    original_max_position_embeddings: int) -> float:
    scale = max_position_embeddings / original_max_position_embeddings
    if scale <= 1.0:
        return 1.0
    return math.sqrt(1.0 + math.log(scale)
                     / math.log(original_max_position_embeddings))


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray,
               sin: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """q,k: [..., S, H, D]; cos/sin: [..., S, D] (broadcast over heads).

    Rotation happens in fp32 (reference modeling_phi3.py:359-367 keeps the
    tables fp32 and casts at the end)."""
    cos_b = cos[..., :, None, :]
    sin_b = sin[..., :, None, :]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    q_rot = qf * cos_b + rotate_half(qf) * sin_b
    k_rot = kf * cos_b + rotate_half(kf) * sin_b
    return q_rot.astype(q.dtype), k_rot.astype(k.dtype)


def llm_rope_tables(cfg, positions: jnp.ndarray,
                    seq_len_hint: Optional[int] = None):
    """Build cos/sin for an LLMConfig, selecting LongRoPE factors when the
    sequence extends past original_max_position_embeddings (reference
    modeling_phi3.py:392-397 picks long_factor iff seq_len > original_max)."""
    factors = None
    mscale = 1.0
    if cfg.rope_scaling_short or cfg.rope_scaling_long:
        limit = seq_len_hint if seq_len_hint is not None else int(positions.shape[-1])
        use_long = limit > cfg.original_max_position_embeddings
        factors = (cfg.rope_scaling_long if use_long else cfg.rope_scaling_short)
        mscale = longrope_mscale(cfg.max_position_embeddings,
                                 cfg.original_max_position_embeddings)
    return rope_tables(positions, cfg.head_dim, cfg.rope_theta, factors, mscale)
