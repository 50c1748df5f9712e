"""Normalization ops with fp32 accumulation islands.

RMSNorm computes its variance in fp32 then casts back (reference
models/internvideo2.py:437-449, modeling_phi3.py:310-326); LayerScale is
fp32-forced (reference internvideo2.py:451-463). LayerNorm follows the same
fp32-accumulate policy.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = (xf * (var + eps) ** -0.5).astype(dtype)
    return weight.astype(dtype) * normed


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * (var + eps) ** -0.5
    return (normed * weight.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(dtype)


def layer_scale(x: jnp.ndarray, gamma: jnp.ndarray) -> jnp.ndarray:
    """LayerScale with forced-fp32 multiply (reference internvideo2.py:458-463)."""
    return (x.astype(jnp.float32) * gamma.astype(jnp.float32)).astype(x.dtype)
