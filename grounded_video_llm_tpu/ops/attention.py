"""Attention: XLA reference implementation + dispatch to Pallas flash kernels.

Replaces flash-attn CUDA (reference internvideo2.py:473-536 packed non-causal;
modeling_phi3.py:613-921 / modeling_llama.py:402-696 causal+GQA) with:
  * a numerically careful XLA path (fp32 softmax, works everywhere, used on CPU
    tests and as the autodiff-friendly fallback), and
  * Pallas splash/flash kernels on TPU (ops/flash_attention.py) for the hot
    shapes, selected by `use_flash`.

Layout convention everywhere: [B, S, H, D] ("BSHD"), GQA by head-group einsum —
no materialized K/V head repeat.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

# A Mosaic regression silently degrading every attention call to the XLA path
# (2.5x slower) must not pass unnoticed: log loudly once, and let strict
# environments (benches, kernel CI) turn the fallback into a hard error.
_STRICT_FLASH = os.environ.get("GVLLM_STRICT_FLASH", "0") == "1"
_fallback_logged = False


def _flash_available() -> bool:
    return jax.default_backend() == "tpu"


def mha(
    q: jnp.ndarray,              # [B, Sq, H, D]
    k: jnp.ndarray,              # [B, Sk, Hkv, D]
    v: jnp.ndarray,              # [B, Sk, Hkv, D]
    *,
    causal: bool = False,
    mask: Optional[jnp.ndarray] = None,   # [B, Sk] keep-mask or [B,1,Sq,Sk] bias-mask
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
    bounded_softmax: bool = False,
    sliding_window: Optional[int] = None,
) -> jnp.ndarray:
    """Multi-head attention with fp32 softmax. Returns [B, Sq, H, D].

    bounded_softmax: flash-kernel fast path replacing the row-max pass with a
    fixed exp offset — exact (softmax is offset-invariant) whenever scores
    can't exceed flash_attention.BOUNDED_OFFSET + ~88; callers assert that
    via score structure (e.g. QK-RMSNorm). The XLA path ignores it.

    sliding_window: keep only keys with qpos - kpos < window (reference
    modeling_phi3.py:688-718 / HF _make_sliding_window_causal_mask). Requires
    causal=True; None → full causal."""
    if use_flash is None:
        use_flash = _flash_available()
    if use_flash:
        try:
            from .flash_attention import flash_mha

            return flash_mha(q, k, v, causal=causal, mask=mask, scale=scale,
                             bounded_softmax=bounded_softmax,
                             sliding_window=sliding_window)
        except Exception as e:
            if _STRICT_FLASH:
                raise
            global _fallback_logged
            if not _fallback_logged:
                _fallback_logged = True
                logger.error(
                    "Pallas flash attention failed — falling back to the XLA "
                    "path (~2.5x slower). Set GVLLM_STRICT_FLASH=1 to make "
                    "this fatal. First failure: %r", e)
    return xla_mha(q, k, v, causal=causal, mask=mask, scale=scale,
                   sliding_window=sliding_window)


def xla_mha(q, k, v, *, causal=False, mask=None, scale=None,
            sliding_window=None):
    B, Sq, H, D = q.shape
    _, Sk, Hkv, _ = k.shape
    if scale is None:
        scale = D ** -0.5
    groups = H // Hkv
    qg = q.reshape(B, Sq, Hkv, groups, D)
    # scores [B, Hkv, groups, Sq, Sk] — fp32 accumulate on the MXU
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k,
                        preferred_element_type=jnp.float32) * scale
    neg = jnp.finfo(jnp.float32).min
    if causal:
        # positions: offset so the last query attends to the full key range
        qpos = jnp.arange(Sq)[:, None] + (Sk - Sq)
        kpos = jnp.arange(Sk)[None, :]
        keep = kpos <= qpos
        if sliding_window is not None:
            keep = keep & (qpos - kpos < sliding_window)
        scores = jnp.where(keep[None, None, None], scores, neg)
    if mask is not None:
        if mask.ndim == 2:  # [B, Sk] keep-mask
            scores = jnp.where(mask[:, None, None, None, :].astype(bool), scores, neg)
        else:  # [B, 1, Sq, Sk]
            scores = jnp.where(mask[:, :, None].astype(bool), scores, neg)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, Sq, H, D).astype(q.dtype)


def decode_attention(
    q: jnp.ndarray,              # [B, 1, H, D]
    k_cache: jnp.ndarray,        # [B, L, Hkv, D]
    v_cache: jnp.ndarray,        # [B, L, Hkv, D]
    valid_mask: jnp.ndarray,     # [B, L] — 1 for attendable cache slots
    *,
    k_new: Optional[jnp.ndarray] = None,  # [B, 1, Hkv, D] current token's k
    v_new: Optional[jnp.ndarray] = None,  # [B, 1, Hkv, D]
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Single-token decode attention over a fixed-size cache with an explicit
    slot-validity mask (covers left-padding holes in the prefix) — the
    static-shape TPU replacement for HF DynamicCache (reference
    modeling_phi3.py:567-569, SURVEY §3.5).

    k_new/v_new: the current token's k/v handled as an extra logical slot so
    the caller can defer the cache write to AFTER the layer scan — writing
    inside the scan would stack full-cache copies as scan outputs (measured:
    ~8 ms/token of pure copy traffic at a 3.6k cache)."""
    B, L, Hkv, D = k_cache.shape
    H = q.shape[2]
    if scale is None:
        scale = D ** -0.5
    groups = H // Hkv
    qg = q.reshape(B, Hkv, groups, D)
    scores = jnp.einsum("bhgd,bkhd->bhgk", qg, k_cache,
                        preferred_element_type=jnp.float32) * scale
    scores = jnp.where(valid_mask[:, None, None, :].astype(bool), scores,
                       jnp.finfo(jnp.float32).min)
    if k_new is not None:
        s_new = jnp.einsum("bhgd,bkhd->bhgk", qg, k_new,
                           preferred_element_type=jnp.float32) * scale
        scores = jnp.concatenate([scores, s_new], axis=-1)  # [B,Hkv,g,L+1]
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    if k_new is not None:
        p_cache, p_new = probs[..., :L], probs[..., L:]
        out = jnp.einsum("bhgk,bkhd->bhgd", p_cache.astype(v_cache.dtype),
                         v_cache, preferred_element_type=jnp.float32)
        out = out + jnp.einsum("bhgk,bkhd->bhgd", p_new.astype(v_new.dtype),
                               v_new, preferred_element_type=jnp.float32)
    else:
        out = jnp.einsum("bhgk,bkhd->bhgd", probs.astype(v_cache.dtype),
                         v_cache, preferred_element_type=jnp.float32)
    return out.reshape(B, 1, H, D).astype(q.dtype)
