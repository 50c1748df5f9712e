"""Decode attention over an int8 KV cache (Pallas).

Int8 cache (per-position-per-head symmetric scales) halves both the cache's
HBM footprint — the capacity wall that limits the serving batch on one v5e —
and the per-token cache read traffic. The kernel dequantizes tile-by-tile in
VMEM; an XLA dequant path would materialize the full bf16 cache per step.

Layout: the quantized cache is HEAD-MAJOR and K/V-TRANSPOSED
[B, Hkv, D, max_len] (vs the bf16 cache's [B, max_len, Hkv, D]):
  * head-major so a head block sits in the untiled leading block dims —
    Pallas TPU requires the last two block dims tile-aligned or full, and an
    int8 (hb, D) tail tile would violate the (32, 128) int8 minimum;
  * D-then-max_len because the minor (lane) dim pads to 128: phi3's D=96 in
    lanes costs a 1.33x HBM expansion (measured: +891MB PER CACHE SIDE at
    batch 8 — the allocation that pushed batch-8 serving out of HBM), while
    max_len in lanes pads only to the next 128 slots and D=96 in sublanes is
    exactly the int8 32-sublane tile x3.

One program = one (batch, block of `head_block` kv-heads); python-unrolled
loop over the block's heads, each a dequantized GEMV + fp32 softmax over cache
slots plus the current token's extra slot (write deferral rationale in
ops/attention.decode_attention).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = float(jnp.finfo(jnp.float32).min)


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x [..., D] bf16 → (int8 [..., D], f32 scales [...]) absmax per row."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _kernel(q_ref, kq_ref, ks_ref, vq_ref, vs_ref, mask_ref, kn_ref, vn_ref,
            o_ref, *, scale, hb):
    keep = mask_ref[0, 0, :] != 0
    for j in range(hb):                              # static unroll, hb small
        q = q_ref[0, j, :, :]                        # [G, D] bf16
        kT = kq_ref[0, j, :, :].astype(jnp.bfloat16)  # [D, L] (transposed)
        ks = ks_ref[0, j, 0, :]                      # [L]
        s = jax.lax.dot_general(q, kT, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * ks[None, :] * scale                  # [G, L]
        s = jnp.where(keep[None, :], s, NEG_INF)

        kn = kn_ref[0, j, :, :]                      # [1, D]
        s_new = jax.lax.dot_general(q, kn, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
        s_all = jnp.concatenate([s, s_new], axis=-1)
        m = jnp.max(s_all, axis=-1, keepdims=True)
        p = jnp.exp(s_all - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)

        L = kT.shape[1]
        vT = vq_ref[0, j, :, :].astype(jnp.bfloat16)  # [D, L]
        vs = vs_ref[0, j, 0, :]
        # fold the per-position v scales into p before the PV matmul;
        # contraction runs over L (the lane dim of vT) — out = p @ v == vT·pᵀ
        p_cache = (p[:, :L] * vs[None, :]).astype(jnp.bfloat16)
        out = jax.lax.dot_general(p_cache, vT, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        vn = vn_ref[0, j, :, :]                      # [1, D]
        out = out + p[:, L:].astype(jnp.float32) * vn.astype(jnp.float32)
        o_ref[0, j, :, :] = out.astype(o_ref.dtype)


def decode_attention_int8(
    q: jnp.ndarray,        # [B, 1, H, D] bf16
    k_q: jnp.ndarray,      # [B, Hkv, D, max_len] int8 (head-major, transposed)
    k_s: jnp.ndarray,      # [B, Hkv, 1, max_len] f32
    v_q: jnp.ndarray,      # [B, Hkv, D, max_len] int8
    v_s: jnp.ndarray,      # [B, Hkv, 1, max_len] f32
    valid_mask: jnp.ndarray,  # [B, max_len]
    k_new: jnp.ndarray,    # [B, 1, Hkv, D] bf16 (current token)
    v_new: jnp.ndarray,    # [B, 1, Hkv, D] bf16
    *,
    scale: float,
    head_block: int = 4,
) -> jnp.ndarray:
    B, Hkv, D, L = k_q.shape
    H = q.shape[2]
    G = H // Hkv
    hb = head_block
    while Hkv % hb != 0:
        hb //= 2
    n_hblocks = Hkv // hb

    qt = q.reshape(B, Hkv, G, D)                     # head order (hkv, g)
    knt = k_new.reshape(B, Hkv, 1, D)
    vnt = v_new.reshape(B, Hkv, 1, D)
    maskt = valid_mask[:, None, :].astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, hb=hb),
        grid=(B, n_hblocks),
        in_specs=[
            pl.BlockSpec((1, hb, G, D), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, hb, D, L), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, hb, 1, L), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, hb, D, L), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, hb, 1, L), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, hb, 1, D), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, hb, 1, D), lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb, G, D), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qt, k_q, k_s, v_q, v_s, maskt, knt, vnt)
    # head order is (hkv, g) — exactly how _qkv lays H out; no transpose
    return out.reshape(B, 1, H, D)
