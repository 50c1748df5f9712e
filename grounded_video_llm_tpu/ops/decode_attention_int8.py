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

One program = one (batch, block of `head_block` kv-heads). The kernel is
VECTORIZED ACROSS THE HEAD BLOCK: dequant, score mult-reduce, softmax and PV
all operate on [hb(..G), D|L]-shaped tiles. The first version python-unrolled
per head, putting every VPU op on [1, L] rows — 1/8 sublane utilization —
and every matmul on 1-row MXU passes; measured 22.8 ms/token of the 31.5
ms/token batch-6 decode step (scripts/ablate_decode.py). Scores and PV are
broadcast-multiply + axis-reductions (pure VPU): at MHA group size 1 the MXU
runs 1-row systolic passes that cost more than they save, while the VPU forms
stream the int8 tiles at full width.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = float(jnp.finfo(jnp.float32).min)

# L-chunk width for the in-kernel int8→bf16 conversion feeding the MXU dots
# (the bf16 copy is [hb, D, BLOCK_L] ≈ 0.8MB instead of a 5.5MB whole-block
# copy). NOTE an L-gridded variant (one grid step per chunk, online-softmax
# scratch) was tried and REVERTED: small chunk DMAs measured 374 GB/s vs the
# whole-block layout's 515 (sweep_decode_attn).
BLOCK_L = 512

# Score dot directly on int8: quantize the tiny q block per head IN-KERNEL
# (absmax over D) and feed the MXU an int8 x int8 -> int32 dot against the
# raw K cache tiles, skipping the K-side int8->bf16 VPU convert. Per-head q
# scales commute out of the contraction; the added q rounding is the same
# W8A8 error class as the opt-in decode GEMVs (A/B cosine 0.999997).
#
# MEASURED A DEAD END and left off: 8.14 -> 8.10 ms/32-layer pass (+0.5%,
# inside run noise), and a wrong-math probe that ALSO ran the PV dot on int8
# (no converts left at all) measured 0.98x — the kernel is NOT convert- or
# VPU-bound. 515-525 GB/s is this box's genuine DMA plateau for the pattern
# (contiguous 2.75MB K/V blocks, 24 grid steps/layer): chunked L-grids
# (374 GB/s), hb/block_l sweeps, int8 score dots, and all-int8 dots all land
# on it, and a plain XLA 4GB reduce streams at only 439 GB/s. The decode
# attention kernel is at its floor on this hardware path.
INT8_SCORE_DOT = False


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x [..., D] bf16 → (int8 [..., D], f32 scales [...]) absmax per row."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _kernel(q_ref, kq_ref, ks_ref, vq_ref, vs_ref, mask_ref, kn_ref, vn_ref,
            o_ref, *, scale, hb, block_l, int8_score):
    """One program = one (batch, kv-head block) with the WHOLE cache block
    resident in VMEM (big DMAs stream best: an L-gridded chunk variant
    measured 374 vs 515 GB/s). The dots run on the MXU: each L-chunk of K/V
    converts int8→bf16 ONCE (one VPU pass) and feeds a plain 2-D
    dot_general — the previous VPU formulation (broadcast-multiply +
    axis-reduce) paid ~3 full-tile VPU passes per side and bound the kernel
    on the VPU, not the DMA.

    Mosaic has no batched-dot lowering, so the per-head structure flattens
    into standard matmuls: the caller passes K/V HEAD-FLAT ([hb*D, L], a
    free reshape of the head-major layout) and
      * scores = blockdiag(q) [hb, hb*D] @ K_flat [hb*D, L] — the block-
        diagonal embedding zeroes cross-head terms (8x redundant MACs on an
        otherwise-idle MXU);
      * PV     = V_flat [hb*D, L] @ pv^T — via the A@B^T dot form → a
        [hb*D, hb] tile whose (h-block, h) "diagonal" columns are the
        outputs; a tiny masked reduce extracts them.
    Per-position scales fold AFTER the dot on [hb, L] tiles (per-(head,
    position) scales are constant over D, so they commute out of the
    contraction). The GQA group is a python unroll (G=1 for phi3, 4 for
    llama).

    Cache refs (kq/vq) are [.., hb*D, L] with one or two leading singleton
    block dims (per-layer vs stacked layer-indexed entry points); scale refs
    stay [.., hb, 1, L]."""
    G = q_ref.shape[2]
    D = q_ref.shape[3]
    L = kq_ref.shape[-1]
    cp = (0,) * (kq_ref.ndim - 2)                        # cache lead index
    sp = (0,) * (ks_ref.ndim - 3)
    keep = (mask_ref[0, 0, :] != 0)[None, :]             # [1, L]
    qf = q_ref[0].astype(jnp.float32)                    # [hb, G, D]
    ks = ks_ref[sp + (slice(None), 0, slice(None))]      # [hb, L]
    vs = vs_ref[sp + (slice(None), 0, slice(None))]
    knf = kn_ref[0, :, 0, :].astype(jnp.float32)         # [hb, D]
    vnf = vn_ref[0, :, 0, :].astype(jnp.float32)

    # block-diagonal selector masks (built once, tiny)
    col_h = jax.lax.broadcasted_iota(jnp.int32, (hb, hb * D), 1) // D
    row_h = jax.lax.broadcasted_iota(jnp.int32, (hb, hb * D), 0)
    bd_mask = col_h == row_h                             # [hb, hb*D]

    for g in range(G):
        q_g = qf[:, g, :]                                # [hb, D] f32
        if int8_score:
            # ---- scores: int8 q (per-head absmax) x raw int8 K on the MXU,
            # no K-side convert; per-head q scales commute out of the dot
            qmax = jnp.max(jnp.abs(q_g), axis=-1, keepdims=True)
            qsc = jnp.maximum(qmax / 127.0, 1e-8)        # [hb, 1]
            q8 = jnp.clip(jnp.round(q_g / qsc), -127., 127.)
            q_bd = jnp.where(bd_mask, jnp.tile(q8, (1, hb)), 0.0).astype(
                jnp.int8)                                # [hb, hb*D]
        else:
            # blockdiag(q): [h, h'*D+d] = q[h, d] iff h' == h
            q_bd = jnp.where(bd_mask, jnp.tile(q_g, (1, hb)), 0.0).astype(
                jnp.bfloat16)                            # [hb, hb*D]
        # ---- scores: chunked (convert +) MXU ----
        parts = []
        start = 0
        while start < L:
            bl = min(block_l, L - start)
            k_c = kq_ref[cp + (slice(None), slice(start, start + bl))]
            if not int8_score:
                k_c = k_c.astype(jnp.bfloat16)
            parts.append(jax.lax.dot_general(
                q_bd, k_c, (((1,), (0,)), ((), ())),
                preferred_element_type=(jnp.int32 if int8_score
                                        else jnp.float32)))  # [hb, bl]
            start += bl
        s = jnp.concatenate(parts, axis=-1)              # [hb, L]
        if int8_score:
            s = s.astype(jnp.float32) * qsc * ks * scale
        else:
            s = s * ks * scale
        s = jnp.where(keep, s, NEG_INF)

        s_new = jnp.sum(q_g * knf, axis=-1)[:, None] * scale  # [hb, 1]
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_new)
        p = jnp.exp(s - m)                               # [hb, L]
        p_new = jnp.exp(s_new - m)                       # [hb, 1]
        denom = jnp.sum(p, axis=-1, keepdims=True) + p_new

        # ---- PV: fold v scales into p, chunked convert + MXU A@B^T ----
        pv = (p * vs).astype(jnp.bfloat16)               # [hb, L]
        y2 = jnp.zeros((hb * D, hb), jnp.float32)
        start = 0
        while start < L:
            bl = min(block_l, L - start)
            v_c = vq_ref[cp + (slice(None),
                          slice(start, start + bl))].astype(jnp.bfloat16)
            pv_c = jax.lax.slice(pv, (0, start), (hb, start + bl))
            y2 = y2 + jax.lax.dot_general(
                v_c, pv_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [hb*D, hb]
            start += bl
        # extract the per-head-block column: out[h, d] = y2[h*D+d, h]
        sel = (jax.lax.broadcasted_iota(jnp.int32, (hb * D, hb), 0) // D
               == jax.lax.broadcasted_iota(jnp.int32, (hb * D, hb), 1))
        out = jnp.sum(jnp.where(sel, y2, 0.0), axis=1).reshape(hb, D)
        out = out + p_new * vnf
        out = out / denom
        o_ref[0, :, g, :] = out.astype(o_ref.dtype)


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
    head_block: int = 8,
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
    kf = k_q.reshape(B, Hkv * D, L)                  # head-flat (free)
    vf = v_q.reshape(B, Hkv * D, L)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, hb=hb, block_l=BLOCK_L,
                          int8_score=INT8_SCORE_DOT),
        grid=(B, n_hblocks),
        in_specs=[
            pl.BlockSpec((1, hb, G, D), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, hb * D, L), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, hb, 1, L), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, hb * D, L), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, hb, 1, L), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, hb, 1, D), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, hb, 1, D), lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb, G, D), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qt, kf, k_s, vf, v_s, maskt, knt, vnt)
    # head order is (hkv, g) — exactly how _qkv lays H out; no transpose
    return out.reshape(B, 1, H, D)


def _kernel_multi(q_ref, kq_ref, ks_ref, vq_ref, vs_ref, mask_ref, kn_ref,
                  vn_ref, o_ref, *, scale, hb, block_l, n_new):
    """Multi-query generalization of `_kernel` for speculative verification:
    S=n_new new tokens attend the committed cache (per-query mask rows) plus
    each other causally. With n_new=1 this reduces exactly to `_kernel`'s
    math (the new token's k/v stay bf16 — same numerics as decode_step).

    The block-diagonal q embedding grows to S rows per head
    ([hb*S, hb*D] @ K_flat [hb*D, L]) — more MXU rows for the same cache DMA,
    which is the whole point: one cache stream verifies S draft tokens.

    Refs: q [1, hb, G, S, D]; cache as `_kernel`; mask [1, S, L];
    kn/vn HEAD-FLAT-TRANSPOSED [1(,1), hb*D, S]; out [1, hb, G, S, D]."""
    G = q_ref.shape[2]
    S = n_new
    D = q_ref.shape[4]
    L = kq_ref.shape[-1]
    cp = (0,) * (kq_ref.ndim - 2)                        # cache lead index
    sp = (0,) * (ks_ref.ndim - 3)
    np_ = (0,) * (kn_ref.ndim - 2)                       # new-kv lead index
    keep = mask_ref[0] != 0                              # [S, L]
    qf = q_ref[0].astype(jnp.float32)                    # [hb, G, S, D]
    ks = ks_ref[sp + (slice(None), 0, slice(None))]      # [hb, L]
    vs = vs_ref[sp + (slice(None), 0, slice(None))]
    knf = kn_ref[np_].astype(jnp.bfloat16)               # [hb*D, S]
    vnf = vn_ref[np_].astype(jnp.bfloat16)

    # block-diagonal selector: row h*S+i is nonzero only in head h's columns
    col_h = jax.lax.broadcasted_iota(jnp.int32, (hb * S, hb * D), 1) // D
    row_h = jax.lax.broadcasted_iota(jnp.int32, (hb * S, hb * D), 0) // S
    bd_mask = col_h == row_h

    # causal mask among the S new tokens: query i sees new tokens j <= i
    c_i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    c_j = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    causal = c_j <= c_i                                  # [S, S]

    # PV extraction selector: out[h, i, d] lives at y2[h*D + d, h*S + i]
    rowp = jax.lax.broadcasted_iota(jnp.int32, (hb * D, hb * S), 0)
    colp = jax.lax.broadcasted_iota(jnp.int32, (hb * D, hb * S), 1)
    sel_h = (rowp // D) == (colp // S)

    for g in range(G):
        q2 = qf[:, g].reshape(hb * S, D)                 # [hb*S, D] f32
        q_bd = jnp.where(bd_mask, jnp.tile(q2, (1, hb)), 0.0).astype(
            jnp.bfloat16)                                # [hb*S, hb*D]
        # ---- cache scores: chunked convert + MXU ----
        parts = []
        start = 0
        while start < L:
            bl = min(block_l, L - start)
            k_c = kq_ref[cp + (slice(None), slice(start, start + bl))]
            parts.append(jax.lax.dot_general(
                q_bd, k_c.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))     # [hb*S, bl]
            start += bl
        s3 = jnp.concatenate(parts, axis=-1).reshape(hb, S, L)
        s3 = s3 * (ks * scale)[:, None, :]
        s3 = jnp.where(keep[None], s3, NEG_INF)
        # ---- new-token scores (bf16 keys, causal) ----
        sn = jax.lax.dot_general(q_bd, knf, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sn3 = sn.reshape(hb, S, S) * scale
        sn3 = jnp.where(causal[None], sn3, NEG_INF)
        # ---- joint softmax, normalized before PV ----
        m = jnp.maximum(jnp.max(s3, axis=-1), jnp.max(sn3, axis=-1))  # [hb,S]
        p3 = jnp.exp(s3 - m[..., None])
        pn3 = jnp.exp(sn3 - m[..., None])
        denom = jnp.sum(p3, axis=-1) + jnp.sum(pn3, axis=-1)          # [hb,S]
        p3 = p3 / denom[..., None]
        pn3 = pn3 / denom[..., None]
        # ---- PV: fold v scales into p, chunked convert + MXU A@B^T ----
        pv = (p3 * vs[:, None, :]).reshape(hb * S, L).astype(jnp.bfloat16)
        y2 = jax.lax.dot_general(
            vnf, pn3.reshape(hb * S, S).astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [hb*D, hb*S]
        start = 0
        while start < L:
            bl = min(block_l, L - start)
            v_c = vq_ref[cp + (slice(None),
                          slice(start, start + bl))].astype(jnp.bfloat16)
            pv_c = jax.lax.slice(pv, (0, start), (hb * S, start + bl))
            y2 = y2 + jax.lax.dot_general(
                v_c, pv_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [hb*D, hb*S]
            start += bl
        # extract per new-token column blocks (S is small and static)
        for i in range(S):
            sel = sel_h & (colp % S == i)
            out = jnp.sum(jnp.where(sel, y2, 0.0), axis=1).reshape(hb, D)
            o_ref[0, :, g, i, :] = out.astype(o_ref.dtype)


def verify_attention_int8(
    q: jnp.ndarray,        # [B, S, H, D] bf16 — S new tokens' queries
    k_q: jnp.ndarray,      # [B, Hkv, D, max_len] int8 (head-major, transposed)
    k_s: jnp.ndarray,      # [B, Hkv, 1, max_len] f32
    v_q: jnp.ndarray,      # [B, Hkv, D, max_len] int8
    v_s: jnp.ndarray,      # [B, Hkv, 1, max_len] f32
    valid_mask: jnp.ndarray,  # [B, S, max_len] per-query attendable slots
    k_new: jnp.ndarray,    # [B, S, Hkv, D] bf16 (the S new tokens)
    v_new: jnp.ndarray,    # [B, S, Hkv, D] bf16
    *,
    scale: float,
    head_block: int = 8,
) -> jnp.ndarray:
    """Speculative-verify attention: S queries over cache + causal new block.
    Returns [B, S, H, D]."""
    B, Hkv, D, L = k_q.shape
    S = q.shape[1]
    H = q.shape[2]
    G = H // Hkv
    hb = head_block
    while Hkv % hb != 0:
        hb //= 2
    n_hblocks = Hkv // hb

    # [B, S, H, D] → [B, Hkv, G, S, D] (head order (hkv, g), matching _qkv)
    qt = q.reshape(B, S, Hkv, G, D).transpose(0, 2, 3, 1, 4)
    # new k/v head-flat-transposed: [B, S, Hkv, D] → [B, Hkv*D, S]
    knt = k_new.transpose(0, 2, 3, 1).reshape(B, Hkv * D, S)
    vnt = v_new.transpose(0, 2, 3, 1).reshape(B, Hkv * D, S)
    maskt = valid_mask.astype(jnp.int32)
    kf = k_q.reshape(B, Hkv * D, L)
    vf = v_q.reshape(B, Hkv * D, L)

    out = pl.pallas_call(
        functools.partial(_kernel_multi, scale=scale, hb=hb,
                          block_l=BLOCK_L, n_new=S),
        grid=(B, n_hblocks),
        in_specs=[
            pl.BlockSpec((1, hb, G, S, D), lambda b, i: (b, i, 0, 0, 0)),
            pl.BlockSpec((1, hb * D, L), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, hb, 1, L), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, hb * D, L), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, hb, 1, L), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, S, L), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, hb * D, S), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, hb * D, S), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb, G, S, D), lambda b, i: (b, i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, S, D), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qt, kf, k_s, vf, v_s, maskt, knt, vnt)
    # [B, Hkv, G, S, D] → [B, S, H, D]
    return out.transpose(0, 3, 1, 2, 4).reshape(B, S, H, D)


def verify_attention_int8_layer(
    q: jnp.ndarray,        # [B, S, H, D] bf16
    k_q: jnp.ndarray,      # [Lyr, B, Hkv, D, max_len] int8 (FULL stacked cache)
    k_s: jnp.ndarray,      # [Lyr, B, Hkv, 1, max_len] f32
    v_q: jnp.ndarray,      # [Lyr, B, Hkv, D, max_len] int8
    v_s: jnp.ndarray,      # [Lyr, B, Hkv, 1, max_len] f32
    valid_mask: jnp.ndarray,  # [B, S, max_len]
    k_new: jnp.ndarray,    # [B, S, Hkv, D] bf16
    v_new: jnp.ndarray,    # [B, S, Hkv, D] bf16
    layer_idx: jnp.ndarray,  # [] int32
    *,
    scale: float,
    head_block: int = 8,
) -> jnp.ndarray:
    """verify_attention_int8 over the FULL stacked cache with the layer
    selected via scalar prefetch (same rationale as decode_attention_int8_layer:
    pre-slicing the layer copies the whole cache per pass)."""
    from jax.experimental.pallas import tpu as pltpu

    Lyr, B, Hkv, D, L = k_q.shape
    S = q.shape[1]
    H = q.shape[2]
    G = H // Hkv
    hb = head_block
    while Hkv % hb != 0:
        hb //= 2
    n_hblocks = Hkv // hb

    qt = q.reshape(B, S, Hkv, G, D).transpose(0, 2, 3, 1, 4)
    knt = k_new.transpose(0, 2, 3, 1).reshape(B, Hkv * D, S)
    vnt = v_new.transpose(0, 2, 3, 1).reshape(B, Hkv * D, S)
    maskt = valid_mask.astype(jnp.int32)
    kf = k_q.reshape(Lyr, B, Hkv * D, L)
    vf = v_q.reshape(Lyr, B, Hkv * D, L)

    def kernel(lidx_ref, *refs):
        del lidx_ref
        _kernel_multi(*refs, scale=scale, hb=hb, block_l=BLOCK_L, n_new=S)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_hblocks),
            in_specs=[
                pl.BlockSpec((1, hb, G, S, D),
                             lambda b, i, lidx: (b, i, 0, 0, 0)),
                pl.BlockSpec((1, 1, hb * D, L),
                             lambda b, i, lidx: (lidx[0], b, i, 0)),
                pl.BlockSpec((1, 1, hb, 1, L),
                             lambda b, i, lidx: (lidx[0], b, i, 0, 0)),
                pl.BlockSpec((1, 1, hb * D, L),
                             lambda b, i, lidx: (lidx[0], b, i, 0)),
                pl.BlockSpec((1, 1, hb, 1, L),
                             lambda b, i, lidx: (lidx[0], b, i, 0, 0)),
                pl.BlockSpec((1, S, L), lambda b, i, lidx: (b, 0, 0)),
                pl.BlockSpec((1, hb * D, S), lambda b, i, lidx: (b, i, 0)),
                pl.BlockSpec((1, hb * D, S), lambda b, i, lidx: (b, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, hb, G, S, D),
                                   lambda b, i, lidx: (b, i, 0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, S, D), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1),
      qt, kf, k_s, vf, v_s, maskt, knt, vnt)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, S, H, D)


def decode_attention_int8_layer(
    q: jnp.ndarray,        # [B, 1, H, D] bf16
    k_q: jnp.ndarray,      # [Lyr, B, Hkv, D, max_len] int8 (FULL stacked cache)
    k_s: jnp.ndarray,      # [Lyr, B, Hkv, 1, max_len] f32
    v_q: jnp.ndarray,      # [Lyr, B, Hkv, D, max_len] int8
    v_s: jnp.ndarray,      # [Lyr, B, Hkv, 1, max_len] f32
    valid_mask: jnp.ndarray,  # [B, max_len]
    k_new: jnp.ndarray,    # [B, 1, Hkv, D] bf16 (current token)
    v_new: jnp.ndarray,    # [B, 1, Hkv, D] bf16
    layer_idx: jnp.ndarray,  # [] int32
    *,
    scale: float,
    head_block: int = 8,
) -> jnp.ndarray:
    """Same math as decode_attention_int8 but over the FULL stacked cache with
    the layer selected via scalar prefetch. Slicing the layer out before the
    call (lax.scan xs) materializes a copy of the whole layer's cache per
    token — pallas consumers are opaque to XLA slice fusion; the copies (not
    the kernel) dominated the measured decode step."""
    from jax.experimental.pallas import tpu as pltpu

    Lyr, B, Hkv, D, L = k_q.shape
    H = q.shape[2]
    G = H // Hkv
    hb = head_block
    while Hkv % hb != 0:
        hb //= 2
    n_hblocks = Hkv // hb

    qt = q.reshape(B, Hkv, G, D)
    knt = k_new.reshape(B, Hkv, 1, D)
    vnt = v_new.reshape(B, Hkv, 1, D)
    maskt = valid_mask[:, None, :].astype(jnp.int32)
    kf = k_q.reshape(Lyr, B, Hkv * D, L)             # head-flat (free)
    vf = v_q.reshape(Lyr, B, Hkv * D, L)

    def kernel(lidx_ref, *refs):
        del lidx_ref
        _kernel(*refs, scale=scale, hb=hb, block_l=BLOCK_L,
                int8_score=INT8_SCORE_DOT)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_hblocks),
            in_specs=[
                pl.BlockSpec((1, hb, G, D), lambda b, i, lidx: (b, i, 0, 0)),
                pl.BlockSpec((1, 1, hb * D, L),
                             lambda b, i, lidx: (lidx[0], b, i, 0)),
                pl.BlockSpec((1, 1, hb, 1, L),
                             lambda b, i, lidx: (lidx[0], b, i, 0, 0)),
                pl.BlockSpec((1, 1, hb * D, L),
                             lambda b, i, lidx: (lidx[0], b, i, 0)),
                pl.BlockSpec((1, 1, hb, 1, L),
                             lambda b, i, lidx: (lidx[0], b, i, 0, 0)),
                pl.BlockSpec((1, 1, L), lambda b, i, lidx: (b, 0, 0)),
                pl.BlockSpec((1, hb, 1, D), lambda b, i, lidx: (b, i, 0, 0)),
                pl.BlockSpec((1, hb, 1, D), lambda b, i, lidx: (b, i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, hb, G, D),
                                   lambda b, i, lidx: (b, i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1),
      qt, kf, k_s, vf, v_s, maskt, knt, vnt)
    return out.reshape(B, 1, H, D)
