"""Pallas TPU flash attention (forward) — the flash-attn CUDA replacement
(reference internvideo2.py:473-536 non-causal packed; modeling_phi3.py:613-921
causal; SURVEY §2.9 row flash-attn).

Design: grid (B, H, Sq/block_q); each program streams its q block against the
FULL K/V of its (batch, kv-head) — at this framework's sequence lengths
(encoder 2049, LLM prefill ≤ ~5.5k) K/V fit comfortably in VMEM
(5.5k × 128 × 2B ≈ 1.4MB each), so no online-softmax k-loop is needed: the
[block_q, S] score tile lives only in VMEM fp32 and the full [S, S] matrix
never touches HBM — the entire win over the XLA path. GQA maps q head h → kv
head h // group via the k/v index maps; no repeated K/V materialization.
Padding masks enter as an additive fp32 bias row per batch.

Backward: custom_vjp whose backward recomputes attention with the XLA path
(einsum gradients). Training already wraps decoder layers in jax.checkpoint,
so the recompute matches the standard remat schedule; a Pallas backward
kernel is a further optimization, not a correctness need.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


# Measured on the encoder shapes (S=2049, Dh=88, v5e): 256 beats 512 beats
# 1024 (4.81 / 5.38 / 6.13 ms per 12-clip layer) — smaller fp32 score tiles
# pipeline better against the MXU.
BLOCK_Q = 256

# bounded_softmax: exp offset replacing the per-row max. Mathematically
# softmax is invariant to ANY per-row offset; the max subtraction exists only
# to keep exp in fp32 range. When scores are known-bounded (the encoder's
# QK-RMSNormed attention: normalized q,k keep |s| well inside ±40), a fixed
# offset gives the identical result while skipping a full [block_q, Sk] VPU
# reduce pass — measured 20% off encoder attention time (5.38→4.03 ms/layer
# at block 512, 4.81→3.83 at 256). exp(s-40) overflows fp32 only at s>128.4,
# unreachable under qk-norm; masked slots (s=-inf bias) still exp to 0.
BOUNDED_OFFSET = 40.0


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, causal,
                block_q, sk, sq_orig, n_blocks, bounded):
    """One program = one (batch, q-head): loads K/V once, loops q blocks
    internally. Per-program work is n_blocks large matmuls, so the fixed
    per-program dispatch cost (~µs) amortizes — a (B, H, Sq/128) grid of tiny
    programs measured 3x slower on the same shapes."""
    k = k_ref[0, 0, :, :]          # [Sk, D]
    v = v_ref[0, 0, :, :]          # [Sk, D]
    bias_row = bias_ref[0, 0, :][None, :]

    def body(j, _):
        q = q_ref[0, 0, pl.ds(j * block_q, block_q), :]   # [block_q, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [block_q, Sk]
        s = s + bias_row
        if causal:
            qpos = (j * block_q
                    + jax.lax.broadcasted_iota(jnp.int32, (block_q, sk), 0)
                    + (sk - sq_orig))
            kpos = jax.lax.broadcasted_iota(jnp.int32, (block_q, sk), 1)
            s = jnp.where(kpos <= qpos, s, NEG_INF)
        if bounded:
            p = jnp.exp(s - BOUNDED_OFFSET)
        else:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
        # normalize the [block_q, D] OUTPUT rather than the [block_q, Sk]
        # probability tile — one fewer full-tile VPU pass (flash-attn's own
        # deferred-rescale trick; diff vs pre-normalizing is bf16 rounding)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o = o / denom
        o_ref[0, 0, pl.ds(j * block_q, block_q), :] = o.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_blocks, body, 0)


# Finite stand-in for -inf in the online-softmax running max: -inf - -inf is
# NaN and would contaminate valid rows whose first k-chunks are fully masked
# (left-padded prompts). exp(s - (-1e30)) still underflows to exactly 0 for
# masked scores.
_M_INIT = -1e30


def _fwd_kernel_causal(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale,
                       block_q, block_k, sk_orig, sq_orig, n_blocks,
                       window):
    """Causal forward that SKIPS fully-masked k-chunks. The full-rectangle
    kernel above computes [block_q, Sk] scores and masks half away — at
    prefill (Sq == Sk ≈ 3.5k) that wastes ~2x the attention FLOPs and VPU
    passes. Here each q block online-softmaxes over only its valid k prefix
    (flash-attention's standard inner loop, with the trip count derived from
    the causal structure). K/V are already whole-resident in VMEM, so the
    skip saves pure compute, not DMA."""
    sk_p = k_ref.shape[2]
    offset = sk_orig - sq_orig     # kpos of q row 0

    def body(j, _):
        q = q_ref[0, 0, pl.ds(j * block_q, block_q), :]   # [block_q, D]
        # highest key this q block may attend + 1, clamped to the padded range
        k_extent = jnp.minimum((j + 1) * block_q + offset, sk_p)
        n_chunks = pl.cdiv(k_extent, block_k)
        # sliding window: the block's lowest query needs no keys below
        # qpos_min - window + 1 — skip whole chunks under that
        if window is None:
            c_start = 0
        else:
            low = jnp.maximum(j * block_q + offset - window + 1, 0)
            c_start = low // block_k

        def kloop(c, carry):
            o_acc, m, l = carry
            # slice the REFS — Mosaic lowers pl.ds ref reads; dynamic_slice
            # on loaded values is unimplemented in the TPU lowering
            k_c = k_ref[0, 0, pl.ds(c * block_k, block_k), :]
            v_c = v_ref[0, 0, pl.ds(c * block_k, block_k), :]
            s = jax.lax.dot_general(
                q, k_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # [bq, bk]
            b_c = bias_ref[0, 0, pl.ds(c * block_k, block_k)]
            s = s + b_c[None, :]
            qpos = (j * block_q + offset
                    + jax.lax.broadcasted_iota(jnp.int32,
                                               (block_q, block_k), 0))
            kpos = (c * block_k
                    + jax.lax.broadcasted_iota(jnp.int32,
                                               (block_q, block_k), 1))
            keep = kpos <= qpos
            if window is not None:
                keep = keep & (qpos - kpos < window)
            s = jnp.where(keep, s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            o_new = o_acc * alpha + jax.lax.dot_general(
                p.astype(v_c.dtype), v_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            l_new = l * alpha[:, 0] + jnp.sum(p, axis=-1)
            return o_new, m_new, l_new

        o0 = jnp.zeros((block_q, q.shape[1]), jnp.float32)
        m0 = jnp.full((block_q, 1), _M_INIT, jnp.float32)
        l0 = jnp.zeros((block_q,), jnp.float32)
        o_acc, _, l = jax.lax.fori_loop(c_start, n_chunks, kloop,
                                        (o0, m0, l0))
        o = o_acc / l[:, None]
        o_ref[0, 0, pl.ds(j * block_q, block_q), :] = o.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_blocks, body, 0)


def _flash_fwd(q, k, v, bias, scale, causal, bounded=False, window=None):
    """Internally works in [B, H, S, D] layout — Pallas TPU blocks must live in
    the last two dims (sublane x lane)."""
    B, Sq, H, D = q.shape
    _, Sk, Hkv, _ = k.shape
    G = H // Hkv

    # VMEM budget: the fp32 score tile (block_q x Sk) and its exp copy are the
    # big consumers; keep 2*block_q*Sk*4B under ~8MB so q/k/v/o fit alongside
    # (scoped vmem limit is 16MB). The causal kernel's score tile is only
    # [block_q, block_k], so it keeps the full BLOCK_Q at any Sk.
    if causal:
        block_q = min(BLOCK_Q, -(-Sq // 8) * 8)
    else:
        budget_rows = max(64, (8 * 1024 * 1024) // (Sk * 8))
        block_q = min(BLOCK_Q, budget_rows // 8 * 8, -(-Sq // 8) * 8)
    padded = -(-Sq // block_q) * block_q
    pad = padded - Sq
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    Sq_p = q.shape[1]
    n_blocks = Sq_p // block_q

    qt = q.transpose(0, 2, 1, 3)   # [B, H, Sq, D]
    kt = k.transpose(0, 2, 1, 3)   # [B, Hkv, Sk, D]
    vt = v.transpose(0, 2, 1, 3)

    grid = (B, H)
    if causal:
        # online-softmax kernel skipping fully-masked k-chunks (~2x fewer
        # attention FLOPs at prefill where Sq == Sk). K/V/bias pad to a
        # block_k multiple; padded keys carry a NEG_INF bias (and fall beyond
        # every valid row's causal horizon anyway).
        block_k = 512
        Sk_p = -(-Sk // block_k) * block_k
        kpad = Sk_p - Sk
        if kpad:
            kt = jnp.pad(kt, ((0, 0), (0, 0), (0, kpad), (0, 0)))
            vt = jnp.pad(vt, ((0, 0), (0, 0), (0, kpad), (0, 0)))
            bias = jnp.pad(bias, ((0, 0), (0, kpad)), constant_values=NEG_INF)
        kernel = functools.partial(_fwd_kernel_causal, scale=scale,
                                   block_q=block_q, block_k=block_k,
                                   sk_orig=Sk, sq_orig=Sq, n_blocks=n_blocks,
                                   window=window)
        kv_len = Sk_p
    else:
        kernel = functools.partial(_fwd_kernel, scale=scale, causal=False,
                                   block_q=block_q, sk=Sk, sq_orig=Sq,
                                   n_blocks=n_blocks, bounded=bounded)
        kv_len = Sk
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, Sq_p, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, kv_len, D), lambda b, h: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, kv_len, D), lambda b, h: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, kv_len), lambda b, h: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, Sq_p, D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq_p, D), q.dtype),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(qt, kt, vt, bias[:, None, :])
    out = out.transpose(0, 2, 1, 3)
    if pad:
        out = out[:, :Sq]
    return out


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                scale, causal, block_q, sk, sq_orig, n_blocks, group,
                window=None):
    """Backward program for one (batch, q-head, q-block): recompute p
    (flash-style, no saved probabilities), write this block's dq, accumulate
    dk/dv in fp32 VMEM scratch across q blocks AND across the GQA group — the
    sequential grid revisits the same dk/dv output block for group*n_blocks
    consecutive steps."""
    h = pl.program_id(1)
    j = pl.program_id(2)
    k = k_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]
    bias_row = bias_ref[0, 0, :][None, :]

    @pl.when((h % group == 0) & (j == 0))
    def _():
        dk_acc[:, :] = jnp.zeros_like(dk_acc)
        dv_acc[:, :] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0, :, :]           # [block_q, D]
    do = do_ref[0, 0, :, :]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = s + bias_row
    if causal:
        qpos = (j * block_q
                + jax.lax.broadcasted_iota(jnp.int32, (block_q, sk), 0)
                + (sk - sq_orig))
        kpos = jax.lax.broadcasted_iota(jnp.int32, (block_q, sk), 1)
        keep = kpos <= qpos
        if window is not None:
            keep = keep & (qpos - kpos < window)
        s = jnp.where(keep, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)          # [bq, Sk] fp32

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # [bq, Sk]
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)     # [bq, 1]
    ds = p * (dp - delta)                               # [bq, Sk] fp32

    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0, :, :] = dq.astype(dq_ref.dtype)

    dk_acc[:, :] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # [Sk, D]
    dv_acc[:, :] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Sk, D]

    @pl.when((h % group == group - 1) & (j == n_blocks - 1))
    def _():
        dk_ref[0, 0, :, :] = dk_acc[:, :].astype(dk_ref.dtype)
        dv_ref[0, 0, :, :] = dv_acc[:, :].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, bias, do, scale, causal, window=None):
    B, Sq, H, D = q.shape
    _, Sk, Hkv, _ = k.shape
    G = H // Hkv

    # VMEM: 4 fp32 [block_q, Sk] temporaries + 2 fp32 [Sk, D] accumulators +
    # pipelined k/v/dk/dv [Sk, D] refs must fit 16MB
    budget_rows = max(32, (4 * 1024 * 1024) // (Sk * 16))
    block_q = min(BLOCK_Q, budget_rows // 8 * 8, -(-Sq // 8) * 8)
    padded = -(-Sq // block_q) * block_q
    pad = padded - Sq
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, pad), (0, 0), (0, 0)))
    Sq_p = q.shape[1]
    n_blocks = Sq_p // block_q

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    dot = do.transpose(0, 2, 1, 3)

    kernel = functools.partial(_bwd_kernel, scale=scale, causal=causal,
                               block_q=block_q, sk=Sk, sq_orig=Sq,
                               n_blocks=n_blocks, group=G, window=window)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B, H, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, Sk, D), lambda b, h, j: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, Sk, D), lambda b, h, j: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, Sk), lambda b, h, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, j: (b, h, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, Sk, D), lambda b, h, j: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, Sk, D), lambda b, h, j: (b, h // G, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Sq_p, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hkv, Sk, D), k.dtype),
            jax.ShapeDtypeStruct((B, Hkv, Sk, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((Sk, D), jnp.float32),
            pltpu.VMEM((Sk, D), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(qt, kt, vt, bias[:, None, :], dot)
    dq = dq.transpose(0, 2, 1, 3)
    if pad:
        dq = dq[:, :Sq]
    return dq, dk.transpose(0, 2, 1, 3), dv.transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_mha_core(q, k, v, bias, causal, scale, bounded, window):
    return _flash_fwd(q, k, v, bias, scale, causal, bounded, window)


def _core_fwd(q, k, v, bias, causal, scale, bounded, window):
    return (_flash_fwd(q, k, v, bias, scale, causal, bounded, window),
            (q, k, v, bias))


def _core_bwd(causal, scale, bounded, window, residuals, g):
    # backward always recomputes with the true row max — softmax is
    # offset-invariant, so the gradients match the bounded forward exactly
    q, k, v, bias = residuals
    dq, dk, dv = _flash_bwd(q, k, v, bias, g, scale, causal, window)
    return dq, dk, dv, jnp.zeros_like(bias)


_flash_mha_core.defvjp(_core_fwd, _core_bwd)


def flash_mha(q, k, v, *, causal: bool = False,
              mask: Optional[jnp.ndarray] = None,
              scale: Optional[float] = None,
              bounded_softmax: bool = False,
              sliding_window: Optional[int] = None):
    """Drop-in for attention.xla_mha. mask: [B, Sk] keep-mask (bias-style
    4D masks fall back to XLA). bounded_softmax: skip the row-max pass
    (see BOUNDED_OFFSET — only for known-bounded scores, e.g. qk-normed).
    sliding_window: causal-only; keep keys with qpos - kpos < window."""
    if mask is not None and mask.ndim != 2:
        from .attention import xla_mha

        return xla_mha(q, k, v, causal=causal, mask=mask, scale=scale,
                       sliding_window=sliding_window)
    if sliding_window is not None:
        assert causal, "sliding_window requires causal attention"
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, _, _, _ = q.shape
    Sk = k.shape[1]
    if mask is None:
        bias = jnp.zeros((B, Sk), jnp.float32)
    else:
        bias = jnp.where(mask.astype(bool), 0.0, NEG_INF).astype(jnp.float32)
    return _flash_mha_core(q, k, v, bias, causal, scale, bounded_softmax,
                           sliding_window)
