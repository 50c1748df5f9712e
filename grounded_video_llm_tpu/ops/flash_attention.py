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
import os
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


_LOG2E = 1.4426950408889634


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, scale,
                causal, block_q, sk, sq_orig, n_blocks, bounded, has_bias):
    """One program = one (batch, q-head): loads K/V once, loops q blocks
    internally. Per-program work is n_blocks large matmuls, so the fixed
    per-program dispatch cost (~µs) amortizes — a (B, H, Sq/128) grid of tiny
    programs measured 3x slower on the same shapes.

    Bounded mode computes the softmax in the log2 domain: the raw dot output
    goes through ONE fused mul-sub into exp2 — exp(s*scale - 40) ==
    exp2(s*scale*log2e - 40*log2e) — replacing the separate scale multiply,
    offset subtract, and exp's internal ln2 conversion. fp32 throughout, so
    the fp32-softmax parity island is untouched (difference vs exp is ~1ulp
    rounding). The saved lse stays in ln units for the backward. Measured:
    the encoder attention is VPU-bound on exactly these per-element ops."""
    k = k_ref[0, 0, :, :]          # [Sk, D]
    v = v_ref[0, 0, :, :]          # [Sk, D]
    bias_row = bias_ref[0, 0, :][None, :] if has_bias else None

    def body(j, _):
        q = q_ref[0, 0, pl.ds(j * block_q, block_q), :]   # [block_q, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if bounded and not has_bias and not causal:
            # pure encoder fast path: raw scores feed exp2 directly
            m = jnp.full((s.shape[0], 1), BOUNDED_OFFSET, jnp.float32)
            p = jnp.exp2(s * (scale * _LOG2E) - BOUNDED_OFFSET * _LOG2E)
        else:
            s = s * scale
            if has_bias:
                # skipped for unmasked callers (the encoder): the add is a
                # full VPU pass over every score tile (~0.5 ms/layer at 72
                # clips)
                s = s + bias_row
            if causal:
                qpos = (j * block_q
                        + jax.lax.broadcasted_iota(jnp.int32,
                                                   (block_q, sk), 0)
                        + (sk - sq_orig))
                kpos = jax.lax.broadcasted_iota(jnp.int32, (block_q, sk), 1)
                s = jnp.where(kpos <= qpos, s, NEG_INF)
            if bounded:
                m = jnp.full((s.shape[0], 1), BOUNDED_OFFSET, jnp.float32)
                p = jnp.exp2(s * _LOG2E - BOUNDED_OFFSET * _LOG2E)
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
        # fully-masked query rows (left-padded prompts): emit exactly 0 with
        # lse=+inf so (a) the residual stream stays finite — a NaN here turns
        # into NaN k/v that contaminate VALID rows from the next layer on,
        # since the additive key bias can't mask NaN — and (b) the backward
        # replays p = exp(s - inf) = 0 for the whole row (same convention as
        # the q-padding path in _flash_bwd).
        if bounded:
            dead = denom[:, :1] <= 0.0
        else:
            dead = (denom[:, :1] <= 0.0) | (m[:, :1] <= NEG_INF * 0.5)
        o = jnp.where(dead, 0.0, o / jnp.where(dead, 1.0, denom))
        o_ref[0, 0, pl.ds(j * block_q, block_q), :] = o.astype(o_ref.dtype)
        # logsumexp per row — the backward's softmax replay key. The bounded
        # offset IS a valid m (softmax offset-invariance), so the formula is
        # identical in both modes.
        # lse lives SUBLANE-major ([.., Sq, 1]): the write offset j*block_q
        # only needs 8-alignment there, letting block_q be any 8-multiple
        # (balanced blocks); a lane-major lse requires 128-aligned offsets
        lse_ref[0, 0, pl.ds(j * block_q, block_q), :] = jnp.where(
            dead, jnp.inf,
            m + jnp.log(jnp.where(dead, 1.0, denom)))
        return 0

    jax.lax.fori_loop(0, n_blocks, body, 0)


# Finite stand-in for -inf in the online-softmax running max: -inf - -inf is
# NaN and would contaminate valid rows whose first k-chunks are fully masked
# (left-padded prompts). exp(s - (-1e30)) still underflows to exactly 0 for
# masked scores.
_M_INIT = -1e30


def _fwd_kernel_causal(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *,
                       scale, block_q, block_k, q_offset, n_blocks,
                       window):
    """Causal forward that SKIPS fully-masked k-chunks. The full-rectangle
    kernel above computes [block_q, Sk] scores and masks half away — at
    prefill (Sq == Sk ≈ 3.5k) that wastes ~2x the attention FLOPs and VPU
    passes. Here each q block online-softmaxes over only its valid k prefix
    (flash-attention's standard inner loop, with the trip count derived from
    the causal structure). K/V are already whole-resident in VMEM, so the
    skip saves pure compute, not DMA.

    q_offset = kpos of q row 0 (Sk - Sq for a plain bottom-aligned call;
    arbitrary for the chunked-rectangle path)."""
    sk_p = k_ref.shape[2]
    offset = q_offset

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
        o_acc, m_fin, l = jax.lax.fori_loop(c_start, n_chunks, kloop,
                                            (o0, m0, l0))
        # l == 0 ⇔ every key of this query row was masked (left-padded pad
        # rows): o_acc/l would be 0/0 = NaN, poisoning the residual stream
        # for ALL rows at the next layer (additive bias can't mask NaN k/v).
        # Emit 0 with lse=+inf so the backward replays p = 0 for the row.
        dead = (l <= 0.0)[:, None]
        l_safe = jnp.where(dead, 1.0, l[:, None])
        o = jnp.where(dead, 0.0, o_acc / l_safe)
        o_ref[0, 0, pl.ds(j * block_q, block_q), :] = o.astype(o_ref.dtype)
        lse_ref[0, 0, pl.ds(j * block_q, block_q), :] = jnp.where(
            dead, jnp.inf, m_fin + jnp.log(l_safe))
        return 0

    jax.lax.fori_loop(0, n_blocks, body, 0)


def _flash_fwd(q, k, v, bias, scale, causal, bounded=False, window=None,
               has_bias=True, q_offset=None):
    """Internally works in [B, H, S, D] layout — Pallas TPU blocks must live in
    the last two dims (sublane x lane). q_offset: global key position of q
    row 0 (defaults to Sk - Sq, i.e. bottom-aligned causal); the chunked
    rectangle path passes explicit offsets."""
    B, Sq, H, D = q.shape
    _, Sk, Hkv, _ = k.shape
    G = H // Hkv
    if q_offset is None:
        q_offset = Sk - Sq

    # VMEM budget: the fp32 score tile (block_q x Sk) and its exp copy are the
    # big consumers; keep 2*block_q*Sk*4B under ~8MB so q/k/v/o fit alongside
    # (scoped vmem limit is 16MB). The causal kernel's score tile is only
    # [block_q, block_k], so it keeps the full BLOCK_Q at any Sk.
    if causal:
        block_q = min(BLOCK_Q, -(-Sq // 8) * 8)
        # long prefills (grounded train step: Sq = 4096+3420 = 7516): the
        # double-buffered q/k/v/bias/out blocks alone approach the 16MB scoped
        # vmem limit — shrink the chunk tiles to stay under (measured: 256/512
        # blocks overflow by 0.15MB at Sq_p 7680)
        if Sq > 6144:
            block_q = 128
        if os.environ.get("GVLLM_FLASH_BQ"):  # debug: compile-crash bisects
            block_q = int(os.environ["GVLLM_FLASH_BQ"])
    else:
        budget_rows = max(64, (8 * 1024 * 1024) // (Sk * 8))
        block_q = min(BLOCK_Q, budget_rows // 8 * 8, -(-Sq // 8) * 8)
        # balance the q blocks: the encoder's Sq = 2049 under bq=256 pads to
        # 2304 — a 9th block that is 99.6% garbage rows (+12% of every MXU
        # and VPU pass). Keep the block count, shrink the block to the
        # smallest 8-multiple covering Sq evenly (2049 → 9x232, 1.9% waste).
        n_b = -(-Sq // block_q)
        block_q = -(-(-(-Sq // n_b)) // 8) * 8
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
        block_k = 512 if Sq <= 6144 else 256
        if os.environ.get("GVLLM_FLASH_BK"):  # debug: compile-crash bisects
            block_k = int(os.environ["GVLLM_FLASH_BK"])
        Sk_p = -(-Sk // block_k) * block_k
        kpad = Sk_p - Sk
        if kpad:
            kt = jnp.pad(kt, ((0, 0), (0, 0), (0, kpad), (0, 0)))
            vt = jnp.pad(vt, ((0, 0), (0, 0), (0, kpad), (0, 0)))
            bias = jnp.pad(bias, ((0, 0), (0, kpad)), constant_values=NEG_INF)
        kernel = functools.partial(_fwd_kernel_causal, scale=scale,
                                   block_q=block_q, block_k=block_k,
                                   q_offset=q_offset, n_blocks=n_blocks,
                                   window=window)
        kv_len = Sk_p
    else:
        # NOTE on the encoder's ragged Sk = 2049: zero-padding K/V to the
        # lane boundary was tried and REVERTED — a zero key scores
        # exp(0 - 40), which is NOT negligible when real QK-normed scores go
        # below zero (measured 0.43 abs output error), and masking the pad
        # tail costs the very bias pass the encoder path exists to skip.
        # In-situ the raggedness measured ~0 anyway (trunk A/B 3346 vs 3348
        # ms); the isolated S2048-vs-2049 delta was the q-side block
        # imbalance, handled by the balanced block_q above.
        kv_len = Sk
        kernel = functools.partial(_fwd_kernel, scale=scale, causal=False,
                                   block_q=block_q, sk=kv_len, sq_orig=Sq,
                                   n_blocks=n_blocks, bounded=bounded,
                                   has_bias=has_bias)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, Sq_p, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, kv_len, D), lambda b, h: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, kv_len, D), lambda b, h: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, kv_len), lambda b, h: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, Sq_p, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Sq_p, 1), lambda b, h: (b, h, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Sq_p, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Sq_p, 1), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(qt, kt, vt, bias[:, None, :])
    out = out.transpose(0, 2, 1, 3)
    lse = lse[:, :, :, 0]
    if pad:
        out = out[:, :Sq]
        lse = lse[:, :, :Sq]
    return out, lse


def _bwd_dq_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                   bias_ref, dq_ref, *, scale, causal, window, block_q,
                   block_k, q_offset, n_qblocks):
    """dq for one (batch, q-head): q-block outer loop, k-chunk inner loop
    with the causal/window extent skip. p replays from the saved per-row
    logsumexp — no max/denom recompute, no cross-block state."""
    sk_p = k_ref.shape[2]
    offset = q_offset

    def body(j, _):
        q_j = q_ref[0, 0, pl.ds(j * block_q, block_q), :]
        do_j = do_ref[0, 0, pl.ds(j * block_q, block_q), :]
        lse_j = lse_ref[0, 0, 0, pl.ds(j * block_q, block_q)][:, None]
        delta_j = delta_ref[0, 0, 0, pl.ds(j * block_q, block_q)][:, None]
        if causal:
            k_extent = jnp.minimum((j + 1) * block_q + offset, sk_p)
            n_chunks = pl.cdiv(k_extent, block_k)
            if window is None:
                c_start = 0
            else:
                low = jnp.maximum(j * block_q + offset - window + 1, 0)
                c_start = low // block_k
        else:
            n_chunks = sk_p // block_k
            c_start = 0

        def kloop(c, dq_acc):
            k_c = k_ref[0, 0, pl.ds(c * block_k, block_k), :]
            v_c = v_ref[0, 0, pl.ds(c * block_k, block_k), :]
            b_c = bias_ref[0, 0, pl.ds(c * block_k, block_k)][None, :]
            s = jax.lax.dot_general(
                q_j, k_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale + b_c
            if causal:
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
            p = jnp.exp(s - lse_j)
            dp = jax.lax.dot_general(
                do_j, v_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - delta_j) * scale
            return dq_acc + jax.lax.dot_general(
                ds.astype(k_c.dtype), k_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        dq_acc = jax.lax.fori_loop(
            c_start, n_chunks, kloop,
            jnp.zeros((block_q, q_j.shape[1]), jnp.float32))
        dq_ref[0, 0, pl.ds(j * block_q, block_q), :] = dq_acc.astype(
            dq_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_qblocks, body, 0)


def _bwd_dkv_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                    bias_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, scale,
                    causal, window, block_q, block_k, q_offset,
                    n_qblocks, group):
    """dk/dv for one (batch, k-block, q-head): accumulation is BLOCK-LOCAL
    ([block_k, D] scratch) instead of the old whole-[Sk, D] scratch that
    overflowed scoped vmem past ~6k tokens. Grid order (B, kb, H) revisits
    the (kb, kv-head) output block consecutively across the GQA group."""
    h = pl.program_id(2)
    kb = pl.program_id(1)

    @pl.when(h % group == 0)
    def _():
        dk_acc[:, :] = jnp.zeros_like(dk_acc)
        dv_acc[:, :] = jnp.zeros_like(dv_acc)

    k_c = k_ref[0, 0, :, :]                     # [block_k, D]
    v_c = v_ref[0, 0, :, :]
    b_c = bias_ref[0, 0, :][None, :]
    offset = q_offset

    if causal:
        # first q block whose highest row can see this k block; with a
        # window, the last q block still inside it
        jq_start = jnp.maximum(kb * block_k - offset, 0) // block_q
        if window is None:
            jq_end = n_qblocks
        else:
            hi = (kb + 1) * block_k - 1 + window - offset
            jq_end = jnp.minimum(pl.cdiv(hi + 1, block_q), n_qblocks)
    else:
        jq_start, jq_end = 0, n_qblocks

    def body(j, _):
        q_j = q_ref[0, 0, pl.ds(j * block_q, block_q), :]
        do_j = do_ref[0, 0, pl.ds(j * block_q, block_q), :]
        lse_j = lse_ref[0, 0, 0, pl.ds(j * block_q, block_q)][:, None]
        delta_j = delta_ref[0, 0, 0, pl.ds(j * block_q, block_q)][:, None]
        s = jax.lax.dot_general(
            q_j, k_c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + b_c
        if causal:
            qpos = (j * block_q + offset
                    + jax.lax.broadcasted_iota(jnp.int32,
                                               (block_q, block_k), 0))
            kpos = (kb * block_k
                    + jax.lax.broadcasted_iota(jnp.int32,
                                               (block_q, block_k), 1))
            keep = kpos <= qpos
            if window is not None:
                keep = keep & (qpos - kpos < window)
            s = jnp.where(keep, s, NEG_INF)
        p = jnp.exp(s - lse_j)                   # [block_q, block_k]
        dv_acc[:, :] += jax.lax.dot_general(
            p.astype(do_j.dtype), do_j, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do_j, v_c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta_j) * scale
        dk_acc[:, :] += jax.lax.dot_general(
            ds.astype(q_j.dtype), q_j, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(jq_start, jq_end, body, 0)

    @pl.when(h % group == group - 1)
    def _():
        dk_ref[0, 0, :, :] = dk_acc[:, :].astype(dk_ref.dtype)
        dv_ref[0, 0, :, :] = dv_acc[:, :].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, bias, o, lse, do, scale, causal, window=None,
               q_offset=None):
    """Two-kernel flash backward (the standard schedule): a dq kernel
    (q outer, k chunks inner) and a dkv kernel (k-block outer, q chunks
    inner, block-local fp32 accumulators). Softmax replays from the saved
    logsumexp; delta = rowsum(do*o) precomputes in XLA. Replaces a
    single-kernel design whose [Sk, D] fp32 dk/dv scratch overflowed the
    16MB scoped vmem at the grounded train length (Sq = 4096+3420)."""
    B, Sq, H, D = q.shape
    _, Sk, Hkv, _ = k.shape
    G = H // Hkv
    if q_offset is None:
        q_offset = Sk - Sq

    # 128/256 fits scoped vmem at the grounded shapes (the r3 two-kernel
    # redesign); env overrides for block-size probes (scripts/
    # microbench_flash_bwd_blocks.py measured the alternatives — see note
    # there before changing the defaults)
    block_q = int(os.environ.get("GVLLM_FLASH_BWD_BQ", "0")) or \
        min(128, -(-Sq // 8) * 8)
    block_k = int(os.environ.get("GVLLM_FLASH_BWD_BK", "0")) or 256
    Sq_p = -(-Sq // block_q) * block_q
    Sk_p = -(-Sk // block_k) * block_k

    # delta [B, H, Sq] in fp32 — one fused elementwise+reduce in XLA
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1).transpose(0, 2, 1)

    qpad, kpad = Sq_p - Sq, Sk_p - Sk
    if qpad:
        q = jnp.pad(q, ((0, 0), (0, qpad), (0, 0), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, qpad), (0, 0), (0, 0)))
        # +inf lse ⇒ replayed p == 0 for padded rows: they contribute
        # nothing to dk/dv and their dq is cleanly zero
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, qpad)),
                      constant_values=jnp.inf)
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, qpad)))
    if kpad:
        k = jnp.pad(k, ((0, 0), (0, kpad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, kpad), (0, 0), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, kpad)), constant_values=NEG_INF)

    qt = q.transpose(0, 2, 1, 3)    # [B, H, Sq_p, D]
    kt = k.transpose(0, 2, 1, 3)    # [B, Hkv, Sk_p, D]
    vt = v.transpose(0, 2, 1, 3)
    dot = do.transpose(0, 2, 1, 3)
    bias3 = bias[:, None, :]
    lse4 = lse[:, :, None, :]       # [B, H, 1, Sq_p] — TPU block alignment
    delta4 = delta[:, :, None, :]
    n_qblocks = Sq_p // block_q
    n_kblocks = Sk_p // block_k
    interp = jax.default_backend() != "tpu"

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, causal=causal,
                          window=window, block_q=block_q, block_k=block_k,
                          q_offset=q_offset, n_qblocks=n_qblocks),
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, Sq_p, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Sq_p, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, Sq_p), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, Sq_p), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Sk_p, D), lambda b, h: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, Sk_p, D), lambda b, h: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, Sk_p), lambda b, h: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, Sq_p, D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq_p, D), q.dtype),
        interpret=interp,
    )(qt, dot, lse4, delta4, kt, vt, bias3)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, causal=causal,
                          window=window, block_q=block_q, block_k=block_k,
                          q_offset=q_offset, n_qblocks=n_qblocks,
                          group=G),
        grid=(B, n_kblocks, H),
        in_specs=[
            pl.BlockSpec((1, 1, Sq_p, D), lambda b, kb, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Sq_p, D), lambda b, kb, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, Sq_p),
                         lambda b, kb, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, Sq_p),
                         lambda b, kb, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, kb, h: (b, h // G, kb, 0)),
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, kb, h: (b, h // G, kb, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, kb, h: (b, 0, kb)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, kb, h: (b, h // G, kb, 0)),
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, kb, h: (b, h // G, kb, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, Sk_p, D), k.dtype),
            jax.ShapeDtypeStruct((B, Hkv, Sk_p, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        interpret=interp,
    )(qt, dot, lse4, delta4, kt, vt, bias3)

    dq = dq.transpose(0, 2, 1, 3)
    dk = dk.transpose(0, 2, 1, 3)
    dv = dv.transpose(0, 2, 1, 3)
    if qpad:
        dq = dq[:, :Sq]
    if kpad:
        dk = dk[:, :Sk]
        dv = dv[:, :Sk]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Chunked-rectangle path for long causal sequences.
#
# The 2026-08-19 axon compile-helper regression rejects flash programs past
# S ≈ 6912 (COMPILE_HELPER_REGRESSION_r04.md) — the grounded train step's
# spliced length is 7516. Probed: the crash needs BOTH dims large (square
# 7515 fails; 3758×7515, 1024×7515 and 7515×3758 rectangles all compile), so
# by default only the q axis chunks (each q-chunk still streams the full
# K/V: no merge cost) and k chunks only past a higher threshold. Independent
# of the service bug, the rectangle decomposition also bounds per-program
# VMEM pressure for arbitrary context growth: each (q-chunk, k-chunk)
# rectangle runs the unmodified kernels with an explicit global q_offset;
# partial outputs merge EXACTLY via the saved per-row logsumexp (softmax is
# associative over key partitions). The backward needs no merge at all:
# p replays from the GLOBAL lse, so every rectangle's (dq, dk, dv)
# contribution is simply additive.
# ---------------------------------------------------------------------------

def _chunk_limits() -> tuple:
    lq = int(os.environ.get("GVLLM_FLASH_CHUNK", "6912"))
    lk = int(os.environ.get("GVLLM_FLASH_CHUNK_K", str(2 * lq)))
    return lq, lk


def _chunk_bounds(n: int, limit: int):
    """[0, n) as ceil(n/limit) near-equal chunks with 8-aligned starts."""
    nchunks = -(-n // limit)
    size = -(-(-(-n // nchunks)) // 8) * 8
    return [(s, min(s + size, n)) for s in range(0, n, size)]


def _rect_skips(q0, q1, k0, k1, offg, window):
    """True if the (q-chunk, k-chunk) rectangle holds no unmasked score:
    entirely above the causal diagonal, or entirely outside the window."""
    if k0 > offg + q1 - 1:
        return True
    return window is not None and offg + q0 - (k1 - 1) >= window


def _merge_partials(acc, o_c, lse_c):
    """Online merge of normalized flash partials over a key partition.

    Each partial is (o_c = softmax(s_c)·V_c, lse_c = logsumexp(s_c)); the
    exact global result weights each by exp(lse_c − m). Dead rows (no valid
    key in the chunk) carry the kernels' o=0 / lse=+inf convention and merge
    with weight 0; rows dead in EVERY chunk stay (0, +inf)."""
    if acc is None:
        return o_c.astype(jnp.float32), lse_c
    o_p, lse_p = acc
    lp = jnp.where(jnp.isposinf(lse_p), _M_INIT, lse_p)   # [B, H, Sq]
    lc = jnp.where(jnp.isposinf(lse_c), _M_INIT, lse_c)
    m = jnp.maximum(lp, lc)
    wp = jnp.where(lp <= _M_INIT, 0.0, jnp.exp(lp - m))
    wc = jnp.where(lc <= _M_INIT, 0.0, jnp.exp(lc - m))
    tot = wp + wc
    dead = tot <= 0.0
    safe = jnp.where(dead, 1.0, tot)
    lse = jnp.where(dead, jnp.inf, m + jnp.log(safe))
    # o is [B, Sq, H, D]; weights live per (B, H, Sq) row
    wq = (wp / safe).transpose(0, 2, 1)[..., None]
    wn = (wc / safe).transpose(0, 2, 1)[..., None]
    return o_p * wq + o_c.astype(jnp.float32) * wn, lse


def _flash_fwd_chunked(q, k, v, bias, scale, window, limit_q, limit_k):
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    offg = Sk - Sq
    outs, lses = [], []
    for q0, q1 in _chunk_bounds(Sq, limit_q):
        parts = [
            _flash_fwd(q[:, q0:q1], k[:, k0:k1], v[:, k0:k1], bias[:, k0:k1],
                       scale, causal=True, window=window,
                       q_offset=offg + q0 - k0)
            for k0, k1 in _chunk_bounds(Sk, limit_k)
            if not _rect_skips(q0, q1, k0, k1, offg, window)]
        if not parts:       # Sq > Sk top rows: every key above the diagonal
            outs.append(jnp.zeros_like(q[:, q0:q1]))
            lses.append(jnp.full((B, H, q1 - q0), jnp.inf, jnp.float32))
        elif len(parts) == 1:   # q-only chunking: no merge, no fp32 detour
            outs.append(parts[0][0])
            lses.append(parts[0][1])
        else:
            acc = None
            for o_c, lse_c in parts:
                acc = _merge_partials(acc, o_c, lse_c)
            outs.append(acc[0].astype(q.dtype))
            lses.append(acc[1])
    return jnp.concatenate(outs, axis=1), jnp.concatenate(lses, axis=2)


def _flash_bwd_chunked(q, k, v, bias, o, lse, do, scale, window, limit_q,
                       limit_k):
    Sq, Sk = q.shape[1], k.shape[1]
    offg = Sk - Sq
    kb = _chunk_bounds(Sk, limit_k)
    dq_parts, dk_parts, dv_parts = [], [None] * len(kb), [None] * len(kb)
    for q0, q1 in _chunk_bounds(Sq, limit_q):
        dq_c = None
        for j, (k0, k1) in enumerate(kb):
            if _rect_skips(q0, q1, k0, k1, offg, window):
                continue
            dq_p, dk_p, dv_p = _flash_bwd(
                q[:, q0:q1], k[:, k0:k1], v[:, k0:k1], bias[:, k0:k1],
                o[:, q0:q1], lse[:, :, q0:q1], do[:, q0:q1], scale,
                causal=True, window=window, q_offset=offg + q0 - k0)
            dq_c = dq_p if dq_c is None else dq_c + dq_p
            dk_parts[j] = dk_p if dk_parts[j] is None else dk_parts[j] + dk_p
            dv_parts[j] = dv_p if dv_parts[j] is None else dv_parts[j] + dv_p
        dq_parts.append(jnp.zeros_like(q[:, q0:q1]) if dq_c is None else dq_c)
    dk = jnp.concatenate(
        [jnp.zeros_like(k[:, k0:k1]) if p is None else p
         for p, (k0, k1) in zip(dk_parts, kb)], axis=1)
    dv = jnp.concatenate(
        [jnp.zeros_like(v[:, k0:k1]) if p is None else p
         for p, (k0, k1) in zip(dv_parts, kb)], axis=1)
    return jnp.concatenate(dq_parts, axis=1), dk, dv


def _needs_chunking(causal, B, Sq, Sk) -> bool:
    """The 2026-08-20 B=2 probe (scripts/probe_train_b2.py) sharpened the
    crash law: the helper rejects a kernel iff BOTH B*Sq >~ 7296 AND
    Sk >~ 7296 — serving prefill (B=6, S=3548: B*Sq=21k but Sk small)
    compiles, B=1 rectangles 7515x3758 / 3758x7515 compile, and B=2
    3758x7515 (B*Sq=7516, Sk=7515) fails exactly like the B=1 square.
    So chunking triggers on the BOTH-large condition (plus the independent
    huge-Sk VMEM bound), and the q limit divides by B at the call sites."""
    lq, lk = _chunk_limits()
    return causal and ((B * Sq > lq and Sk > lq) or Sk > lk)


def _limit_q_for(B: int) -> int:
    lq, _ = _chunk_limits()
    return max(8, lq // max(B, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_mha_core(q, k, v, bias, causal, scale, bounded, window, has_bias):
    if _needs_chunking(causal, q.shape[0], q.shape[1], k.shape[1]):
        out, _ = _flash_fwd_chunked(q, k, v, bias, scale, window,
                                    _limit_q_for(q.shape[0]),
                                    _chunk_limits()[1])
    else:
        out, _ = _flash_fwd(q, k, v, bias, scale, causal, bounded, window,
                            has_bias)
    return out


def _core_fwd(q, k, v, bias, causal, scale, bounded, window, has_bias):
    if _needs_chunking(causal, q.shape[0], q.shape[1], k.shape[1]):
        out, lse = _flash_fwd_chunked(q, k, v, bias, scale, window,
                                      _limit_q_for(q.shape[0]),
                                      _chunk_limits()[1])
    else:
        out, lse = _flash_fwd(q, k, v, bias, scale, causal, bounded, window,
                              has_bias)
    return out, (q, k, v, bias, out, lse)


def _core_bwd(causal, scale, bounded, window, has_bias, residuals, g):
    # softmax replays from the saved logsumexp — identical in bounded and
    # full modes (softmax offset-invariance)
    q, k, v, bias, o, lse = residuals
    if _needs_chunking(causal, q.shape[0], q.shape[1], k.shape[1]):
        dq, dk, dv = _flash_bwd_chunked(q, k, v, bias, o, lse, g, scale,
                                        window, _limit_q_for(q.shape[0]),
                                        _chunk_limits()[1])
    else:
        dq, dk, dv = _flash_bwd(q, k, v, bias, o, lse, g, scale, causal,
                                window)
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
                           sliding_window, mask is not None)
