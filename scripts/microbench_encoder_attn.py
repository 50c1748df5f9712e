"""Microbenchmark: InternVideo2 encoder attention on the real chip.

Locates the flash-kernel gap (measured r1: ~40 TF/s attention vs ~140 TF/s
matmuls; encoder ≈65% of e2e serving). Variants isolate the suspects:

  flash        — ops/flash_attention.py as shipped
  flash_nomax  — skip the max pass (QK-RMSNormed scores are bounded; a fixed
                 safe max trades one full-tile VPU reduce for nothing)
  flash_noexp  — exp replaced by identity (UPPER BOUND: what removing all
                 transcendental cost would buy; wrong math, right traffic)
  xla          — plain einsum attention (XLA fusion baseline)
  matmul       — score+PV-shaped matmuls only (the MXU roofline at head_dim 88)
  exp_only     — jnp.exp over score-tile-sized fp32 (VPU transcendental rate)
  flash_pipe   — software-pipelined: block j+1's QK dot issued before block
                 j's softmax/PV. MEASURED SLOWER (58.6 vs 74.5 TF/s, r3):
                 the explicit [block_q, S] fp32 carry defeats Mosaic's own
                 scheduling. Kept as the negative-result record.

r3 finding: S=2048 runs 12-15%% faster than the real S=2049 (84.4 vs 73.5
TF/s nomax) — raggedness (9x232 balanced q-blocks + 1 masked key lane-tile)
is the remaining gap, not softmax (noexp == nomax == exp2).

Timing per CLAUDE.md: one jit per variant, R chained iterations INSIDE the
jit (per-call dispatch ~25-30ms on the axon tunnel), output fetched to host.

Usage: python scripts/microbench_encoder_attn.py [b_clips]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

B = int(sys.argv[1]) if len(sys.argv) > 1 else 12   # clips (one video = 12)
S, H, DH = 2049, 16, 88
R = 40  # chained in-jit iterations (dispatch ~25-30ms amortizes to <1ms)
NEG_INF = float(jnp.finfo(jnp.float32).min)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_q, n_blocks, mode):
    k = k_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]
    c1 = scale * 1.4426950408889634
    c2 = 30.0 * 1.4426950408889634

    def body(j, _):
        q = q_ref[0, 0, pl.ds(j * block_q, block_q), :]
        raw = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        s = raw * scale
        if mode == "full":
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
        elif mode == "nomax":
            p = jnp.exp(s - 30.0)   # fixed safe max (qk-normed scores bounded)
        elif mode in ("exp2", "dh128", "unroll2"):  # unroll2: odd tail block
            # log2-domain: one fused mul-sub feeding exp2 (no separate scale
            # pass, no ln2 conversion inside exp)
            p = jnp.exp2(raw * c1 - c2)
        elif mode == "noexp":
            p = s
        if mode == "sumdot":
            # fold the row-sum INTO the PV matmul: v carries a ones column
            # (v_ref is [S, D+pad] with ones at column D) — the [bq, S] VPU
            # reduce pass disappears; the MXU cost is identical because
            # 88 and 96 lanes both pad to 128. denom then derives from the
            # bf16-rounded p (≈1e-3 relative vs the fp32 reduce — measure
            # first, judge parity after).
            p = jnp.exp2(raw * c1 - c2)
            oe = jax.lax.dot_general(p.astype(v.dtype), v,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            o = oe[:, :DH]
            denom = oe[:, DH:DH + 1]
            o_ref[0, 0, pl.ds(j * block_q, block_q), :] = (
                o / denom).astype(o_ref.dtype)
            return 0
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, 0, pl.ds(j * block_q, block_q), :] = (o / denom).astype(
            o_ref.dtype)
        return 0

    if mode == "unroll2":
        # TWO independent q blocks per iteration: block 2j's VPU softmax can
        # overlap block 2j+1's MXU QK dot (and vice versa) without the
        # explicit cross-iteration carry that sank the 'pipe' variant —
        # both chains live in one basic block for Mosaic's own scheduler.
        def body2(i, _):
            j0 = 2 * i
            q0 = q_ref[0, 0, pl.ds(j0 * block_q, block_q), :]
            q1 = q_ref[0, 0, pl.ds((j0 + 1) * block_q, block_q), :]
            r0 = jax.lax.dot_general(q0, k, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            r1 = jax.lax.dot_general(q1, k, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            p0 = jnp.exp2(r0 * c1 - c2)
            p1 = jnp.exp2(r1 * c1 - c2)
            d0 = jnp.sum(p0, axis=-1, keepdims=True)
            d1 = jnp.sum(p1, axis=-1, keepdims=True)
            o0 = jax.lax.dot_general(p0.astype(v.dtype), v,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            o1 = jax.lax.dot_general(p1.astype(v.dtype), v,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            o_ref[0, 0, pl.ds(j0 * block_q, block_q), :] = (
                o0 / d0).astype(o_ref.dtype)
            o_ref[0, 0, pl.ds((j0 + 1) * block_q, block_q), :] = (
                o1 / d1).astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, n_blocks // 2, body2, 0)
        if n_blocks % 2:
            body(n_blocks - 1, 0)
        return

    if mode == "pipe":
        # software pipeline: block j+1's score matmul is issued in the same
        # iteration that runs block j's exp/sum (VPU) and PV (MXU) — the
        # scheduler can overlap the independent MXU work with the VPU
        # softmax instead of serializing dot → exp → dot
        c1 = scale * 1.4426950408889634
        c2 = 30.0 * 1.4426950408889634

        def sblock(j):
            q = q_ref[0, 0, pl.ds(j * block_q, block_q), :]
            return jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def pbody(j, s_j):
            s_next = sblock(j + 1)
            p = jnp.exp2(s_j * c1 - c2)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(p.astype(v.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[0, 0, pl.ds(j * block_q, block_q), :] = (o / denom).astype(
                o_ref.dtype)
            return s_next

        s_last = jax.lax.fori_loop(0, n_blocks - 1, pbody, sblock(0))
        p = jnp.exp2(s_last * c1 - c2)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, 0, pl.ds((n_blocks - 1) * block_q, block_q), :] = (
            o / denom).astype(o_ref.dtype)
    else:
        jax.lax.fori_loop(0, n_blocks, body, 0)


def flash_variant(q, k, v, mode, block_q=512):
    Bq, Hq, Sq, D = q.shape
    n_blocks = -(-Sq // block_q)
    pad = n_blocks * block_q - Sq
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    if mode == "sumdot":
        # ones column at D → the PV dot also yields the row sum
        v = jnp.concatenate(
            [v, jnp.ones((Bq, Hq, Sq, 1), v.dtype)], axis=-1)
    Dv = v.shape[-1]
    kern = functools.partial(_kernel, scale=D ** -0.5, block_q=block_q,
                             n_blocks=n_blocks, mode=mode)
    out = pl.pallas_call(
        kern,
        grid=(Bq, Hq),
        in_specs=[pl.BlockSpec((1, 1, q.shape[2], D), lambda b, h: (b, h, 0, 0)),
                  pl.BlockSpec((1, 1, Sq, D), lambda b, h: (b, h, 0, 0)),
                  pl.BlockSpec((1, 1, Sq, Dv), lambda b, h: (b, h, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, q.shape[2], D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bq, Hq, q.shape[2], D), q.dtype),
    )(q, k, v)
    return out[:, :, :Sq]


def time_fn(name, fn, *args, flops=None):
    f = jax.jit(fn)
    np.asarray(f(*args))  # compile
    t0 = time.time()
    out = np.asarray(f(*args))
    dt = (time.time() - t0) / R
    tfs = (flops / dt / 1e12) if flops else 0.0
    print(f"{name:14s} {dt*1000:8.2f} ms/iter   {tfs:7.1f} TF/s")
    del out
    return dt


def main():
    print(f"devices: {jax.devices()}  clips={B} S={S} H={H} Dh={DH}")
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, S, DH)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, S, DH)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, S, DH)) * 0.1, jnp.bfloat16)

    attn_flops = B * H * (2 * S * S * DH * 2)   # score + pv, PER ITER

    def chain(fn):
        def run(q, k, v):
            def body(i, acc):
                return fn(acc, k, v)
            # scalar output: a full-array fetch ships ~69MB through the axon
            # tunnel and dwarfs compute time
            return jnp.sum(jax.lax.fori_loop(0, R, body, q),
                           dtype=jnp.float32)
        return run

    # r4 variants: unroll2 (two independent q-block chains per iteration —
    # MXU/VPU overlap without the pipe variant's explicit carry), sumdot
    # (denominator folded into the PV dot via a ones column: one fewer
    # [bq, S] VPU pass, free lanes at Dh 88→89)
    for mode in ("exp2", "unroll2", "sumdot"):
        for bq in (208, 232, 256):
            time_fn(f"flash_{mode}_bq{bq}",
                    chain(lambda a, b, c, m=mode, bb=bq:
                          flash_variant(a, b, c, m, block_q=bb)),
                    q, k, v, flops=attn_flops)

    # dh128 control: same math with q/k/v zero-padded to Dh=128 — if ms is
    # unchanged vs exp2 the 88-lane tax is exactly the theoretical 88/128
    # (ceiling math holds); if it shrinks, Mosaic penalizes ragged lanes on
    # top of the padding
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, 40)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, 40)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, 40)))
    time_fn("flash_dh128_bq232",
            chain(lambda a, b, c: flash_variant(a, b, c, "dh128",
                                                block_q=232)),
            qp, kp, vp, flops=attn_flops)

    # in-situ entry: [B,S,H,D] layout through ops.attention.mha — the gap vs
    # the raw kernel above is the 4 HBM transposes + layout fiddling
    from grounded_video_llm_tpu.ops.attention import mha as mha_entry

    qs = q.transpose(0, 2, 1, 3)  # [B, S, H, D]
    ks_ = k.transpose(0, 2, 1, 3)
    vs_ = v.transpose(0, 2, 1, 3)

    def chain_bshd(fn):
        def run(q, k, v):
            def body(i, acc):
                return fn(acc, k, v)
            return jnp.sum(jax.lax.fori_loop(0, R, body, q),
                           dtype=jnp.float32)
        return run

    time_fn("mha_bshd_insitu",
            chain_bshd(lambda a, b, c: mha_entry(
                a, b, c, bounded_softmax=True).astype(a.dtype)),
            qs, ks_, vs_, flops=attn_flops)

    # ragged-lane cost: same kernel at S=2048 (no CLS straggler): Mosaic
    # pads 2049 lanes to 2176 (+6%) and may take unaligned paths
    q2, k2, v2 = q[:, :, :2048], k[:, :, :2048], v[:, :, :2048]
    flops2 = B * H * (2 * 2048 * 2048 * DH * 2)
    time_fn("flash_nomax_S2048",
            chain(lambda a, b, c: flash_variant(a, b, c, "nomax",
                                                block_q=256)),
            q2, k2, v2, flops=flops2)


if __name__ == "__main__":
    main()
