"""On-TPU Mosaic kernel numerics gate.

CI runs every Pallas kernel in INTERPRET mode (CPU) — a Mosaic-compilation
regression (wrong lowering, tiling bug, silent fallback) is invisible to the
suite. This script runs each kernel MOSAIC-COMPILED on the real chip at the
flagship shapes and asserts tolerance against the XLA reference. Run after
any kernel change; a deliberately broken kernel fails loudly here
(GVLLM_STRICT_FLASH=1 is forced so the flash dispatch cannot silently
degrade to the XLA path).

Covers:
  flash fwd        — encoder shape (Dh=88, S=2049, bounded) and LLM prefill
                     (Dh=96, S=3520, causal + left-pad mask + sliding window)
  flash bwd        — grounded train length (S=7516) through jax.grad
  int8 decode attn — both entry points (per-layer + stacked scalar-prefetch),
                     cache 3584, left-pad holes; llama GQA shapes (G=4,
                     Dh=128) incl. a GQA causal flash prefill
  int8 matmuls     — GEMV kernel + stacked layer-indexed kernel
  cache scatter    — per-row slot writes vs dynamic_update_slice
  fused IV2 GEMMs  — norm+quant+GEMM epilogues (opt-in path, still verified)

Exit 0 = all kernels within tolerance. ~10-20 min (remote compiles dominate).

Usage: python scripts/verify_kernels.py [--quick]
"""

import os
import sys

os.environ["GVLLM_STRICT_FLASH"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

QUICK = "--quick" in sys.argv
FAILURES = []


def check(name, got, want, rtol, atol):
    got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
    ok = np.allclose(got, want, rtol=rtol, atol=atol) and np.isfinite(
        got).all()
    err = float(np.max(np.abs(got - want))) if got.shape == want.shape else -1
    status = "OK  " if ok else "FAIL"
    print(f"{status} {name:34s} max|Δ|={err:.3e}")
    if not ok:
        FAILURES.append(name)


def rand(shape, seed, scale=0.1, dtype=jnp.bfloat16):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape) * scale, dtype)


def main():
    assert jax.default_backend() == "tpu", (
        "verify_kernels must run on the real TPU (Mosaic-compiled); "
        f"backend is {jax.default_backend()}")
    print(f"devices: {jax.devices()}")
    from grounded_video_llm_tpu.ops.attention import (decode_attention,
                                                      xla_mha)
    from grounded_video_llm_tpu.ops.flash_attention import flash_mha

    # ---- flash forward: encoder shape (bounded softmax) ----
    B, S, H, D = (4, 2049, 4, 88) if QUICK else (8, 2049, 16, 88)
    q, k, v = rand((B, S, H, D), 0), rand((B, S, H, D), 1), rand(
        (B, S, H, D), 2)
    got = jax.jit(lambda a, b, c: flash_mha(a, b, c, bounded_softmax=True))(
        q, k, v)
    want = jax.jit(xla_mha)(q, k, v)
    check("flash_fwd_encoder_bounded", got, want, 2e-2, 2e-3)

    # ---- flash forward: prefill (causal + left-pad + window) ----
    B, S, H, D = 2, 3520, 8, 96
    q, k, v = rand((B, S, H, D), 3), rand((B, S, H, D), 4), rand(
        (B, S, H, D), 5)
    mask = jnp.asarray(np.concatenate(
        [np.zeros((B, 7)), np.ones((B, S - 7))], axis=1), jnp.int32)
    for window in (None, 2047):
        f = jax.jit(lambda a, b, c, w=window: flash_mha(
            a, b, c, causal=True, mask=mask, sliding_window=w))
        g = jax.jit(lambda a, b, c, w=window: xla_mha(
            a, b, c, causal=True, mask=mask, sliding_window=w))
        got, want = f(q, k, v), g(q, k, v)
        # pad query rows are exactly 0 in the flash kernel, garbage in XLA
        check(f"flash_fwd_prefill_w{window}", got[:, 7:], want[:, 7:],
              2e-2, 2e-3)
        assert np.isfinite(np.asarray(got)).all()

    # ---- flash backward at the grounded train length ----
    if not QUICK:
        B, S, H, D = 1, 7516, 4, 96
        q, k, v = rand((B, S, H, D), 6), rand((B, S, H, D), 7), rand(
            (B, S, H, D), 8)

        def loss_flash(q, k, v):
            return jnp.sum(flash_mha(q, k, v, causal=True) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(xla_mha(q, k, v, causal=True) ** 2)

        gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
        gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
        for name, a, b in zip(("dq", "dk", "dv"), gf, gx):
            scale_ref = float(jnp.max(jnp.abs(b)).astype(jnp.float32))
            check(f"flash_bwd_grounded_{name}", a, b, 5e-2,
                  2e-2 * max(scale_ref, 1.0))

    # ---- int8 decode attention (both entry points) ----
    from grounded_video_llm_tpu.ops.decode_attention_int8 import (
        decode_attention_int8, decode_attention_int8_layer, quantize_kv)

    B, Hkv, Dh, L = 6, 32, 96, 3584
    Hq = 32
    kv = rand((B, L, Hkv, Dh), 9, 0.3)
    vv = rand((B, L, Hkv, Dh), 10, 0.3)
    qd = rand((B, 1, Hq, Dh), 11, 0.3)
    kn = rand((B, 1, Hkv, Dh), 12, 0.3)
    vn = rand((B, 1, Hkv, Dh), 13, 0.3)
    valid = jnp.asarray(np.concatenate(
        [np.zeros((B, 5)), np.ones((B, 2000)), np.zeros((B, L - 2005))],
        axis=1), jnp.int32)

    def build_qcache(kv, vv):
        kq, ks = quantize_kv(kv)
        vq, vs = quantize_kv(vv)
        kq = kq.transpose(0, 2, 3, 1)
        vq = vq.transpose(0, 2, 3, 1)
        ks = ks.transpose(0, 2, 1)[:, :, None, :]
        vs = vs.transpose(0, 2, 1)[:, :, None, :]
        return kq, ks, vq, vs

    kq, ks, vq, vs = jax.jit(build_qcache)(kv, vv)
    scale = Dh ** -0.5
    got = jax.jit(lambda *a: decode_attention_int8(*a, scale=scale))(
        qd, kq, ks, vq, vs, valid, kn, vn)
    # reference: dequantize, XLA decode attention
    deq_k = (kq.astype(jnp.float32) * ks).transpose(0, 3, 1, 2).astype(
        jnp.bfloat16)
    deq_v = (vq.astype(jnp.float32) * vs).transpose(0, 3, 1, 2).astype(
        jnp.bfloat16)
    want = jax.jit(lambda *a: decode_attention(*a, k_new=kn, v_new=vn,
                                               scale=scale))(
        qd, deq_k, deq_v, valid)
    check("decode_attn_int8", got, want, 5e-2, 5e-3)

    Lyr = 4
    kqs = jnp.stack([kq] * Lyr)
    kss = jnp.stack([ks] * Lyr)
    vqs = jnp.stack([vq] * Lyr)
    vss = jnp.stack([vs] * Lyr)
    got = jax.jit(lambda *a: decode_attention_int8_layer(
        *a, jnp.int32(2), scale=scale))(qd, kqs, kss, vqs, vss, valid, kn, vn)
    check("decode_attn_int8_layer", got, want, 5e-2, 5e-3)

    # ---- speculative verify attention (S=5 queries, one cache stream) ----
    from grounded_video_llm_tpu.ops.decode_attention_int8 import (
        verify_attention_int8, verify_attention_int8_layer)

    S_v = 5
    qv = rand((B, S_v, Hq, Dh), 40, 0.3)
    knv = rand((B, S_v, Hkv, Dh), 41, 0.3)
    vnv = rand((B, S_v, Hkv, Dh), 42, 0.3)
    validv = jnp.broadcast_to(valid[:, None, :], (B, S_v, L))

    def xla_verify(q, dk, dv, mask, kn, vn):
        # [B,S,H,D] queries over committed cache + causal new block
        Hn = q.shape[2]
        G = Hn // dk.shape[2]
        k_all = jnp.concatenate([dk, kn], axis=1)
        v_all = jnp.concatenate([dv, vn], axis=1)
        kv_idx = jnp.arange(Hn) // G
        kh = k_all[:, :, kv_idx].astype(jnp.float32)
        vh = v_all[:, :, kv_idx].astype(jnp.float32)
        causal = jnp.tril(jnp.ones((S_v, S_v), bool))
        m_all = jnp.concatenate(
            [mask.astype(bool),
             jnp.broadcast_to(causal[None], (mask.shape[0], S_v, S_v))],
            axis=-1)
        s = jnp.einsum("bshd,blhd->bhsl", q.astype(jnp.float32), kh) * scale
        s = jnp.where(m_all[:, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhsl,blhd->bshd", p, vh).astype(jnp.bfloat16)

    got = jax.jit(lambda *a: verify_attention_int8(*a, scale=scale))(
        qv, kq, ks, vq, vs, validv, knv, vnv)
    want = jax.jit(xla_verify)(qv, deq_k, deq_v, validv, knv, vnv)
    check("verify_attn_int8", got, want, 5e-2, 5e-3)

    # ---- llama-3 GQA shapes (H=32, Hkv=8, G=4, Dh=128): the kernel's
    # per-group python unroll and flash's h//G kv index map are exercised
    # with G=1 above but Mosaic-compiled nowhere else at G=4 ----
    if not QUICK:
        Bg, Hkvg, Dg, Lg = 4, 8, 128, 2432
        Hqg = 32
        kvg = rand((Bg, Lg, Hkvg, Dg), 30, 0.3)
        vvg = rand((Bg, Lg, Hkvg, Dg), 31, 0.3)
        qg = rand((Bg, 1, Hqg, Dg), 32, 0.3)
        kng = rand((Bg, 1, Hkvg, Dg), 33, 0.3)
        vng = rand((Bg, 1, Hkvg, Dg), 34, 0.3)
        validg = jnp.asarray(np.concatenate(
            [np.zeros((Bg, 3)), np.ones((Bg, 2000)),
             np.zeros((Bg, Lg - 2003))], axis=1), jnp.int32)
        kqg, ksg, vqg, vsg = jax.jit(build_qcache)(kvg, vvg)
        scale_g = Dg ** -0.5
        got = jax.jit(lambda *a: decode_attention_int8(*a, scale=scale_g))(
            qg, kqg, ksg, vqg, vsg, validg, kng, vng)
        deq_kg = (kqg.astype(jnp.float32) * ksg).transpose(0, 3, 1, 2).astype(
            jnp.bfloat16)
        deq_vg = (vqg.astype(jnp.float32) * vsg).transpose(0, 3, 1, 2).astype(
            jnp.bfloat16)
        want = jax.jit(lambda *a: decode_attention(
            *a, k_new=kng, v_new=vng, scale=scale_g))(
            qg, deq_kg, deq_vg, validg)
        check("decode_attn_int8_gqa_llama", got, want, 5e-2, 5e-3)

        Sg = 2316   # llama prompt length (12 segs x 193)
        qp = rand((2, Sg, Hqg, Dg), 35)
        kp = rand((2, Sg, Hkvg, Dg), 36)
        vp = rand((2, Sg, Hkvg, Dg), 37)
        maskg = jnp.asarray(np.concatenate(
            [np.zeros((2, 5)), np.ones((2, Sg - 5))], axis=1), jnp.int32)
        got = jax.jit(lambda a, b, c: flash_mha(
            a, b, c, causal=True, mask=maskg))(qp, kp, vp)
        want = jax.jit(lambda a, b, c: xla_mha(
            a, b, c, causal=True, mask=maskg))(qp, kp, vp)
        check("flash_fwd_prefill_gqa_llama", got[:, 5:], want[:, 5:],
              2e-2, 2e-3)
        assert np.isfinite(np.asarray(got)).all()

    # ---- int8 matmuls ----
    from grounded_video_llm_tpu.ops.int8_matmul import (
        dynamic_int8_matmul, int8_matmul, int8_matmul_layer,
        quantize_weights_int8)

    Din, O = 3072, 9216
    x = rand((6, Din), 14)
    w = rand((Din, O), 15, 0.05, jnp.float32)
    wq, ws = jax.jit(quantize_weights_int8)(w)
    got = jax.jit(int8_matmul)(x, wq, ws)
    want = jax.jit(lambda x: (x.astype(jnp.float32) @ (
        wq.astype(jnp.float32) * ws[None, :])).astype(jnp.bfloat16))(x)
    check("int8_matmul_gemv", got, want, 2e-2, 2e-2)

    wq3 = jnp.stack([wq] * 3)
    ws3 = jnp.stack([ws] * 3)
    got = jax.jit(lambda x: int8_matmul_layer(x, wq3, ws3, jnp.int32(1)))(x)
    check("int8_matmul_layer", got, want, 2e-2, 2e-2)

    xb = rand((512, Din), 16)
    got = jax.jit(dynamic_int8_matmul)(xb, wq, ws)
    want = jax.jit(lambda x: (x.astype(jnp.float32) @ (
        wq.astype(jnp.float32) * ws[None, :])).astype(jnp.bfloat16))(xb)
    check("dynamic_int8_matmul_w8a8", got, want, 5e-2, 5e-2)

    # ---- cache scatter writes ----
    from grounded_video_llm_tpu.ops.cache_write import (scatter_write_kv,
                                                        scatter_write_scale)

    Lyr2 = 4
    cache = jnp.zeros((Lyr2, B, Hkv, Dh, L), jnp.int8)
    scales = jnp.ones((Lyr2, B, Hkv, 1, L), jnp.float32)
    newv = jnp.asarray(np.random.default_rng(17).integers(
        -127, 128, size=(Lyr2, B, Hkv, Dh)), jnp.int8)
    news = jnp.asarray(np.random.default_rng(18).uniform(
        1e-3, 1e-2, size=(Lyr2, B, Hkv)), jnp.float32)
    idx = jnp.asarray(np.random.default_rng(19).integers(0, L, size=(B,)),
                      jnp.int32)
    got = jax.jit(scatter_write_kv)(cache, newv, idx)
    want = np.zeros(cache.shape, np.int8)
    for b in range(B):
        want[:, b, :, :, int(idx[b])] = np.asarray(newv)[:, b]
    check("scatter_write_kv", got, want, 0, 0.5)
    got = jax.jit(scatter_write_scale)(scales, news, idx)
    wants = np.ones(scales.shape, np.float32)
    for b in range(B):
        wants[:, b, :, 0, int(idx[b])] = np.asarray(news)[:, b]
    check("scatter_write_scale", got, wants, 1e-6, 1e-6)

    # ---- multi-slot scatter writes (speculative verify commit) ----
    from grounded_video_llm_tpu.ops.cache_write import (
        scatter_write_kv_multi, scatter_write_scale_multi)

    S_w = 5
    newm = jnp.asarray(np.random.default_rng(43).integers(
        -127, 128, size=(Lyr2, B, S_w, Hkv, Dh)), jnp.int8)
    newms = jnp.asarray(np.random.default_rng(44).uniform(
        1e-3, 1e-2, size=(Lyr2, B, S_w, Hkv)), jnp.float32)
    # bases incl. a 128-tile-boundary spanner and the array edge
    idxm = jnp.asarray([40, 126, L - S_w] + [200] * (B - 3), jnp.int32)[:B]
    got = jax.jit(scatter_write_kv_multi)(cache, newm, idxm)
    wantm = np.zeros(cache.shape, np.int8)
    for b in range(B):
        for s in range(S_w):
            wantm[:, b, :, :, int(idxm[b]) + s] = np.asarray(newm)[:, b, s]
    check("scatter_write_kv_multi", got, wantm, 0, 0.5)
    got = jax.jit(scatter_write_scale_multi)(scales, newms, idxm)
    wantms = np.ones(scales.shape, np.float32)
    for b in range(B):
        for s in range(S_w):
            wantms[:, b, :, 0, int(idxm[b]) + s] = np.asarray(newms)[:, b, s]
    check("scatter_write_scale_multi", got, wantms, 1e-6, 1e-6)

    # ---- fused IV2 block GEMMs (opt-in path) ----
    if not QUICK:
        from grounded_video_llm_tpu.ops.fused_block import (
            fused_norm_quant_gemm, fused_quant_gemm_ls_residual)
        from grounded_video_llm_tpu.ops.normalization import (layer_scale,
                                                              rms_norm)

        M, Dm = 4096, 1408
        x = rand((M, Dm), 20, 0.3, jnp.float32)
        nw = jnp.ones((Dm,), jnp.float32)
        w = rand((Dm, 3 * Dm), 21, 0.05, jnp.float32)
        wq, ws = jax.jit(quantize_weights_int8)(w)
        qn = jnp.asarray(np.random.default_rng(22).normal(
            size=(2, Dm)) * 0.1 + 1.0, jnp.float32)
        got = jax.jit(lambda x: fused_norm_quant_gemm(
            x, nw, wq, ws, eps=1e-6, epilogue="qk_norm", qk_norm_w=qn))(x)

        def ref(x):
            h = rms_norm(x, nw, 1e-6)
            absmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
            s = jnp.maximum(absmax / 127.0, 1e-8)
            hq = jnp.clip(jnp.round(h / s), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(hq, wq, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * s * ws
            qp, kp, vp = jnp.split(y, 3, axis=-1)
            return jnp.concatenate([rms_norm(qp, qn[0], 1e-6),
                                    rms_norm(kp, qn[1], 1e-6), vp], axis=-1)

        check("fused_norm_quant_gemm_qk", got, jax.jit(ref)(x), 2e-2, 2e-2)

        res = rand((M, Dm), 23, 0.3, jnp.float32)
        ls = jnp.full((Dm,), 0.01, jnp.float32)
        bias = rand((Dm,), 24, 0.1, jnp.float32)
        wp = rand((Dm, Dm), 25, 0.05, jnp.float32)
        wpq, wps = jax.jit(quantize_weights_int8)(wp)
        got = jax.jit(lambda x, r: fused_quant_gemm_ls_residual(
            x, wpq, wps, bias, ls, r))(x, res)

        def ref2(x, r):
            absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
            s = jnp.maximum(absmax / 127.0, 1e-8)
            xq = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(xq, wpq, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return r + layer_scale(y.astype(jnp.float32) * s * wps + bias, ls)

        check("fused_quant_gemm_ls_residual", got, jax.jit(ref2)(x, res),
              2e-2, 2e-2)

    print()
    if FAILURES:
        print(f"FAILED: {len(FAILURES)} kernel(s): {FAILURES}")
        sys.exit(1)
    print("all kernels OK (Mosaic-compiled vs XLA reference)")


if __name__ == "__main__":
    main()
