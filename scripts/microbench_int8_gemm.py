"""int8xint8 vs bf16 GEMM on the MXU at encoder/prefill shapes.

Decides whether int8 encoder matmuls are worth building: the InternVideo2
trunk spends ~2.3s/batch in bf16 matmuls at ~126 TF/s; v5e int8 peak is 2x
bf16 (394 TOPs). Round 1 measured "1.39x" for int8xint8 without preserving
the harness — this re-measures, including the realistic variants:

  bf16          — dot(bf16, bf16) -> f32 (the current encoder path)
  i8i8          — dot(int8, int8) -> int32, pre-quantized operands (upper
                  bound: no quantization overhead on the clock)
  i8i8_rescale  — + fp32 rescale of the int32 output (per-row x per-col)
  i8i8_dynamic  — + per-row activation quantization on the clock (the real
                  serving path: weights pre-quantized, activations dynamic)

Shapes: encoder mlp fc1 [S*clips, 1408]x[1408, 6144] and fc2 transpose.
Timing per CLAUDE.md: R chained in-jit iterations, scalar fetch.
Usage: python scripts/microbench_int8_gemm.py

r3 Pallas variants (same-process A/B, absolute TF/s drifted low that run):
  pl_i8_*   — blocked Mosaic int8 GEMM: best 88.2 vs XLA i8i8 82.7 TF/s
              (+6%% — not worth replacing matmul_any's XLA path)
  pl_dyn_*  — per-row dynamic activation quant fused INTO the GEMM kernel:
              70.9 vs XLA's separate-quant 71.0 TF/s (a wash; the HBM
              round-trip saved is repaid by Mosaic fp32 VPU round/clip)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

R = 20
M, K, N = 8192, 1408, 6144


def time_fn(name, fn, *args, flops):
    f = jax.jit(fn)
    np.asarray(f(*args))
    t0 = time.time()
    np.asarray(f(*args))
    dt = (time.time() - t0) / R
    print(f"{name:14s} {dt*1000:8.3f} ms/iter  {flops/dt/1e12:7.1f} TF/s")
    return dt


def main():
    print(f"devices: {jax.devices()}  M={M} K={K} N={N} R={R}")
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    x = (jax.random.normal(k1, (M, K), jnp.float32) * 0.1).astype(jnp.bfloat16)
    w = (jax.random.normal(k2, (K, N), jnp.float32) * 0.02).astype(jnp.bfloat16)
    xq = jax.random.randint(k1, (M, K), -127, 128, jnp.int8)
    wq = jax.random.randint(k2, (K, N), -127, 128, jnp.int8)
    xs = jnp.abs(jax.random.normal(k1, (M, 1), jnp.float32)) * 1e-3 + 1e-4
    ws = jnp.abs(jax.random.normal(k2, (N,), jnp.float32)) * 1e-3 + 1e-4
    flops = 2.0 * M * K * N

    def chain_bf16(x, w):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(R):
            y = jax.lax.dot_general(
                (x * (1.0 + acc * 0)).astype(x.dtype), w,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            acc = acc + jnp.sum(y[::512, ::512])
        return acc

    time_fn("bf16", chain_bf16, x, w, flops=flops)

    def chain_i8(xq, wq):
        acc = jnp.zeros((), jnp.int32)
        for _ in range(R):
            xq2 = jnp.bitwise_xor(xq, (acc & 0).astype(jnp.int8))
            y = jax.lax.dot_general(
                xq2, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = acc + jnp.sum(y[::512, ::512])
        return acc

    time_fn("i8i8", chain_i8, xq, wq, flops=flops)

    def chain_i8_rescale(xq, wq, xs, ws):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(R):
            xq2 = jnp.bitwise_xor(xq, (jnp.int32(acc * 0) & 0).astype(jnp.int8))
            y = jax.lax.dot_general(
                xq2, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            yf = y.astype(jnp.float32) * xs * ws[None, :]
            acc = acc + jnp.sum(yf[::512, ::512])
        return acc

    time_fn("i8i8_rescale", chain_i8_rescale, xq, wq, xs, ws, flops=flops)

    def chain_i8_dynamic(x, wq, ws):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(R):
            xf = (x * (1.0 + acc * 0)).astype(jnp.float32)
            am = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            xs_d = jnp.maximum(am / 127.0, 1e-8)
            xq_d = jnp.clip(jnp.round(xf / xs_d), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(
                xq_d, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            yf = (y.astype(jnp.float32) * xs_d * ws[None, :]).astype(
                jnp.bfloat16)
            acc = acc + jnp.sum(yf[::512, ::512].astype(jnp.float32))
        return acc

    time_fn("i8i8_dynamic", chain_i8_dynamic, x, wq, ws, flops=flops)

    # -- Pallas blocked int8 GEMM: can Mosaic beat XLA's ~46%-of-peak int8
    # dot? K stays whole (1408 fits VMEM); grid (N/bn, M/bm) with m inner so
    # the w tile is fetched once per j and the small x tiles re-stream.
    import functools

    from jax.experimental import pallas as pl

    def _pl_kernel(x_ref, w_ref, s_ref, o_ref):
        y = jax.lax.dot_general(x_ref[:, :], w_ref[:, :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        o_ref[:, :] = (y.astype(jnp.float32) * s_ref[0, :]).astype(
            jnp.bfloat16)

    def pallas_i8(xq, wq, ws, bm, bn):
        return pl.pallas_call(
            _pl_kernel,
            grid=(N // bn, M // bm),
            in_specs=[pl.BlockSpec((bm, K), lambda j, i: (i, 0)),
                      pl.BlockSpec((K, bn), lambda j, i: (0, j)),
                      pl.BlockSpec((1, bn), lambda j, i: (0, j))],
            out_specs=pl.BlockSpec((bm, bn), lambda j, i: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        )(xq, wq, ws)

    for bm, bn in ((512, 512), (512, 1024), (256, 1024), (1024, 512)):
        def chain_pl(xq, wq, ws, bm=bm, bn=bn):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(R):
                xq2 = jnp.bitwise_xor(xq,
                                      (jnp.int32(acc * 0) & 0).astype(jnp.int8))
                y = pallas_i8(xq2, wq, ws, bm, bn)
                acc = acc + jnp.sum(y[::512, ::512].astype(jnp.float32))
            return acc

        time_fn(f"pl_i8_{bm}x{bn}", chain_pl, xq, wq, ws[None, :],
                flops=flops)

    # fused dynamic quant: x enters bf16, per-row absmax + round happen in
    # VMEM inside the GEMM program (saves the HBM round-trip of xq and the
    # separate quant pass XLA emits)
    def _pl_dyn_kernel(x_ref, w_ref, s_ref, o_ref):
        xf = x_ref[:, :].astype(jnp.float32)
        am = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        xs = jnp.maximum(am / 127.0, 1e-8)
        x8 = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(x8, w_ref[:, :], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        o_ref[:, :] = (y.astype(jnp.float32) * xs * s_ref[0, :]).astype(
            jnp.bfloat16)

    def pallas_dyn(x, wq, ws, bm, bn):
        return pl.pallas_call(
            _pl_dyn_kernel,
            grid=(N // bn, M // bm),
            in_specs=[pl.BlockSpec((bm, K), lambda j, i: (i, 0)),
                      pl.BlockSpec((K, bn), lambda j, i: (0, j)),
                      pl.BlockSpec((1, bn), lambda j, i: (0, j))],
            out_specs=pl.BlockSpec((bm, bn), lambda j, i: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        )(x, wq, ws)

    for bm, bn in ((512, 1024), (512, 512)):
        def chain_pld(x, wq, ws, bm=bm, bn=bn):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(R):
                y = pallas_dyn((x * (1.0 + acc * 0)).astype(x.dtype),
                               wq, ws, bm, bn)
                acc = acc + jnp.sum(y[::512, ::512].astype(jnp.float32))
            return acc

        time_fn(f"pl_dyn_{bm}x{bn}", chain_pld, x, wq, ws[None, :],
                flops=flops)


if __name__ == "__main__":
    main()
