"""Microbenchmark: decode-path components on the real chip.

Decode at batch 6 runs ~26 ms/token (bench e2e) against a ~10 ms streaming
floor (int8 weights ~3.7GB + int8 cache read ~4.3GB at 819GB/s). This locates
the gap per component:

  gemv_int8      — ops/int8_matmul.py as shipped (dequant-in-VMEM, bf16 MXU)
  gemv_bf16      — plain XLA bf16 GEMV (weights resident bf16: 2x bytes)
  gemv_i8i8      — prototype: x quantized per-row int8, int8xint8 MXU matmul,
                   fp32 rescale (no weight dequant pass at all)
  attn_int8      — ops/decode_attention_int8.py as shipped
  attn_bf16      — ops/attention.decode_attention (XLA, bf16 cache: 2x bytes)

Shapes: the three Phi-3.5 projections at batch 6 and the decode attention at
L=3584 (the bench's cache size). Reports ms and effective GB/s of the resident
bytes actually streamed.

Timing per CLAUDE.md: R chained in-jit iterations, scalar fetch.
Usage: python scripts/microbench_decode.py [batch]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 6
R = 50
D_MODEL, QKV_OUT, I2, DOWN_IN = 3072, 9216, 16384, 8192
HKV, DH, L_CACHE = 32, 96, 3584


def time_fn(name, fn, *args, bytes_moved=None):
    f = jax.jit(fn)
    np.asarray(f(*args))  # compile
    t0 = time.time()
    np.asarray(f(*args))
    dt = (time.time() - t0) / R
    gbs = (bytes_moved / dt / 1e9) if bytes_moved else 0.0
    print(f"{name:22s} {dt*1000:8.3f} ms/iter   {gbs:7.1f} GB/s eff")
    return dt


def chain_gemv(mm, x0, *weights):
    """R serialized GEMVs: output-dependent perturbation of x, dtype kept."""
    def run(x, *ws):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(R):
            y = mm(jnp.asarray(x * (1.0 + acc * 0), x.dtype), *ws)
            acc = acc + jnp.sum(y.astype(jnp.float32))
        return acc
    return run


# ---- int8 x int8 prototype -------------------------------------------------

def _i8i8_kernel(xq_ref, xs_ref, w_ref, s_ref, o_ref, *, out_dtype):
    xq = xq_ref[:, :]                   # [bm, D] int8
    w = w_ref[:, :]                     # [D, bo] int8
    y = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    o_ref[:, :] = (y.astype(jnp.float32) * xs_ref[:, 0][:, None]
                   * s_ref[0, :][None, :]).astype(out_dtype)


def i8i8_matmul(x, w_q, scales, block_o=512):
    """x [M, D] bf16 → per-row int8 quantize → int8xint8 MXU → rescale."""
    M, D = x.shape
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(absmax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    Mp = max(32, -(-M // 32) * 32)      # int8 sublane tile
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        xs = jnp.pad(xs, ((0, Mp - M), (0, 0)), constant_values=1.0)
    O = w_q.shape[1]
    out = pl.pallas_call(
        functools.partial(_i8i8_kernel, out_dtype=x.dtype),
        grid=(O // block_o,),
        in_specs=[
            pl.BlockSpec((Mp, D), lambda j: (0, 0)),
            pl.BlockSpec((1, 1), lambda j: (0, 0)),   # placeholder, unused
            pl.BlockSpec((D, block_o), lambda j: (0, j)),
            pl.BlockSpec((1, block_o), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((Mp, block_o), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, O), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(xq, jnp.zeros((1, 1), jnp.float32), w_q, scales[None, :])
    # fold the per-row x scale outside (cheap [M, O] vpu op)
    return out[:M] * xs.astype(x.dtype)


def main():
    from grounded_video_llm_tpu.ops.attention import decode_attention
    from grounded_video_llm_tpu.ops.decode_attention_int8 import (
        decode_attention_int8, quantize_kv)
    from grounded_video_llm_tpu.ops.int8_matmul import (int8_matmul,
                                                        quantize_weights_int8)

    print(f"devices: {jax.devices()}  batch={B} R={R}")
    rng = np.random.default_rng(0)

    for (d_in, d_out, tag) in ((D_MODEL, QKV_OUT, "qkv"),
                               (D_MODEL, I2, "gate_up"),
                               (DOWN_IN, D_MODEL, "down")):
        w = jnp.asarray(rng.normal(size=(d_in, d_out)) * 0.02, jnp.bfloat16)
        wq, ws = quantize_weights_int8(w)
        x = jnp.asarray(rng.normal(size=(B, d_in)) * 0.1, jnp.bfloat16)
        nbytes_i8 = d_in * d_out
        nbytes_bf16 = 2 * d_in * d_out
        time_fn(f"gemv_bf16_{tag}", chain_gemv(lambda a, ww: a @ ww, x, w),
                x, w, bytes_moved=nbytes_bf16)
        time_fn(f"gemv_int8_{tag}",
                chain_gemv(lambda a, q, s: int8_matmul(a, q, s), x, wq, ws),
                x, wq, ws, bytes_moved=nbytes_i8)
        time_fn(f"gemv_i8i8_{tag}",
                chain_gemv(lambda a, q, s: i8i8_matmul(a, q, s), x, wq, ws),
                x, wq, ws, bytes_moved=nbytes_i8)

    # ---- decode attention ----
    q = jnp.asarray(rng.normal(size=(B, 1, HKV, DH)) * 0.1, jnp.bfloat16)
    kc = jnp.asarray(rng.normal(size=(B, L_CACHE, HKV, DH)) * 0.1, jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(B, L_CACHE, HKV, DH)) * 0.1, jnp.bfloat16)
    kn = jnp.asarray(rng.normal(size=(B, 1, HKV, DH)) * 0.1, jnp.bfloat16)
    vn = jnp.asarray(rng.normal(size=(B, 1, HKV, DH)) * 0.1, jnp.bfloat16)
    mask = jnp.ones((B, L_CACHE), bool)
    cache_bytes_bf16 = 2 * 2 * B * L_CACHE * HKV * DH
    cache_bytes_i8 = 2 * B * L_CACHE * HKV * DH

    def chain_attn(fn):
        def run(qq, *rest):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(R):
                o = fn(jnp.asarray(qq * (1.0 + acc * 0), qq.dtype), *rest)
                acc = acc + jnp.sum(o.astype(jnp.float32))
            return acc
        return run

    time_fn("attn_bf16",
            chain_attn(lambda a, k, v, m, k1, v1: decode_attention(
                a, k, v, m, k_new=k1, v_new=v1)),
            q, kc, vc, mask, kn, vn, bytes_moved=cache_bytes_bf16)

    kq8, ks8 = quantize_kv(kc)          # [B,L,Hkv,D] i8, [B,L,Hkv]
    vq8, vs8 = quantize_kv(vc)
    kq8 = kq8.transpose(0, 2, 3, 1)     # [B,Hkv,D,L]
    vq8 = vq8.transpose(0, 2, 3, 1)
    ks8 = ks8.transpose(0, 2, 1)[:, :, None, :]
    vs8 = vs8.transpose(0, 2, 1)[:, :, None, :]
    time_fn("attn_int8",
            chain_attn(lambda a, kk, ks, vv, vs, m, k1, v1:
                       decode_attention_int8(a, kk, ks, vv, vs, m, k1, v1,
                                             scale=DH ** -0.5)),
            q, kq8, ks8, vq8, vs8, mask.astype(jnp.int32), kn, vn,
            bytes_moved=cache_bytes_i8)


if __name__ == "__main__":
    main()
