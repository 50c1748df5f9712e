"""Decode-attention kernel parameter sweep in the REAL streaming regime.

Times ONLY the int8 decode-attention kernel, scanned over a full stacked
cache (32 layers x batch x [Hkv, D, max_len] int8) exactly like decode_step
does — per-layer scalar-prefetch indexing, HBM streaming of ~4.3GB/pass.
Sweeps head_block (VPU tile height for the softmax/mult-reduce math) and
BLOCK_L (the L-chunk size: one grid step per chunk, online-softmax scratch
carried across the sequential L grid; the Pallas pipeline double-buffers
each chunk's k+v DMA against the previous chunk's VPU work).

Floor: cache read ~4.3GB at 819GB/s = 5.3 ms/pass. Decode total is
17.2 ms/tok; GEMVs ~4.5ms; whatever this sweep saves is ~1:1 off the token.

Usage: python scripts/sweep_decode_attn.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from grounded_video_llm_tpu.ops import decode_attention_int8 as da

B = int(sys.argv[1]) if len(sys.argv) > 1 else 6
L, HKV, DH, MAXLEN, H = 32, 32, 96, 3584, 32
R = 16


def main():
    print(f"devices: {jax.devices()}  batch={B} max_len={MAXLEN}")

    @jax.jit
    def build(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        kq = jax.random.randint(k1, (L, B, HKV, DH, MAXLEN), -127, 128,
                                jnp.int8)
        vq = jax.random.randint(k2, (L, B, HKV, DH, MAXLEN), -127, 128,
                                jnp.int8)
        sc = jax.random.uniform(k3, (L, B, HKV, 1, MAXLEN), jnp.float32,
                                1e-3, 1e-2)
        q = (jax.random.normal(k4, (B, 1, H, DH), jnp.float32) * 0.1
             ).astype(jnp.bfloat16)
        return kq, vq, sc, q

    kq, vq, sc, q = build(jax.random.key(0))
    valid = jnp.ones((B, MAXLEN), jnp.int32)
    kn = q[:, :, :HKV]
    vn = q[:, :, :HKV]

    def sweep(hb, bl):
        da.BLOCK_L = bl

        def run(q, kq, sc, vq):
            def body(x, li):
                o = da.decode_attention_int8_layer(
                    (x * 1.0).astype(q.dtype), kq, sc, vq, sc, valid,
                    kn, vn, li, scale=DH ** -0.5, head_block=hb)
                return o.astype(q.dtype), None
            def outer(i, acc):
                x, _ = jax.lax.scan(body, q * (1.0 + acc * 0).astype(q.dtype),
                                    jnp.arange(L, dtype=jnp.int32))
                return acc + jnp.sum(x.astype(jnp.float32))
            return jax.lax.fori_loop(0, R, outer, jnp.zeros((), jnp.float32))

        f = jax.jit(run)
        np.asarray(f(q, kq, sc, vq))
        t0 = time.time()
        np.asarray(f(q, kq, sc, vq))
        dt = (time.time() - t0) / R
        gbs = 2 * kq.nbytes / dt / 1e9
        print(f"hb={hb:2d} block_l={bl:4d}  {dt*1000:7.2f} ms/32-layer pass  "
              f"({gbs:.0f} GB/s cache read)")
        return dt

    base = sweep(8, 512)
    for hb, bl in ((16, 512), (8, 1024), (16, 1024), (32, 512), (8, 256)):
        try:
            sweep(hb, bl)
        except Exception as e:  # noqa: BLE001
            print(f"hb={hb} block_l={bl}: {type(e).__name__}")
    da.BLOCK_L = 512


if __name__ == "__main__":
    main()
