"""One InternVideo2 block at real serving shape: bf16 vs W8A8, on the chip.

The standalone GEMM microbench shows int8xint8 at 1.52x bf16, but the full
trunk only gained 1.08x (3.37 -> 3.11s). This isolates one block (the scan
body) at the exact serving shape (72 clips x 2049 x 1408) to find where the
gap lives: the block in isolation vs inside a scan (per-layer weight slicing
feeding the quant dots), and the attention/matmul split.

Variants:
  block_bf16     — _block with dense bf16 weights, chained R times
  block_w8a8     — _block with {q, scale} weights (dynamic activation quant)
  block_noattn_* — same with attention stubbed (isolates the matmul side)

Usage: python scripts/microbench_iv2_block.py [clips]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CLIPS = int(sys.argv[1]) if len(sys.argv) > 1 else 72
R = 8


def main():
    from grounded_video_llm_tpu.core.config import vlm_config
    from grounded_video_llm_tpu.models import internvideo2
    from grounded_video_llm_tpu.serve.quantize import _quantize_dense
    from grounded_video_llm_tpu.ops.int8_matmul import quantize_weights_int8

    cfg = vlm_config("phi3.5", stage="inference").video
    S = 1 + cfg.num_frames * cfg.patches_per_frame // cfg.tubelet_size
    print(f"devices: {jax.devices()}  clips={CLIPS} S={S} D={cfg.embed_dim}")

    @jax.jit
    def make_block(key):
        p = internvideo2.init_params(key, cfg, dtype=jnp.bfloat16)
        return jax.tree_util.tree_map(lambda a: a[0], p["blocks"])

    bp = make_block(jax.random.key(0))
    x = (jax.random.normal(jax.random.key(1), (CLIPS, S, cfg.embed_dim),
                           jnp.float32) * 0.1).astype(jnp.bfloat16)

    @jax.jit
    def quantize_block(bp):
        out = dict(bp)
        q, s = quantize_weights_int8(bp["qkv_kernel"])
        out["qkv_kernel"] = {"q": q, "scale": s}
        for name in ("proj", "fc1", "fc2"):
            out[name] = _quantize_dense(bp[name])
        return out

    bq = quantize_block(bp)

    def timed(name, fn, *args):
        f = jax.jit(fn)
        np.asarray(f(*args))
        t0 = time.time()
        np.asarray(f(*args))
        dt = (time.time() - t0) / R
        print(f"{name:16s} {dt*1000:8.2f} ms/block-call")
        return dt

    def chain(params):
        def run(p, x):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(R):
                x = internvideo2._block(
                    (x * (1.0 + acc * 0)).astype(x.dtype), p, cfg)
                acc = acc + jnp.sum(x[:1, :1].astype(jnp.float32))
            return acc
        return run

    t_bf = timed("block_bf16", chain(bp), bp, x)
    t_q = timed("block_w8a8", chain(bq), bq, x)
    print(f"block speedup: {t_bf/t_q:.2f}x")

    # attention share: stub mha via monkeypatch
    real_mha = internvideo2.mha
    internvideo2.mha = lambda q, k, v, **kw: q
    try:
        t_bf_na = timed("noattn_bf16", chain(bp), bp, x)
        t_q_na = timed("noattn_w8a8", chain(bq), bq, x)
    finally:
        internvideo2.mha = real_mha
    print(f"matmul-side speedup: {t_bf_na/t_q_na:.2f}x  "
          f"(attention ≈ {1000*(t_bf - t_bf_na):.2f} ms bf16 / "
          f"{1000*(t_q - t_q_na):.2f} ms w8a8)")

    # ---- GEMM decomposition: where does the W8A8 block time go? ----
    # For each block GEMM shape, three legs (all chained R in-jit):
    #   dot_bf16 — plain XLA bf16 dot (the no-quant MXU baseline)
    #   dot_i8i8 — XLA int8xint8 dot, activations PRE-quantized (pure int8
    #              MXU rate; excludes quant machinery)
    #   w8a8     — the real ops.int8_matmul path incl. dynamic per-row
    #              activation quant + fp32 dequant epilogue
    # dot legs vs w8a8 legs bound the quant-machinery share; sum of w8a8
    # legs vs block_w8a8 bounds the non-GEMM (elementwise/attention) share.
    from grounded_video_llm_tpu.ops import int8_matmul

    M = CLIPS * S
    x2d = x.reshape(M, cfg.embed_dim)

    def gemm_flops(m, k, n):
        return 2.0 * m * k * n

    for name, w in (("qkv", bp["qkv_kernel"]),
                    ("proj", bp["proj"]["kernel"]),
                    ("fc1", bp["fc1"]["kernel"]),
                    ("fc2", bp["fc2"]["kernel"])):
        K, N = w.shape
        xin = x2d if K == cfg.embed_dim else jnp.zeros((M, K), jnp.bfloat16)
        wq, wscale = quantize_weights_int8(w)
        # pre-quantized activations for the pure-dot leg (same math as
        # dynamic_int8_matmul's in-line quant; on-device — the tunnel is
        # ~50MB/s)
        @jax.jit
        def actq(a):
            af = a.astype(jnp.float32)
            s = jnp.maximum(jnp.max(jnp.abs(af), -1, keepdims=True) / 127.0,
                            1e-8)
            return jnp.clip(jnp.round(af / s), -127, 127).astype(jnp.int8)

        xq8 = actq(xin)

        # chain rule: acc must consume the FULL output (a [:1,:1] slice lets
        # XLA narrow slice-of-dot into a 1x1 dot — first run measured
        # thousands of "TF/s"), and the next iteration's input must depend
        # on acc (else the R identical dots CSE into one). The full-sum
        # epilogue adds ~1-4ms/pass identically to all three legs — read
        # the DELTAS, not the absolutes.
        def dot_bf16(a, wgt):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(R):
                o = jax.lax.dot_general(
                    (a * (1.0 + acc * 0)).astype(a.dtype), wgt,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc + jnp.sum(o)
            return acc

        t = timed(f"dot_bf16_{name}", dot_bf16, xin, w)
        print(f"    -> {gemm_flops(M, K, N)/t/1e12:6.1f} TF/s "
              f"[M={M} K={K} N={N}]")

        def dot_i8(a, wgt):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(R):
                # int8 values are exact in f32; the f32 acc keeps the
                # perturbation un-foldable (integer acc*0 folds to 0)
                pert = (acc * 0).astype(jnp.int8)
                o = jax.lax.dot_general(
                    a + pert, wgt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = acc + jnp.sum(o).astype(jnp.float32)
            return acc

        t = timed(f"dot_i8i8_{name}", dot_i8, xq8, wq)
        print(f"    -> {gemm_flops(M, K, N)/t/1e12:6.1f} TF/s")

        def w8a8_full(a, wgt_q, wgt_s):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(R):
                o = int8_matmul.dynamic_int8_matmul(
                    (a * (1.0 + acc * 0)).astype(a.dtype), wgt_q, wgt_s)
                acc = acc + jnp.sum(o.astype(jnp.float32))
            return acc

        t = timed(f"w8a8_{name}", w8a8_full, xin, wq, wscale)
        print(f"    -> {gemm_flops(M, K, N)/t/1e12:6.1f} TF/s (incl. "
              f"dynamic act quant + dequant)")


if __name__ == "__main__":
    main()
