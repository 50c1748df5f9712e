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


if __name__ == "__main__":
    main()
