"""Same-process A/B: flash BACKWARD block sizes at the grounded shape.

The r3 two-kernel flash bwd fixed block_q/block_k at 128/256 to fit scoped
vmem at the 7.5k grounded sequence. With the chunked-rectangle path the bwd
kernels now see Sq <= ~3758 (B=1) and the per-layer bwd-only cost is ~11 ms
(BENCH_TRAIN_r05.json: flash 41.7 fwd+bwd - 30.8 fwd), 0.35 s of the 3.76 s
step. This sweeps larger blocks to see if the shrink leaves speed on the
table. Env vars are read at TRACE time, so each variant gets its own jit
instance traced under its env (same shapes would otherwise hit one cache).

Usage: python scripts/microbench_flash_bwd_blocks.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

VARIANTS = [  # (block_q, block_k); 0 = shipped default
    ("default_128_256", 0, 0),
    ("bq256_bk256", 256, 256),
    ("bq128_bk512", 128, 512),
    ("bq256_bk512", 256, 512),
]


def main():
    from grounded_video_llm_tpu.ops.flash_attention import flash_mha

    print(f"devices: {jax.devices()}", file=sys.stderr)
    B, S, H, KV, D = 1, 7515, 32, 32, 96  # phi3.5 grounded spliced shape
    key = jax.random.key(0)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    kv = jax.random.normal(key, (B, S, KV, D), jnp.bfloat16)

    fns = {}
    for name, bq, bk in VARIANTS:
        os.environ["GVLLM_FLASH_BWD_BQ"] = str(bq)
        os.environ["GVLLM_FLASH_BWD_BK"] = str(bk)

        def loss(q, k, v):
            return flash_mha(q, k, v, causal=True).astype(jnp.float32).sum()

        f = jax.jit(jax.grad(loss))
        t0 = time.time()
        try:
            dq = f(q, kv, kv)
            np.asarray(dq[0, 0, 0, 0])
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", file=sys.stderr)
            continue
        print(f"{name} compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
        fns[name] = f
    os.environ["GVLLM_FLASH_BWD_BQ"] = "0"
    os.environ["GVLLM_FLASH_BWD_BK"] = "0"

    results = {}
    for rep in range(REPS):
        for name, f in fns.items():
            t0 = time.time()
            dq = f(q, kv, kv)
            np.asarray(dq[0, 0, 0, 0])
            dt = time.time() - t0
            results.setdefault(name, []).append(dt)
            print(f"rep{rep} {name:18s} {dt*1000:.1f} ms", file=sys.stderr)

    import json

    best = {k: round(min(v) * 1000, 1) for k, v in results.items()}
    base = best.get("default_128_256")
    print(json.dumps({
        "metric": "flash_bwd_block_ms_per_layer_fwd_bwd",
        "shape": f"B{B}xS{S}xH{H}xD{D}",
        **best,
        "speedup_vs_default": {k: round(base / v, 3) for k, v in best.items()
                               if base},
    }))


if __name__ == "__main__":
    main()
