"""Same-process A/B: square vs chunked-rectangle flash at the grounded shape.

The chunked-rectangle decomposition (ops/flash_attention.py) exists because
the axon compile helper rejects big causal squares (COMPILE_HELPER_REGRESSION
_r04.md). The 2026-08-20 afternoon re-probe (probe_compile2) showed the
helper ACCEPTING causal S=7515 squares again (while still rejecting
noncausal and the scan-accum program — instance nondeterminism), which
finally allows measuring what the workaround costs: this times fwd-only and
fwd+bwd of one flash layer at B=1 S=7515 (phi3.5 grounded spliced shape),
square vs chunked, in ONE process. Env is read at trace time, so each
variant's jit traces under its own GVLLM_FLASH_CHUNK.

Usage: python scripts/probe_square_vs_chunked.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

VARIANTS = [  # (name, GVLLM_FLASH_CHUNK)
    ("chunked_6912", "6912"),     # shipped default: 2x2 rectangles at S=7515
    ("square", "999999"),         # no decomposition: one causal square
]


def main():
    from grounded_video_llm_tpu.ops.flash_attention import flash_mha

    print(f"devices: {jax.devices()}", file=sys.stderr)
    B, S, H, KV, D = 1, 7515, 32, 32, 96
    key = jax.random.key(0)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    kv = jax.random.normal(key, (B, S, KV, D), jnp.bfloat16)

    fns = {}
    for name, chunk in VARIANTS:
        os.environ["GVLLM_FLASH_CHUNK"] = chunk

        def fwd(q, k, v):
            return flash_mha(q, k, v, causal=True)

        def loss(q, k, v):
            return flash_mha(q, k, v, causal=True).astype(jnp.float32).sum()

        ff = jax.jit(fwd)
        fg = jax.jit(jax.grad(loss))
        for kind, f in (("fwd", ff), ("fwd+bwd", fg)):
            t0 = time.time()
            try:
                o = f(q, kv, kv)
                np.asarray(jax.tree_util.tree_leaves(o)[0][0, 0, 0, 0])
            except Exception as e:  # noqa: BLE001
                print(f"{name} {kind}: FAILED {type(e).__name__}: "
                      f"{str(e)[:140]}", file=sys.stderr)
                continue
            print(f"{name} {kind} compile+first: {time.time()-t0:.1f}s",
                  file=sys.stderr)
            fns[(name, kind)] = f
    os.environ["GVLLM_FLASH_CHUNK"] = "6912"

    results = {}
    for rep in range(REPS):
        for (name, kind), f in fns.items():
            t0 = time.time()
            o = f(q, kv, kv)
            np.asarray(jax.tree_util.tree_leaves(o)[0][0, 0, 0, 0])
            dt = time.time() - t0
            results.setdefault(f"{name}_{kind}", []).append(dt)
            print(f"rep{rep} {name:14s} {kind:8s} {dt*1000:.1f} ms",
                  file=sys.stderr)

    import json

    best = {k: round(min(v) * 1000, 1) for k, v in results.items()}
    out = {"metric": "flash_square_vs_chunked_ms_per_layer",
           "shape": f"B{B}xS{S}xH{H}xD{D}", **best}
    for kind in ("fwd", "fwd+bwd"):
        c, s = best.get(f"chunked_6912_{kind}"), best.get(f"square_{kind}")
        if c and s:
            out[f"square_speedup_{kind}"] = round(c / s, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
