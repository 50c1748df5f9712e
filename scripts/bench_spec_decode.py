"""Speculative-decode economics on the real chip.

Decode is DMA-bound (the int8 cache + weight stacks stream once per token;
CLAUDE.md: every compute-side lever measured a dead end at the ~515 GB/s
plateau). A verify pass streams them ONCE for S = draft_len+1 candidate
tokens (llm.verify_step), so the cost ratio t_verify(S)/t_decode is the
whole story: with per-draft acceptance α, committed tokens/pass is
E(α,S) = 1 + α + ... + α^{S-1}, and spec decode wins iff
E(α,S) > t_verify(S)/t_decode.

This script measures t_decode (decode_step chained in-jit, CLAUDE.md
protocol) and t_verify for draft_len ∈ {1, 3, 7} at the flagship serving
shapes (phi3.5 int8 stack, batch 6, cache ~3.6k), then prints the implied
speedup table over α. The exactness of the verify math is covered by
tests/test_spec_decode.py + scripts/verify_kernels.py; this is the perf
artifact.

Usage: python scripts/bench_spec_decode.py [batch]
"""

import functools as _ft
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 6
DRAFT_LENS = (1, 3, 7)
N_DEC = 32          # chained decode steps per timed call
N_VER = 16          # chained verify passes per timed call


def main():
    from grounded_video_llm_tpu.core.config import vlm_config
    from grounded_video_llm_tpu.models import llm, vlm
    from grounded_video_llm_tpu.serve.quantize import quantize_llm_for_serving

    print(f"devices: {jax.devices()} batch={B}")
    cfg = vlm_config(os.environ.get("BENCH_MODEL", "phi3.5"),
                     stage="inference")
    params = jax.jit(lambda k: vlm.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0))
    llm_params = jax.jit(_ft.partial(quantize_llm_for_serving, w8a8=True),
                         donate_argnums=0)(dict(params)["llm"])
    jax.block_until_ready(llm_params)

    S_full = 64 - 1 + cfg.num_video_tokens
    max_len = -(-(S_full + 64 + 8) // 128) * 128
    embeds = jnp.zeros((B, S_full, cfg.llm.hidden_size), jnp.bfloat16)
    mask = jnp.ones((B, S_full), jnp.int32)
    cache0 = llm.KVCache(jnp.zeros((1, 1, max_len, 1, 1), jnp.bfloat16),
                         jnp.zeros((1, 1, max_len, 1, 1), jnp.bfloat16),
                         jnp.zeros((1,), jnp.int32))
    _, cache = jax.jit(
        lambda p, e: llm.prefill(p, cfg.llm, e, mask, cache0,
                                 quantize_cache=True))(llm_params, embeds)
    valid = jnp.zeros((B, max_len), bool).at[:, :S_full].set(True)
    print(f"prefilled: S_full={S_full} max_len={max_len}", flush=True)

    # ---- baseline: decode_step ----
    tok = jnp.zeros((B, 1, cfg.llm.hidden_size), jnp.bfloat16)

    def dec(p, t):
        def body(i, carry):
            c, v, acc = carry
            lg, c, v = llm.decode_step(p, cfg.llm, t * (1.0 + acc * 0), c, v,
                                       jnp.full((B,), S_full, jnp.int32) + i)
            return (c, v, acc + jnp.sum(lg.astype(jnp.float32)))
        _, _, acc = jax.lax.fori_loop(
            0, N_DEC, body, (cache, valid, jnp.zeros((), jnp.float32)))
        return acc

    f = jax.jit(dec)
    t0 = time.time()
    np.asarray(f(llm_params, tok))
    print(f"{'decode_step':16s} compile {time.time()-t0:6.1f}s",
          end="  ", flush=True)
    t0 = time.time()
    np.asarray(f(llm_params, tok))
    t_dec = (time.time() - t0) / N_DEC
    print(f"{t_dec*1000:8.2f} ms/pass  (1 token)")

    # ---- verify passes ----
    t_ver = {}
    for K in DRAFT_LENS:
        S_v = K + 1
        toks = jnp.zeros((B, S_v, cfg.llm.hidden_size), jnp.bfloat16)
        pos = jnp.full((B,), S_full, jnp.int32)[:, None] + jnp.arange(S_v)

        def ver(p, t, S_v=S_v):
            def body(i, carry):
                c, acc = carry
                lg, c = llm.verify_step(p, cfg.llm, t * (1.0 + acc * 0), c,
                                        valid, pos)
                return (c, acc + jnp.sum(lg.astype(jnp.float32)))
            _, acc = jax.lax.fori_loop(
                0, N_VER, body, (cache, jnp.zeros((), jnp.float32)))
            return acc

        f = jax.jit(ver)
        t0 = time.time()
        np.asarray(f(llm_params, toks))
        print(f"verify_step S={S_v:2d}  compile {time.time()-t0:6.1f}s",
              end="  ", flush=True)
        t0 = time.time()
        np.asarray(f(llm_params, toks))
        t_ver[K] = (time.time() - t0) / N_VER
        print(f"{t_ver[K]*1000:8.2f} ms/pass  "
              f"(ratio {t_ver[K]/t_dec:5.2f}x for {S_v} tokens)")

    # ---- implied speedups ----
    print(f"\nimplied decode speedup (t_dec={t_dec*1000:.2f} ms/tok):")
    alphas = (0.0, 0.3, 0.5, 0.7, 0.8, 0.9)
    print("  draft_len | " + " | ".join(f"α={a:.1f}" for a in alphas))
    for K in DRAFT_LENS:
        row = []
        for a in alphas:
            exp_tokens = sum(a ** i for i in range(K + 1))
            row.append(f"{exp_tokens * t_dec / t_ver[K]:5.2f}")
        print(f"  {K:9d} | " + " | ".join(row))
    import json
    print(json.dumps({"t_decode_ms": round(t_dec * 1000, 3),
                      **{f"t_verify_s{K+1}_ms": round(t_ver[K] * 1000, 3)
                         for K in DRAFT_LENS}}))


if __name__ == "__main__":
    main()
