"""Same-process A/B: adaptive tail chunk (chunk_long) on the cascade pool.

The round-4 serving chain (BENCH_CONT_PREFIX_r04.txt) left a ~10% gap to the
oracle-sorted cascade lockstep (370.2 vs 409.7 tok/s) initially attributed
to chunk dispatch + chunk-granularity retirement. chunk_long attacks the
dispatch half: once the queue is empty and every in-flight budget covers it,
the pool decodes in chunk_long-step programs (4x fewer ~25-30ms tunnel
dispatches over the straggler tail; the budget gate makes overshoot
impossible so the chunk-sized cache margins are untouched).

MEASURED OUTCOME (BENCH_TAIL_CHUNK_r04.txt): a WASH — 391.9 vs 393.5 tok/s
(1.004x, within noise) at chunk_long=32. Chunk dispatches are enqueued
asynchronously, so dispatch latency already overlaps device execution; the
residual vs the oracle lockstep is chunk-granularity retirement plus the
per-chunk host token fetch. chunk_long stays opt-in (default 0) for
backends with synchronous dispatch.

Workload identical to scripts/bench_continuous.py's prefix legs (N=18
ragged 32..256 budgets, pool 6, chunk 8, longest-first admission, shared
prefix). Runs baseline/tail interleaved twice and reports both passes —
same-process adjacency is the only trustworthy comparison on this box
(CLAUDE.md box-drift note).

Usage: python scripts/bench_tail_chunk.py [n_requests] [pool] [chunk_long]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 18
POOL = int(sys.argv[2]) if len(sys.argv) > 2 else 6
CHUNK_LONG = int(sys.argv[3]) if len(sys.argv) > 3 else 32
PROMPT_LEN = 64
CHUNK = 8
MAX_NEW = 256
EOS = -1
PAD = 0


def main():
    from grounded_video_llm_tpu.core.config import vlm_config
    from grounded_video_llm_tpu.models import vlm
    from grounded_video_llm_tpu.serve.continuous import (ContinuousServer,
                                                         Request)
    from grounded_video_llm_tpu.serve.generate import build_prefix_kv
    from grounded_video_llm_tpu.serve.quantize import quantize_llm_for_serving
    from grounded_video_llm_tpu.text.templates import IMAGE_TOKEN_INDEX

    print(f"devices: {jax.devices()}  N={N} pool={POOL} chunk={CHUNK} "
          f"chunk_long={CHUNK_LONG}", file=sys.stderr)
    cfg = vlm_config("phi3.5", stage="inference")
    t0 = time.time()
    params = jax.jit(lambda k: vlm.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0))
    params = dict(params)
    params["llm"] = jax.jit(quantize_llm_for_serving,
                            donate_argnums=0)(params["llm"])
    jax.block_until_ready(params)
    print(f"param init: {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    budgets = rng.choice([32, 64, 128, 256], size=N,
                         p=[0.4, 0.3, 0.2, 0.1]).astype(int).tolist()
    print(f"budgets: {sorted(budgets)}", file=sys.stderr)
    ids = rng.integers(3, 30000, size=(N, PROMPT_LEN)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    posts = ids[:, 2:]
    pre_arr = jnp.asarray(ids[:1, :1])
    feats = jnp.zeros((1, cfg.num_video_tokens, cfg.llm.hidden_size),
                      jnp.bfloat16)

    def make_server(chunk_long):
        return ContinuousServer(
            params, cfg, pool_size=POOL, prompt_len=posts.shape[1],
            max_new_tokens=MAX_NEW, chunk=CHUNK, eos_token_id=EOS,
            pad_token_id=PAD, prefix_len=1 + cfg.num_video_tokens,
            shared_prefix=True, admission_policy="longest_first",
            chunk_long=chunk_long)

    srv = make_server(0)
    prefix = build_prefix_kv(params, cfg, pre_arr, jnp.ones_like(pre_arr),
                             feats, srv.max_len)
    jax.block_until_ready(prefix)
    reqs = [Request(posts[i], np.ones(posts.shape[1], np.int32), None, None,
                    max_new_tokens=budgets[i], prefix=prefix)
            for i in range(N)]

    t = time.time()
    srv.serve([reqs[0]._replace(max_new_tokens=CHUNK + 1)])
    print(f"baseline compile+warmup: {time.time()-t:.1f}s", file=sys.stderr)
    srv_t = make_server(CHUNK_LONG)
    t = time.time()
    srv_t.serve([reqs[0]._replace(max_new_tokens=CHUNK_LONG + CHUNK + 1)])
    print(f"chunk_long compile+warmup: {time.time()-t:.1f}s", file=sys.stderr)

    def run(server, label):
        done = {}
        real = server._run_chunk

        def timed(emitted, results, **kw):
            before = set(results)
            real(emitted, results, **kw)
            for rid in set(results) - before:
                done[rid] = time.time()

        server._run_chunk = timed
        t_start = time.time()
        outs = server.serve(list(reqs))
        wall = time.time() - t_start
        server._run_chunk = real
        toks = sum(len(o) for o in outs)
        lat = np.asarray(sorted(done[i] - t_start for i in range(N)))
        print(f"{label}: {wall:.2f}s wall, {toks} tokens "
              f"({toks / wall:.1f} tok/s) | p50 {np.percentile(lat, 50):.2f}s"
              f" p95 {np.percentile(lat, 95):.2f}s", file=sys.stderr)
        return toks / wall

    # interleaved A/B/A/B: adjacent pairs are the trustworthy comparison
    base1 = run(srv, "lpt-cascade[chunk8]          pass1")
    tail1 = run(srv_t, f"lpt-cascade[chunk_long{CHUNK_LONG}]   pass1")
    base2 = run(srv, "lpt-cascade[chunk8]          pass2")
    tail2 = run(srv_t, f"lpt-cascade[chunk_long{CHUNK_LONG}]   pass2")

    import json

    base, tail = max(base1, base2), max(tail1, tail2)
    print(json.dumps({
        "metric": "cascade_pool_tail_chunk_tok_per_sec",
        "baseline_chunk8": round(base, 2),
        "chunk_long": CHUNK_LONG,
        "with_tail_chunk": round(tail, 2),
        "speedup": round(tail / base, 3),
        "passes": [round(x, 2) for x in (base1, tail1, base2, tail2)],
    }))


if __name__ == "__main__":
    main()
