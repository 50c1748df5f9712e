"""Does per-chunk host sync (dispatch + token fetch) cost the decode pool?

bench_tail_chunk.py's adaptive-gate A/B was a wash, but under LPT admission
the pool almost always holds a freshly-admitted short-budget row, so the
all-rows-covered gate may never fire — the wash does not by itself separate
"dispatch/fetch overlaps" from "the long chunk never ran". This isolates the
question: UNIFORM budgets, one pool fill (N = pool), decode served with
chunk=8 vs chunk=32 POOL-WIDE from the first step (two plain servers, no
adaptive gate). 4x fewer _decode_chunk dispatches + np.asarray token fetches
for identical device work — any gap is pure per-chunk host-sync overhead.

A third leg serves chunk=8 with pipeline_chunks=True (dispatch chunk k+1
before fetching chunk k's tokens): if the chunk8→chunk32 gap really is
host sync, the pipelined chunk8 server should recover most of it WITHOUT
giving up chunk-8 admission/retirement granularity.

Interleaved A/B/P/A/B/P, same-process (box-drift rule). Also reports the
chunk dispatches actually RUN by each server.

Usage: python scripts/bench_chunk_sync.py [pool] [budget]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

POOL = int(sys.argv[1]) if len(sys.argv) > 1 else 6
BUDGET = int(sys.argv[2]) if len(sys.argv) > 2 else 240
PROMPT_LEN = 64
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

    print(f"devices: {jax.devices()}  pool={POOL} budget={BUDGET}",
          file=sys.stderr)
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
    ids = rng.integers(3, 30000, size=(POOL, PROMPT_LEN)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    posts = ids[:, 2:]
    pre_arr = jnp.asarray(ids[:1, :1])
    feats = jnp.zeros((1, cfg.num_video_tokens, cfg.llm.hidden_size),
                      jnp.bfloat16)

    def make_server(chunk, pipeline=False):
        # identical max_new_tokens for every server (NOT BUDGET+chunk): the
        # chunk-margin term differs per flavor, and after 128-rounding a
        # mismatched max_len would give one leg a different RoPE envelope
        # (or a _pin_shared_prefix ValueError) — the caches must match
        return ContinuousServer(
            params, cfg, pool_size=POOL, prompt_len=posts.shape[1],
            max_new_tokens=BUDGET + 32, chunk=chunk, eos_token_id=EOS,
            pad_token_id=PAD, prefix_len=1 + cfg.num_video_tokens,
            shared_prefix=True, pipeline_chunks=pipeline)

    s8, s32 = make_server(8), make_server(32)
    sp8 = make_server(8, pipeline=True)
    assert s8.max_len == s32.max_len == sp8.max_len, \
        (s8.max_len, s32.max_len, sp8.max_len)
    prefix = build_prefix_kv(params, cfg, pre_arr, jnp.ones_like(pre_arr),
                             feats, s8.max_len)
    jax.block_until_ready(prefix)
    reqs = [Request(posts[i], np.ones(posts.shape[1], np.int32), None, None,
                    max_new_tokens=BUDGET, prefix=prefix)
            for i in range(POOL)]

    for s, name in ((s8, "chunk8"), (s32, "chunk32"), (sp8, "pipe8")):
        t = time.time()
        s.serve([reqs[0]._replace(max_new_tokens=s.chunk + 1)])
        print(f"{name} compile+warmup: {time.time()-t:.1f}s", file=sys.stderr)

    def run(server, label):
        nchunks = [0]
        real = server._dispatch_chunk

        def counting(**kw):
            nchunks[0] += 1
            return real(**kw)

        server._dispatch_chunk = counting
        t_start = time.time()
        outs = server.serve(list(reqs))
        wall = time.time() - t_start
        server._dispatch_chunk = real
        toks = sum(len(o) for o in outs)
        print(f"{label}: {wall:.2f}s wall, {toks} tokens "
              f"({toks / wall:.1f} tok/s), {nchunks[0]} chunk dispatches "
              f"({1000 * wall / nchunks[0]:.1f} ms/chunk)", file=sys.stderr)
        return toks / wall

    a1 = run(s8, "uniform[chunk8]  pass1")
    b1 = run(s32, "uniform[chunk32] pass1")
    p1 = run(sp8, "uniform[pipe8]   pass1")
    a2 = run(s8, "uniform[chunk8]  pass2")
    b2 = run(s32, "uniform[chunk32] pass2")
    p2 = run(sp8, "uniform[pipe8]   pass2")

    import json

    a, b, p = max(a1, a2), max(b1, b2), max(p1, p2)
    print(json.dumps({
        "metric": "cascade_pool_chunk_sync_tok_per_sec",
        "chunk8": round(a, 2), "chunk32": round(b, 2),
        "pipe8": round(p, 2),
        "chunk32_speedup": round(b / a, 3),
        "pipe8_speedup": round(p / a, 3),
        "passes": [round(x, 2) for x in (a1, b1, p1, a2, b2, p2)],
    }))


if __name__ == "__main__":
    main()
