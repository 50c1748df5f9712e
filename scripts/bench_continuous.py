"""Continuous batching vs lockstep under RAGGED output lengths (real TPU).

The whole motivation for slot-level continuous batching (serve/continuous.py)
is ragged generation: in lockstep batching every sequence decodes until the
LONGEST one finishes, burning pool-wide steps on finished rows. This measures
both engines on the same ragged workload — N requests with per-request token
budgets drawn from a geometric-ish 8..256 mix — and reports:

  * useful generated tokens/sec (the aggregate-throughput axis)
  * p50 / p95 per-request completion latency, all requests arriving at t=0
  * the continuous engine's admission-stall share (batch-1 prefill between
    chunks blocks the whole pool — serve/continuous.py docstring)

Device-only workload (synthetic pixels, int8 serving stack, flagship
Phi-3.5) — video decode is benchmarked by bench.py; this isolates the
serving-engine comparison. Beyond-parity axis: the reference serves one
request at a time (SURVEY §3.5).

Usage: python scripts/bench_continuous.py [n_requests] [pool_size]
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
PROMPT_LEN = 64
CHUNK = 8
MAX_NEW = 256
EOS = -1  # disabled: budgets define the exact ragged lengths
PAD = 0


def make_budgets(n, rng):
    """Geometric-flavored mix over {32, 64, 128, 256} (short replies dominate
    real serving). Coarse buckets keep the LOCKSTEP baseline's compile count
    bounded — each distinct max_new compiles its own decode program (~5-10
    min remote); the continuous engine needs only its one chunk program."""
    return rng.choice([32, 64, 128, 256], size=n,
                      p=[0.4, 0.3, 0.2, 0.1]).astype(int).tolist()


def main():
    from grounded_video_llm_tpu.core.config import vlm_config
    from grounded_video_llm_tpu.models import vlm
    from grounded_video_llm_tpu.serve import continuous as cont
    from grounded_video_llm_tpu.serve.continuous import (ContinuousServer,
                                                         Request)
    from grounded_video_llm_tpu.serve.generate import generate_tokens
    from grounded_video_llm_tpu.serve.quantize import quantize_llm_for_serving
    from grounded_video_llm_tpu.text.templates import IMAGE_TOKEN_INDEX

    print(f"devices: {jax.devices()}  N={N} pool={POOL} chunk={CHUNK}",
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
    budgets = make_budgets(N, rng)
    print(f"budgets: {sorted(budgets)}", file=sys.stderr)

    ids = rng.integers(3, 30000, size=(N, PROMPT_LEN)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    # uint8 pixels = the real serving format (decoded frames; on-device
    # normalize); f32 pixels quadruple the host→device tunnel transfer that
    # dominates admission cost
    spatial = np.zeros((cfg.num_segs, 336, 336, 3), np.uint8)
    temporal = np.zeros((cfg.num_frames, 224, 224, 3), np.uint8)
    reqs = [Request(ids[i], np.ones(PROMPT_LEN, np.int32), spatial, temporal,
                    max_new_tokens=budgets[i]) for i in range(N)]
    useful_tokens = sum(budgets)

    # ---------------- continuous engine ----------------
    server = ContinuousServer(params, cfg, pool_size=POOL,
                              prompt_len=PROMPT_LEN, max_new_tokens=MAX_NEW,
                              chunk=CHUNK, eos_token_id=EOS,
                              pad_token_id=PAD)

    # instrument admission vs decode time + per-request completion
    admit_t = [0.0]
    chunk_t = [0.0]
    done_at = {}
    real_admit, real_chunk = server._admit, server._run_chunk

    def timed_admit(pending, emitted, results):
        before = set(results)
        n0 = len(pending)
        t = time.time()
        real_admit(pending, emitted, results)
        dt = time.time() - t
        admit_t[0] += dt
        if n0 != len(pending):
            print(f"  admit {n0 - len(pending)} req in {dt:.2f}s",
                  file=sys.stderr)
        for rid in set(results) - before:
            done_at[rid] = time.time()

    def timed_chunk(emitted, results, **kw):
        before = set(results)
        t = time.time()
        real_chunk(emitted, results, **kw)
        chunk_t[0] += time.time() - t
        for rid in set(results) - before:
            done_at[rid] = time.time()

    # warmup compile THROUGH the same server (same pool shapes → the same
    # prefill/chunk programs the measured run uses; a separate warm server
    # would hold a second 4.5GB pool cache and OOM the chip). Two requests so
    # every admission-bucket program the measured run can hit is compiled
    # (with admit_batch=1 that's bucket 1, exercised twice).
    t = time.time()
    server.serve([reqs[0]._replace(max_new_tokens=CHUNK + 1),
                  reqs[1]._replace(max_new_tokens=CHUNK + 1)])
    print(f"continuous compile+warmup: {time.time()-t:.1f}s", file=sys.stderr)

    server._admit = timed_admit
    server._run_chunk = timed_chunk
    t_start = time.time()
    outs = server.serve(reqs)
    cont_wall = time.time() - t_start
    got_tokens = sum(len(o) for o in outs)
    lat = np.asarray(sorted(done_at[i] - t_start for i in range(N)))
    cont_tps = got_tokens / cont_wall
    print(f"continuous: {cont_wall:.2f}s wall, {got_tokens} tokens "
          f"({cont_tps:.1f} tok/s) | admit (batch-1 prefill) {admit_t[0]:.2f}s "
          f"({100*admit_t[0]/cont_wall:.0f}%), decode {chunk_t[0]:.2f}s | "
          f"latency p50 {np.percentile(lat, 50):.2f}s "
          f"p95 {np.percentile(lat, 95):.2f}s", file=sys.stderr)

    # free the pool cache before lockstep allocates its own (HBM headroom)
    import gc

    server.state = None
    gc.collect()

    # ---------------- prefix-KV admission (optional leg) ----------------
    # repeated-video serving: ONE shared [pre | video tokens] prefix, each
    # request admits with only its question-chunk prefill
    # (_prefill_batch_from_prefix). BENCH_CONT_PREFIX=1 enables.
    prefix_stats = None
    if os.environ.get("BENCH_CONT_PREFIX", "0") == "1":
        from grounded_video_llm_tpu.serve.generate import build_prefix_kv

        posts = ids[:, 2:]                       # after [pre, IMG]
        pre_arr = jnp.asarray(ids[:1, :1])
        feats = jnp.zeros((1, cfg.num_video_tokens, cfg.llm.hidden_size),
                          jnp.bfloat16)
        server2 = ContinuousServer(
            params, cfg, pool_size=POOL, prompt_len=posts.shape[1],
            max_new_tokens=MAX_NEW, chunk=CHUNK, eos_token_id=EOS,
            pad_token_id=PAD, prefix_len=1 + cfg.num_video_tokens)
        prefix = build_prefix_kv(params, cfg, pre_arr,
                                 jnp.ones_like(pre_arr), feats,
                                 server2.max_len)
        jax.block_until_ready(prefix)
        reqs2 = [Request(posts[i], np.ones(posts.shape[1], np.int32), None,
                         None, max_new_tokens=budgets[i], prefix=prefix)
                 for i in range(N)]
        t = time.time()
        server2.serve([reqs2[0]._replace(max_new_tokens=CHUNK + 1),
                       reqs2[1]._replace(max_new_tokens=CHUNK + 1)])
        print(f"prefix compile+warmup: {time.time()-t:.1f}s",
              file=sys.stderr)
        admit2, chunk2, done2 = [0.0], [0.0], {}
        ra, rc = server2._admit, server2._run_chunk

        def timed_admit2(pending, emitted, results):
            before = set(results)
            t = time.time()
            ra(pending, emitted, results)
            admit2[0] += time.time() - t
            for rid in set(results) - before:
                done2[rid] = time.time()

        def timed_chunk2(emitted, results, **kw):
            before = set(results)
            t = time.time()
            rc(emitted, results, **kw)
            chunk2[0] += time.time() - t
            for rid in set(results) - before:
                done2[rid] = time.time()

        server2._admit, server2._run_chunk = timed_admit2, timed_chunk2
        t_start = time.time()
        outs2 = server2.serve(reqs2)
        wall2 = time.time() - t_start
        toks2 = sum(len(o) for o in outs2)
        lat2 = np.asarray(sorted(done2[i] - t_start for i in range(N)))
        prefix_stats = {
            "prefix_tok_per_sec": round(toks2 / wall2, 2),
            "prefix_admit_stall_frac": round(admit2[0] / wall2, 3),
            "prefix_p50_s": round(float(np.percentile(lat2, 50)), 2),
            "prefix_p95_s": round(float(np.percentile(lat2, 95)), 2),
        }
        print(f"prefix-admission: {wall2:.2f}s wall, {toks2} tokens "
              f"({toks2 / wall2:.1f} tok/s) | admit {admit2[0]:.2f}s "
              f"({100*admit2[0]/wall2:.0f}%), decode {chunk2[0]:.2f}s | "
              f"p50 {np.percentile(lat2, 50):.2f}s "
              f"p95 {np.percentile(lat2, 95):.2f}s", file=sys.stderr)
        server2.state = None
        gc.collect()

        # -------- SHARED-PREFIX pool (cascade continuous) -----------------
        # the plain prefix pool above holds a COPY of the ~3.5k-token prefix
        # in every slot — decode streams it POOL times per token. The
        # cascade pool (shared_prefix=True) pins the prefix once at batch
        # dim 1 (llm.decode_step_shared chunks): decode DMA per token drops
        # from POOL x (Sp + tail) to Sp + POOL x tail.
        server3 = ContinuousServer(
            params, cfg, pool_size=POOL, prompt_len=posts.shape[1],
            max_new_tokens=MAX_NEW, chunk=CHUNK, eos_token_id=EOS,
            pad_token_id=PAD, prefix_len=1 + cfg.num_video_tokens,
            shared_prefix=True)
        t = time.time()
        server3.serve([reqs2[0]._replace(max_new_tokens=CHUNK + 1),
                       reqs2[1]._replace(max_new_tokens=CHUNK + 1)])
        print(f"shared-prefix pool compile+warmup: {time.time()-t:.1f}s",
              file=sys.stderr)
        admit3, chunk3, done3 = [0.0], [0.0], {}
        ra3, rc3 = server3._admit, server3._run_chunk

        def timed_admit3(pending, emitted, results):
            before = set(results)
            t = time.time()
            ra3(pending, emitted, results)
            admit3[0] += time.time() - t
            for rid in set(results) - before:
                done3[rid] = time.time()

        def timed_chunk3(emitted, results, **kw):
            before = set(results)
            t = time.time()
            rc3(emitted, results, **kw)
            chunk3[0] += time.time() - t
            for rid in set(results) - before:
                done3[rid] = time.time()

        server3._admit, server3._run_chunk = timed_admit3, timed_chunk3
        t_start = time.time()
        outs3 = server3.serve(reqs2)
        wall3 = time.time() - t_start
        toks3 = sum(len(o) for o in outs3)
        lat3 = np.asarray(sorted(done3[i] - t_start for i in range(N)))
        prefix_stats.update({
            "prefix_shared_tok_per_sec": round(toks3 / wall3, 2),
            "prefix_shared_admit_stall_frac": round(admit3[0] / wall3, 3),
            "prefix_shared_p50_s": round(float(np.percentile(lat3, 50)), 2),
            "prefix_shared_p95_s": round(float(np.percentile(lat3, 95)), 2),
        })
        print(f"prefix-shared-pool: {wall3:.2f}s wall, {toks3} tokens "
              f"({toks3 / wall3:.1f} tok/s) | admit {admit3[0]:.2f}s "
              f"({100*admit3[0]/wall3:.0f}%), decode {chunk3[0]:.2f}s | "
              f"p50 {np.percentile(lat3, 50):.2f}s "
              f"p95 {np.percentile(lat3, 95):.2f}s", file=sys.stderr)
        server3.state = None
        gc.collect()

        # -------- shared pool + LONGEST-FIRST admission (LPT) -------------
        # FIFO admission lets the 256-budget requests start late and drain
        # the pool at low occupancy; longest-declared-budget-first admission
        # (the LPT makespan heuristic, using the same declared budgets the
        # sorted-lockstep oracle sorts by — but online) starts them first.
        # Same pool shapes → reuses server3's compiled programs.
        server4 = ContinuousServer(
            params, cfg, pool_size=POOL, prompt_len=posts.shape[1],
            max_new_tokens=MAX_NEW, chunk=CHUNK, eos_token_id=EOS,
            pad_token_id=PAD, prefix_len=1 + cfg.num_video_tokens,
            shared_prefix=True, admission_policy="longest_first")
        server4.serve([reqs2[0]._replace(max_new_tokens=CHUNK + 1)])
        admit4, chunk4, done4 = [0.0], [0.0], {}
        ra4, rc4 = server4._admit, server4._run_chunk

        def timed_admit4(pending, emitted, results):
            before = set(results)
            t = time.time()
            ra4(pending, emitted, results)
            admit4[0] += time.time() - t
            for rid in set(results) - before:
                done4[rid] = time.time()

        def timed_chunk4(emitted, results, **kw):
            before = set(results)
            t = time.time()
            rc4(emitted, results, **kw)
            chunk4[0] += time.time() - t
            for rid in set(results) - before:
                done4[rid] = time.time()

        server4._admit, server4._run_chunk = timed_admit4, timed_chunk4
        t_start = time.time()
        outs4 = server4.serve(reqs2)
        wall4 = time.time() - t_start
        toks4 = sum(len(o) for o in outs4)
        lat4 = np.asarray(sorted(done4[i] - t_start for i in range(N)))
        prefix_stats.update({
            "prefix_shared_lpt_tok_per_sec": round(toks4 / wall4, 2),
            "prefix_shared_lpt_p50_s": round(float(np.percentile(lat4, 50)),
                                             2),
            "prefix_shared_lpt_p95_s": round(float(np.percentile(lat4, 95)),
                                             2),
        })
        print(f"prefix-shared-pool[longest-first]: {wall4:.2f}s wall, "
              f"{toks4} tokens ({toks4 / wall4:.1f} tok/s) | admit "
              f"{admit4[0]:.2f}s, decode {chunk4[0]:.2f}s | "
              f"p50 {np.percentile(lat4, 50):.2f}s "
              f"p95 {np.percentile(lat4, 95):.2f}s", file=sys.stderr)
        server4.state = None
        gc.collect()

        # -------- + adaptive TAIL chunk (chunk_long) ----------------------
        # amortizes the per-chunk dispatch 4x over the straggler tail when
        # every in-flight budget covers the long chunk. MEASURED A WASH
        # same-process (1.004x, BENCH_TAIL_CHUNK_r04.txt / the focused
        # scripts/bench_tail_chunk.py): async enqueue already overlaps the
        # dispatch. Leg kept for regression tracking on other backends.
        CHUNK_LONG = int(os.environ.get("BENCH_CHUNK_LONG", "32"))
        server5 = ContinuousServer(
            params, cfg, pool_size=POOL, prompt_len=posts.shape[1],
            max_new_tokens=MAX_NEW, chunk=CHUNK, eos_token_id=EOS,
            pad_token_id=PAD, prefix_len=1 + cfg.num_video_tokens,
            shared_prefix=True, admission_policy="longest_first",
            chunk_long=CHUNK_LONG)
        t = time.time()
        # warm the long-chunk program too: one lone request whose budget
        # covers a long chunk decodes through the tail path
        server5.serve([reqs2[0]._replace(
            max_new_tokens=CHUNK_LONG + CHUNK + 1)])
        print(f"chunk_long warmup: {time.time()-t:.1f}s", file=sys.stderr)
        admit5, chunk5, done5 = [0.0], [0.0], {}
        ra5, rc5 = server5._admit, server5._run_chunk

        def timed_admit5(pending, emitted, results):
            before = set(results)
            t = time.time()
            ra5(pending, emitted, results)
            admit5[0] += time.time() - t
            for rid in set(results) - before:
                done5[rid] = time.time()

        def timed_chunk5(emitted, results, **kw):
            before = set(results)
            t = time.time()
            rc5(emitted, results, **kw)
            chunk5[0] += time.time() - t
            for rid in set(results) - before:
                done5[rid] = time.time()

        server5._admit, server5._run_chunk = timed_admit5, timed_chunk5
        t_start = time.time()
        outs5 = server5.serve(reqs2)
        wall5 = time.time() - t_start
        toks5 = sum(len(o) for o in outs5)
        lat5 = np.asarray(sorted(done5[i] - t_start for i in range(N)))
        prefix_stats.update({
            "prefix_shared_lpt_tail_tok_per_sec": round(toks5 / wall5, 2),
            "prefix_shared_lpt_tail_p50_s": round(
                float(np.percentile(lat5, 50)), 2),
            "prefix_shared_lpt_tail_p95_s": round(
                float(np.percentile(lat5, 95)), 2),
            "chunk_long": CHUNK_LONG,
        })
        print(f"prefix-shared-pool[longest-first+chunk_long{CHUNK_LONG}]: "
              f"{wall5:.2f}s wall, {toks5} tokens ({toks5 / wall5:.1f} "
              f"tok/s) | admit {admit5[0]:.2f}s, decode {chunk5[0]:.2f}s | "
              f"p50 {np.percentile(lat5, 50):.2f}s "
              f"p95 {np.percentile(lat5, 95):.2f}s", file=sys.stderr)
        server5.state = None
        gc.collect()

        # -------- + PIPELINED chunk loop (dispatch k+1 before fetch k) ----
        # the r4 residual attribution (370.2 vs 409.7 oracle lockstep) named
        # the per-chunk host token fetch; pipeline_chunks overlaps it with
        # device execution (uniform-budget control measured 1.28x,
        # BENCH_CHUNK_SYNC_r05.txt). Same pool shapes (margin 2x chunk stays
        # within the 128 rounding) → reuses the compiled programs.
        server6 = ContinuousServer(
            params, cfg, pool_size=POOL, prompt_len=posts.shape[1],
            max_new_tokens=MAX_NEW, chunk=CHUNK, eos_token_id=EOS,
            pad_token_id=PAD, prefix_len=1 + cfg.num_video_tokens,
            shared_prefix=True, admission_policy="longest_first",
            pipeline_chunks=True)
        assert server6.max_len == server2.max_len, (
            server6.max_len, server2.max_len)
        server6.serve([reqs2[0]._replace(max_new_tokens=CHUNK + 1),
                       reqs2[1]._replace(max_new_tokens=CHUNK + 1)])
        admit6, done6 = [0.0], {}
        ra6, rp6 = server6._admit, server6._process_chunk

        def timed_admit6(pending, emitted, results):
            before = set(results)
            t = time.time()
            ra6(pending, emitted, results)
            admit6[0] += time.time() - t
            for rid in set(results) - before:
                done6[rid] = time.time()

        def timed_process6(inflight, emitted, results):
            before = set(results)
            rp6(inflight, emitted, results)
            for rid in set(results) - before:
                done6[rid] = time.time()

        server6._admit, server6._process_chunk = timed_admit6, timed_process6
        t_start = time.time()
        outs6 = server6.serve(reqs2)
        wall6 = time.time() - t_start
        toks6 = sum(len(o) for o in outs6)
        for i in range(N):
            np.testing.assert_array_equal(outs6[i], outs4[i])
        lat6 = np.asarray(sorted(done6[i] - t_start for i in range(N)))
        prefix_stats.update({
            "prefix_shared_lpt_pipe_tok_per_sec": round(toks6 / wall6, 2),
            "prefix_shared_lpt_pipe_p50_s": round(
                float(np.percentile(lat6, 50)), 2),
            "prefix_shared_lpt_pipe_p95_s": round(
                float(np.percentile(lat6, 95)), 2),
        })
        print(f"prefix-shared-pool[longest-first+pipeline]: {wall6:.2f}s "
              f"wall, {toks6} tokens ({toks6 / wall6:.1f} tok/s, outputs == "
              f"non-pipelined) | admit {admit6[0]:.2f}s | "
              f"p50 {np.percentile(lat6, 50):.2f}s "
              f"p95 {np.percentile(lat6, 95):.2f}s", file=sys.stderr)
        server6.state = None
        gc.collect()

        # -------- prefix-cached LOCKSTEP baseline (same shared prefix) ----
        # isolates the SCHEDULING contribution: both legs pay only the
        # question-chunk prefill, so prefix-continuous ÷ prefix-lockstep is
        # continuous batching alone, with no prefill-cost asymmetry (the
        # earlier 272.9-vs-62.8 headline mixed the two optimizations).
        # cascade decode (shared_prefix=True) = the strongest lockstep form.
        from grounded_video_llm_tpu.serve.generate import (
            generate_tokens_from_prefix)

        pre_k, pre_v, pre_m = prefix   # build_prefix_kv returns (k, v, mask)

        def run_prefix_lockstep(order, label):
            t_start = time.time()
            lats, tokens = [], 0
            for i in range(0, N, POOL):
                chunk_ids = order[i:i + POOL]
                b = len(chunk_ids)
                bud = max(budgets[j] for j in chunk_ids)
                toks, _ = generate_tokens_from_prefix(
                    params, cfg, jnp.asarray(np.asarray(posts)[chunk_ids]),
                    jnp.ones((b, posts.shape[1]), jnp.int32),
                    pre_k, pre_v, pre_m,
                    jax.random.key(0), max_new_tokens=bud,
                    temperature=0.0, do_sample=False, eos_token_id=EOS,
                    pad_token_id=PAD, quantize_cache=True,
                    shared_prefix=True)
                np.asarray(toks)
                tokens += sum(min(budgets[j], bud) for j in chunk_ids)
                lats.extend([time.time() - t_start] * b)
            wall = time.time() - t_start
            lats = np.asarray(lats)
            print(f"prefix-lockstep[{label}]: {wall:.2f}s wall, {tokens} "
                  f"useful tokens ({tokens / wall:.1f} tok/s) | p50 "
                  f"{np.percentile(lats, 50):.2f}s "
                  f"p95 {np.percentile(lats, 95):.2f}s", file=sys.stderr)
            return tokens / wall

        porder = list(range(N))
        psrt = sorted(porder, key=lambda j: budgets[j])
        run_prefix_lockstep(porder, "arrival-cold")
        p_arr = run_prefix_lockstep(porder, "arrival")
        run_prefix_lockstep(psrt, "sorted-cold")
        p_srt = run_prefix_lockstep(psrt, "sorted")
        best_pl = max(p_arr, p_srt)
        prefix_stats["prefix_lockstep_tok_per_sec"] = round(best_pl, 2)
        prefix_stats["prefix_sched_only_speedup"] = round(
            prefix_stats["prefix_tok_per_sec"] / best_pl, 3)
        prefix_stats["prefix_shared_vs_lockstep"] = round(
            prefix_stats["prefix_shared_tok_per_sec"] / best_pl, 3)
        prefix_stats["prefix_shared_lpt_vs_lockstep"] = round(
            prefix_stats["prefix_shared_lpt_tok_per_sec"] / best_pl, 3)
        if "prefix_shared_lpt_tail_tok_per_sec" in prefix_stats:
            prefix_stats["prefix_shared_lpt_tail_vs_lockstep"] = round(
                prefix_stats["prefix_shared_lpt_tail_tok_per_sec"]
                / best_pl, 3)
        gc.collect()

    # ---------------- lockstep engine ----------------
    # batches of POOL, sorted-by-budget admission is the STRONGEST lockstep
    # baseline (minimizes in-batch raggedness) — report both orders
    def run_lockstep(order, label):
        t_start = time.time()
        lats = []
        tokens = 0
        for i in range(0, N, POOL):
            chunk_ids = order[i:i + POOL]
            b = len(chunk_ids)
            bud = max(budgets[j] for j in chunk_ids)
            toks, length = generate_tokens(
                params, cfg,
                jnp.asarray(ids[chunk_ids]),
                jnp.ones((b, PROMPT_LEN), jnp.int32),
                jnp.asarray(np.repeat(spatial[None], b, 0)),
                jnp.asarray(np.repeat(temporal[None], b, 0)),
                jax.random.key(0), max_new_tokens=bud, temperature=0.0,
                do_sample=False, eos_token_id=EOS, pad_token_id=PAD,
                quantize_cache=True)
            np.asarray(toks)
            tokens += sum(min(budgets[j], bud) for j in chunk_ids)
            lats.extend([time.time() - t_start] * b)
        wall = time.time() - t_start
        lats = np.asarray(lats)
        print(f"lockstep[{label}]: {wall:.2f}s wall, {tokens} useful tokens "
              f"({tokens / wall:.1f} tok/s) | latency "
              f"p50 {np.percentile(lats, 50):.2f}s "
              f"p95 {np.percentile(lats, 95):.2f}s", file=sys.stderr)
        return tokens / wall, wall

    # arrival order (what a queue would see) and sorted-by-budget (the
    # strongest lockstep baseline). NOTE each distinct (batch, max_new)
    # compiles its own decode program — wall time excludes nothing, so the
    # first pass carries compiles; run arrival twice and keep the warm one.
    order = list(range(N))
    srt = sorted(order, key=lambda j: budgets[j])
    run_lockstep(order, "arrival-cold")
    arr_tps, _ = run_lockstep(order, "arrival")
    run_lockstep(srt, "sorted-cold")
    srt_tps, _ = run_lockstep(srt, "sorted")

    import json

    out = {
        "metric": "continuous_vs_lockstep_ragged_tok_per_sec",
        "continuous": round(cont_tps, 2),
        "lockstep_arrival": round(arr_tps, 2),
        "lockstep_sorted": round(srt_tps, 2),
        "speedup_vs_best_lockstep": round(cont_tps / max(arr_tps, srt_tps), 3),
        "admit_stall_frac": round(admit_t[0] / cont_wall, 3),
        "useful_tokens": useful_tokens,
    }
    if prefix_stats:
        out.update(prefix_stats)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
