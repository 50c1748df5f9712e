"""Feature-cache serving A/B on the real chip: eval-style repeated-query
workloads (Charades-STA test: 3720 queries over 1334 videos ≈ 2.8 q/video).

run_stream re-encodes the video for every query (the reference's behavior,
inference.py:65-123); run_stream_cached encodes each unique video ONCE
(vlm.encode_video_jit at batch 1 — the 12-clip IV2 trunk already fills the
chip at batch 1) and batches queries over cached features through
generate_tokens_from_features. Encode is ~80% of per-request device time at
the headline config, so expected speedup at q/video = r is roughly
  t_uncached / t_cached = (enc + gen) / (enc/r + gen).

A third leg measures PREFIX-KV caching (run_stream_prefix): on top of the
encode dedup, the shared [system | video tokens] prompt head prefills once
per video and each query pays only its question-chunk prefill + decode
(~95% of per-query prefill FLOPs removed at flagship shapes).

Usage: python scripts/bench_feature_cache.py [queries_per_video] [n_videos]
Env: BENCH_MODEL=phi3.5|llama3|vicuna, QPV_BATCH (default 6),
     QPV_TOKENS (default 64), QPV_SPEC=<draft_len> to compound speculative
     decoding on the cached path (0 = lockstep), QPV_PREFIX=0 to skip the
     prefix-KV leg (it forces spec off for that leg — lockstep only).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

QPV = int(sys.argv[1]) if len(sys.argv) > 1 else 3
N_VIDEOS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
BATCH = int(os.environ.get("QPV_BATCH", "6"))
TOKENS = int(os.environ.get("QPV_TOKENS", "64"))
MODEL = os.environ.get("BENCH_MODEL", "phi3.5")
SPEC = int(os.environ.get("QPV_SPEC", "0"))


def main():
    import bench as bench_mod
    from grounded_video_llm_tpu.core.config import (GenerateConfig,
                                                    vlm_config)
    from grounded_video_llm_tpu.serve.engine import InferenceEngine
    from grounded_video_llm_tpu.serve.quantize import init_vlm_params_serving
    from grounded_video_llm_tpu.text.tokenizer import build_test_tokenizer

    bench_mod.ensure_native_decoder()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = vlm_config(MODEL, stage="inference")
    t0 = time.time()
    params = jax.jit(lambda k: init_vlm_params_serving(
        k, cfg, w8a8=True, quantize_encoders=True))(jax.random.key(0))
    jax.block_until_ready(params)
    print(f"param init: {time.time() - t0:.1f}s", file=sys.stderr)

    gen = GenerateConfig(max_new_tokens=TOKENS, do_sample=True,
                         temperature=0.2, quantize_cache=True,
                         spec_draft_len=SPEC)
    tok = build_test_tokenizer(MODEL)
    engine = InferenceEngine(params, cfg, tok, gen_cfg=gen,
                             feature_cache_size=8)

    videos = bench_mod.ensure_bench_videos(N_VIDEOS)
    # eval order: queries interleave videos (annotation files group loosely);
    # the cached path re-sorts by video itself
    paths = [videos[i % N_VIDEOS] for i in range(N_VIDEOS * QPV)]
    prompts = [f"When does \"action {i}\" happen in the video?"
               for i in range(len(paths))]
    n = len(paths)
    print(f"workload: {n} queries over {N_VIDEOS} videos (q/video={QPV}), "
          f"batch={BATCH}, {TOKENS} tokens", file=sys.stderr)

    def timed(label, fn):
        fn()  # warmup: compiles + fills the feature cache
        engine._feature_cache.clear()
        t = time.time()
        fn()
        dt = time.time() - t
        print(f"{label}: {dt:.2f}s = {n / dt:.3f} req/s", file=sys.stderr)
        return n / dt

    uncached = timed("run_stream (re-encode per query)",
                     lambda: engine.run_stream(paths, prompts,
                                               mode="grounding",
                                               batch_size=BATCH))
    cached = timed("run_stream_cached (encode once per video)",
                   lambda: engine.run_stream_cached(paths, prompts,
                                                    mode="grounding",
                                                    batch_size=BATCH))
    print(f"speedup: {cached / uncached:.2f}x at q/video={QPV}",
          file=sys.stderr)
    out = {"metric": "feature_cache_speedup",
           "value": round(cached / uncached, 3),
           "unit": f"x_vs_reencode_qpv{QPV}",
           "req_per_s_cached": round(cached, 3),
           "req_per_s_uncached": round(uncached, 3)}
    if os.environ.get("QPV_PREFIX", "1") == "1":
        from grounded_video_llm_tpu.core.config import GenerateConfig as GC

        gp = GC(max_new_tokens=TOKENS, do_sample=True, temperature=0.2,
                quantize_cache=True)  # prefix leg is lockstep (no spec)
        prefix = timed("run_stream_prefix (encode + prompt-head KV per "
                       "video)",
                       lambda: engine.run_stream_prefix(paths, prompts,
                                                        mode="grounding",
                                                        batch_size=BATCH,
                                                        gen_cfg=gp))
        print(f"prefix speedup: {prefix / uncached:.2f}x vs re-encode, "
              f"{prefix / cached:.2f}x vs feature-cache, q/video={QPV}",
              file=sys.stderr)
        out["req_per_s_prefix"] = round(prefix, 3)
        out["prefix_speedup_vs_reencode"] = round(prefix / uncached, 3)
    import json

    print(json.dumps(out))


if __name__ == "__main__":
    main()
