"""End-to-end benchmark: 96-frame videos/sec on the flagship Phi-3.5 VLM.

Measures the full device pipeline per video query (the reference's
inference.py path, SURVEY §3.1): dual-stream encode (CLIP 12x336² +
InternVideo2 12x8x224²) → 3420-token fusion → multimodal prefill → N-token
decode. Prints ONE JSON line:
  {"metric": "e2e_videos_per_sec", "value": ..., "unit": "videos/sec",
   "vs_baseline": ...}

vs_baseline: the driver's north-star is ≥2x an A100 running the reference
end-to-end (BASELINE.md). The reference publishes no speed numbers, so the
A100 figure is estimated at 1.0 videos/sec for this workload (bf16 Phi-3.5,
single GPU, 96-frame video, ~3.5k-token prefill + 64-token decode) — a
deliberately generous estimate recorded here for reproducibility.

Extra diagnostics (per-phase times, decode tokens/sec) go to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_BASELINE_VIDEOS_PER_SEC = 1.0
DECODE_TOKENS = 64
BATCH = 6   # int8 weights + int8 KV cache fit batch 6 on one v5e
QUANTIZE = True       # weight-only int8, per-out-channel scales (serve/quantize.py)
QUANTIZE_CACHE = True  # int8 KV cache, per-position-head scales
WARMUP_ITERS = 1
MEASURE_ITERS = 3


def main():
    from grounded_video_llm_tpu.core.config import vlm_config
    from grounded_video_llm_tpu.models import vlm
    from grounded_video_llm_tpu.serve.generate import generate_tokens

    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = vlm_config("phi3.5", stage="inference")
    t0 = time.time()
    # one jitted program → one compile, instead of per-initializer dispatch
    params = jax.jit(lambda k: vlm.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0))
    if QUANTIZE:
        from grounded_video_llm_tpu.serve.quantize import \
            quantize_llm_for_serving

        params = dict(params)
        params["llm"] = jax.jit(quantize_llm_for_serving,
                                donate_argnums=0)(params["llm"])
        print("serving mode: weight-only int8 (per-out-channel scales)",
              file=sys.stderr)
    jax.block_until_ready(params)
    print(f"param init: {time.time()-t0:.1f}s", file=sys.stderr)

    B, S = BATCH, 64
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 30000, size=(B, S)).astype(np.int32)
    ids[:, 1] = -200
    attn = np.ones((B, S), np.int32)
    spatial = jnp.zeros((B, cfg.num_segs, 336, 336, 3), jnp.bfloat16)
    temporal = jnp.zeros((B, cfg.num_frames, 224, 224, 3), jnp.bfloat16)

    def run(seed):
        toks, lengths = generate_tokens(
            params, cfg, jnp.asarray(ids), jnp.asarray(attn), spatial,
            temporal, jax.random.key(seed),
            max_new_tokens=DECODE_TOKENS, temperature=0.2, do_sample=True,
            eos_token_id=-1,  # never emitted → full-length decode, stable timing
            pad_token_id=0, quantize_cache=QUANTIZE_CACHE)
        # host fetch: block_until_ready is not a reliable barrier on the axon
        # backend (verified: it returned in 3ms for a 3s computation)
        return np.asarray(toks)

    t0 = time.time()
    run(0)
    print(f"compile+warmup: {time.time()-t0:.1f}s", file=sys.stderr)
    for i in range(WARMUP_ITERS):
        run(i + 1)

    t0 = time.time()
    for i in range(MEASURE_ITERS):
        run(100 + i)
    elapsed = (time.time() - t0) / MEASURE_ITERS
    videos_per_sec = B / elapsed

    # phase split: encode+prefill alone (1-token generate) vs full decode
    def run_short(seed):
        toks, _ = generate_tokens(
            params, cfg, jnp.asarray(ids), jnp.asarray(attn), spatial,
            temporal, jax.random.key(seed),
            max_new_tokens=1, temperature=0.2, do_sample=True,
            eos_token_id=-1, pad_token_id=0, quantize_cache=QUANTIZE_CACHE)
        return np.asarray(toks)

    run_short(0)  # compile
    t0 = time.time()
    for i in range(MEASURE_ITERS):
        run_short(100 + i)
    prefill_s = (time.time() - t0) / MEASURE_ITERS
    decode_s = max(elapsed - prefill_s, 1e-9)
    tok_per_s = (DECODE_TOKENS - 1) / decode_s

    print(f"e2e per-query: {elapsed*1000:.1f} ms "
          f"({DECODE_TOKENS} decode tokens)", file=sys.stderr)
    print(f"encode+prefill: {prefill_s*1000:.1f} ms | decode: "
          f"{decode_s*1000:.1f} ms ({tok_per_s:.1f} tok/s, "
          f"{decode_s*1000/(DECODE_TOKENS-1):.2f} ms/tok)", file=sys.stderr)

    print(json.dumps({
        "metric": "e2e_videos_per_sec",
        "value": round(videos_per_sec, 4),
        "unit": "videos/sec",
        "vs_baseline": round(videos_per_sec / A100_BASELINE_VIDEOS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
