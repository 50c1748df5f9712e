"""HTTP serving CLI — continuous-batching API server (serve/server.py).

Beyond-parity surface (the reference ships only a single-video CLI demo,
reference inference.py:137-190): an OpenAI-style JSON API with per-token SSE
streaming over the slot-pool continuous batcher, feature-cached video encode
at admission.

    python server.py --llm phi3.5 --quantize int8_full --port 8321
    curl -s localhost:8321/v1/generate -d '{"video_path": "v.mp4",
         "prompt": "When does the dog jump?", "mode": "grounding"}'
"""

import argparse
import os
import random

import numpy as np

if os.environ.get("GVLLM_FORCE_CPU") == "1":
    # axon sitecustomize overrides JAX_PLATFORMS from the env (CLAUDE.md);
    # the config call must land before backend init
    import jax

    jax.config.update("jax_platforms", "cpu")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--llm", default="phi3.5",
                   choices=["llama3", "vicuna", "phi3.5"])
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8321)
    p.add_argument("--pool_size", type=int, default=4,
                   help="continuous-batching slots (HBM: each slot carries "
                        "a pool-length int8 KV cache)")
    p.add_argument("--prompt_len", type=int, default=256,
                   help="static text-prompt bucket (left-padded); must hold "
                        "the full rendered prompt through the <image> token "
                        "— the engine rejects prompts whose image slot "
                        "would truncate away")
    p.add_argument("--max_new_tokens", type=int, default=64,
                   help="pool token budget (per-request budgets may be "
                        "lower)")
    p.add_argument("--chunk", type=int, default=8,
                   help="decode chunk between admission checks (latency = "
                        "chunk x ms/token)")
    p.add_argument("--chunk_long", type=int, default=0,
                   help="adaptive tail chunk: when the queue is empty and "
                        "every in-flight request's remaining budget covers "
                        "it, decode in chunks of this size (amortizes "
                        "per-chunk dispatch over the straggler tail); 0 off")
    p.add_argument("--spec_draft_len", type=int, default=0)
    p.add_argument("--pipeline_chunks", action="store_true",
                   help="dispatch chunk k+1 before fetching chunk k's "
                        "tokens: the per-chunk host sync overlaps device "
                        "execution (retirement/admission lag one chunk)")
    p.add_argument("--warmup", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="pre-compile the pool's programs at startup "
                        "(default: on when --chunk_long is set)")
    p.add_argument("--prefix_cache", action="store_true",
                   help="prefix-KV admission: repeated videos prefill only "
                        "their question chunk (the shared [system | video "
                        "tokens] head caches per video)")
    p.add_argument("--shared_prefix_pool", action="store_true",
                   help="cascade decode pool (requires --prefix_cache): the "
                        "pinned video prefix is stored once at batch dim 1 "
                        "and streamed once per token for all slots — the "
                        "decode DMA win for same-video request batches; "
                        "requests for a different video wait until the pool "
                        "drains, then the pool repins")
    p.add_argument("--num_frames", type=int, default=96)
    p.add_argument("--num_segs", type=int, default=12)
    p.add_argument("--tokenizer_path", default="")
    p.add_argument("--pretrained_video_path", default="")
    p.add_argument("--pretrained_vision_proj_llm_path", default="")
    p.add_argument("--ckpt_path", default="")
    p.add_argument("--quantize", default="",
                   choices=["", "int8", "int8_full"])
    p.add_argument("--temperature", type=float, default=0.2)
    p.add_argument("--top_p", type=float, default=None)
    p.add_argument("--do_sample", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--feature_cache_size", type=int, default=8)
    p.add_argument("--debug_tiny", action="store_true",
                   help="micro model dims (smoke server; CPU-safe)")
    return p.parse_args()


def main():
    args = parse_args()
    random.seed(args.seed)
    np.random.seed(args.seed)

    from grounded_video_llm_tpu.cli.model_loading import (build_params,
                                                          build_tokenizer)
    from grounded_video_llm_tpu.core.config import GenerateConfig, vlm_config
    from grounded_video_llm_tpu.serve.engine import InferenceEngine
    from grounded_video_llm_tpu.serve.server import (ServingFrontend,
                                                     serve_http)

    if args.debug_tiny:
        from grounded_video_llm_tpu.core.config import micro_vlm_config

        cfg = micro_vlm_config(args.llm)
    else:
        cfg = vlm_config(args.llm, stage="inference",
                         num_frames=args.num_frames, num_segs=args.num_segs)
    params = build_params(
        cfg, weight_root=args.pretrained_vision_proj_llm_path or None,
        video_encoder_path=args.pretrained_video_path or None,
        stage_ckpt=args.ckpt_path or None, seed=args.seed,
        quantize=args.quantize or None)
    tokenizer = build_tokenizer(cfg, args.tokenizer_path or None)
    gen_cfg = GenerateConfig(max_new_tokens=args.max_new_tokens,
                             do_sample=args.do_sample,
                             temperature=args.temperature, top_p=args.top_p,
                             quantize_cache=True)
    engine = InferenceEngine(params, cfg, tokenizer, gen_cfg, seed=args.seed,
                             quantize=args.quantize or None,
                             feature_cache_size=args.feature_cache_size)
    frontend = ServingFrontend(
        engine, pool_size=args.pool_size, prompt_len=args.prompt_len,
        max_new_tokens=args.max_new_tokens, chunk=args.chunk,
        spec_draft_len=args.spec_draft_len, prefix_cache=args.prefix_cache,
        shared_prefix_pool=args.shared_prefix_pool,
        chunk_long=args.chunk_long, pipeline_chunks=args.pipeline_chunks,
        warmup=args.warmup)
    httpd = serve_http(frontend, args.host, args.port)
    print(f"serving {cfg.llm_name} on http://{args.host}:{args.port} "
          f"(pool={args.pool_size}, prompt_len={args.prompt_len}, "
          f"max_new={args.max_new_tokens})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        frontend.shutdown()
        httpd.server_close()


if __name__ == "__main__":
    main()
