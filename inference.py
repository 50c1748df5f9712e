"""Single-video inference CLI — public-API parity with reference inference.py.

Runs the three demo modes (videoqa / grounding / referring) on one video and
prints raw + parsed generations. Weight paths are optional: without them the
model runs randomly initialized (pipeline smoke mode).

    python inference.py --llm phi3.5 --video_path ./experiments/video0.mp4
"""

import argparse
import os
import random

import numpy as np

if os.environ.get("GVLLM_FORCE_CPU") == "1":
    # Hermetic/CI smoke runs: the axon sitecustomize overrides JAX_PLATFORMS
    # from the env, so forcing CPU needs the config call (CLAUDE.md); must
    # land before backend init. Same escape hatch as eval.py — without it a
    # TPU-backend outage hangs the CLI instead of falling back.
    import jax

    jax.config.update("jax_platforms", "cpu")


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--model", type=str, default="llava_next_video",
                        choices=["llava_next_video"])
    parser.add_argument("--llm", type=str, default="phi3.5",
                        choices=["llama3", "vicuna", "phi3.5"])
    parser.add_argument("--stage", type=str, default="sft",
                        choices=["pretrain", "grounded", "sft"])
    parser.add_argument("--max_txt_len", type=int, default=2048)
    parser.add_argument("--num_temporal_tokens", type=int, default=300)
    parser.add_argument("--num_frames", type=int, default=96)
    parser.add_argument("--num_segs", type=int, default=12)
    # weight paths (reference inference.py:30-37); optional here
    parser.add_argument("--tokenizer_path", type=str, default="")
    parser.add_argument("--pretrained_video_path", type=str, default="")
    parser.add_argument("--pretrained_vision_proj_llm_path", type=str,
                        default="")
    parser.add_argument("--ckpt_path", type=str, default="")
    # inputs (reference inference.py:39-43)
    parser.add_argument("--prompt_grounding", type=str,
                        default="Give you a textual query: 'The female host "
                        "wearing purple clothes is reporting news in the "
                        "studio'. When does the described content occur in "
                        "the video? Please return the start and end "
                        "timestamps.")
    parser.add_argument("--prompt_videoqa", type=str,
                        default="Question: What does this TV news report "
                        "about?\nOptions:\n(A) thievery\n(B) community "
                        "violence incidents\n(C) fashion show\n(D) aging "
                        "population")
    parser.add_argument("--prompt_referring", type=str,
                        default="What is happening from 70 seconds to 80 "
                        "seconds?")
    parser.add_argument("--video_path", type=str,
                        default="./experiments/video0.mp4")
    # generation (reference inference.py:45-49)
    parser.add_argument("--do_sample",
                        action=argparse.BooleanOptionalAction, default=True)
    parser.add_argument("--num_beams", type=int, default=1)
    parser.add_argument("--quantize", type=str, default="",
                        choices=["", "int8", "int8_full"],
                        help="int8 serving: weight-only (int8) or + W8A8 "
                             "GEMMs/encoders (int8_full); required to fit "
                             "llama3-8B on one v5e")
    parser.add_argument("--max_new_tokens", type=int, default=2048)
    parser.add_argument("--spec_draft_len", type=int, default=0,
                        help="speculative decoding: verify this many n-gram "
                             "prompt-lookup drafts per pass (0 = off); "
                             "greedy is token-exact, sampling uses the "
                             "delta-draft rejection rule")
    parser.add_argument("--temperature", type=float, default=0.2)
    parser.add_argument("--top_p", type=float, default=None)
    parser.add_argument("--debug_tiny", action="store_true",
                        help="micro model dims (pipeline smoke test; CPU-safe)")
    return parser.parse_args()


def main():
    args = parse_args()
    random.seed(args.seed)
    np.random.seed(args.seed)

    from grounded_video_llm_tpu.cli.model_loading import (build_params,
                                                          build_tokenizer)
    from grounded_video_llm_tpu.core.config import GenerateConfig, vlm_config
    from grounded_video_llm_tpu.serve.engine import InferenceEngine

    if args.debug_tiny:
        from grounded_video_llm_tpu.core.config import micro_vlm_config

        cfg = micro_vlm_config(args.llm)
    else:
        cfg = vlm_config(args.llm, stage="inference",
                         num_frames=args.num_frames, num_segs=args.num_segs,
                         max_txt_len=args.max_txt_len)
    params = build_params(
        cfg, weight_root=args.pretrained_vision_proj_llm_path or None,
        video_encoder_path=args.pretrained_video_path or None,
        stage_ckpt=args.ckpt_path or None, seed=args.seed,
        quantize=args.quantize or None)
    tokenizer = build_tokenizer(cfg, args.tokenizer_path or None)
    gen_cfg = GenerateConfig(max_new_tokens=args.max_new_tokens,
                             do_sample=args.do_sample,
                             temperature=args.temperature, top_p=args.top_p,
                             num_beams=args.num_beams,
                             spec_draft_len=args.spec_draft_len)
    engine = InferenceEngine(params, cfg, tokenizer, gen_cfg, seed=args.seed,
                             quantize=args.quantize or None)

    for mode, prompt in (("grounding", args.prompt_grounding),
                         ("qa", args.prompt_videoqa),
                         ("referring", args.prompt_referring)):
        res = engine.run(args.video_path, prompt, mode=mode)
        print(f"[{mode}] raw: {res.text}")
        print(f"[{mode}] parsed: {res.parsed}")


if __name__ == "__main__":
    main()
