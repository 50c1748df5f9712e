"""Accuracy gate: run the BASELINE.md benchmark metrics on real checkpoints.

The north-star is throughput AT Charades-STA R1@0.5 parity (BASELINE.md).
This driver is the gate that runs the day reference weights appear on disk:
it loads them through models/convert + cli/model_loading.build_params,
evaluates the requested benchmark through the serving engine, and emits the
BASELINE-format metric JSON. Without the required weight files it exits with
code 2 and a clear message — wire it into CI unconditionally; it self-gates.

Matches the reference's checkpoint loading (inference.py:137-162) and the
published metric rows (reference README.md:31-34).

Examples:
  # Charades-STA grounding (native annotation format: charades_sta_test.txt)
  python eval.py --benchmark grounding --anno_format charades_sta \\
      --anno_path charades_sta_test.txt --video_root videos/ \\
      --pretrained_vision_proj_llm_path weights/phi/ \\
      --pretrained_video_path weights/internvideo2.pt \\
      --ckpt_path ckpt/sft_llava_next_video_phi3_mix_sft.pth

  # same, int8-serving accuracy-neutrality check vs the bf16 run
  python eval.py ... --quantize int8_full

Annotation formats:
  json          — list of {video, query|question, start, end, ...} dicts
                  (the harness's native schema, serve/eval.py)
  charades_sta  — the public "id start end##query" text format
  jsonl         — one native dict per line
"""

from __future__ import annotations

import argparse
import json
import os
import sys

if os.environ.get("GVLLM_FORCE_CPU") == "1":
    # Hermetic/CI runs (tests spawn this driver as a subprocess): the axon
    # sitecustomize overrides JAX_PLATFORMS from the env, so forcing CPU
    # needs the config call (CLAUDE.md); must land before backend init.
    import jax

    jax.config.update("jax_platforms", "cpu")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--llm", default="phi3.5",
                   choices=["phi3.5", "llama3", "vicuna"])
    p.add_argument("--benchmark", default="grounding",
                   choices=["grounding", "gqa", "mc", "captioning"])
    p.add_argument("--anno_path", required=True)
    p.add_argument("--anno_format", default="json",
                   choices=["json", "jsonl", "charades_sta"])
    p.add_argument("--video_root", default="")
    p.add_argument("--pretrained_video_path", default="")
    p.add_argument("--pretrained_vision_proj_llm_path", default="")
    p.add_argument("--ckpt_path", default="")
    p.add_argument("--tokenizer_path", default="")
    p.add_argument("--quantize", default="",
                   choices=["", "int8", "int8_full"])
    p.add_argument("--quantize_ab", action="store_true",
                   help="instead of the benchmark, run the bf16-vs-quantized "
                        "accuracy A/B (logit KL + greedy token agreement) on "
                        "the first --ab_items eval items and enforce the "
                        "committed thresholds (serve/quant_ab.py); exits 1 "
                        "on failure")
    p.add_argument("--static_scales", action="store_true",
                   help="with --quantize_ab: calibrate static W8A8 "
                        "activation scales (serve/calibrate.py, fc2+proj) on "
                        "the A/B items' own pixels before the quant leg — "
                        "the accuracy bar then covers the static-scale "
                        "serving mode bench.py uses")
    p.add_argument("--ab_items", type=int, default=4)
    p.add_argument("--ab_max_new_tokens", type=int, default=32)
    p.add_argument("--ab_max_kl", type=float, default=None)
    p.add_argument("--ab_min_top1", type=float, default=None)
    p.add_argument("--ab_min_greedy", type=float, default=None)
    p.add_argument("--max_items", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=6)
    p.add_argument("--max_new_tokens", type=int, default=128)
    p.add_argument("--num_frames", type=int, default=96)
    p.add_argument("--num_segs", type=int, default=12)
    p.add_argument("--prefix_cache", action="store_true",
                   help="also cache the shared prompt-head KV per video "
                        "(run_stream_prefix) on top of the feature cache")
    p.add_argument("--out", default="", help="also write metrics JSON here")
    p.add_argument("--allow_random_weights", action="store_true",
                   help="skip the weights gate (synthetic smoke runs only)")
    p.add_argument("--debug_tiny", action="store_true",
                   help="micro model dims (CI smoke of the full driver path)")
    return p.parse_args()


def load_annotations(path: str, fmt: str):
    if fmt == "json":
        with open(path) as f:
            return json.load(f)
    if fmt == "jsonl":
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]
    # charades_sta: "VIDEOID START END##query sentence"
    items = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or "##" not in line:
                continue
            head, query = line.split("##", 1)
            vid, start, end = head.split()
            items.append({"video": vid + ".mp4", "query": query,
                          "start": float(start), "end": float(end)})
    return items


def weights_present(args) -> bool:
    """The gate: every weight source the reference load path uses
    (inference.py:137-162) must exist."""
    checks = [
        (args.ckpt_path, os.path.exists),
        (args.pretrained_video_path, os.path.exists),
        (args.pretrained_vision_proj_llm_path, os.path.isdir),
    ]
    return all(path and ok(path) for path, ok in checks)


def run_quantize_ab(args, cfg) -> int:
    """bf16-vs-quantized accuracy A/B on real eval items (the pre-wired int8
    accuracy bar, serve/quant_ab.py). Sequential memory protocol: the bf16
    tree is built and its leg fetched to host FIRST, then freed, then the
    quantized tree is built — required where both trees don't co-fit HBM."""
    import gc

    from grounded_video_llm_tpu.cli.model_loading import (build_params,
                                                          build_tokenizer)
    from grounded_video_llm_tpu.serve import quant_ab
    from grounded_video_llm_tpu.serve.engine import InferenceEngine

    quant = args.quantize or "int8_full"
    tokenizer = build_tokenizer(cfg, args.tokenizer_path or None, expand=True)
    kw = dict(weight_root=args.pretrained_vision_proj_llm_path or None,
              video_encoder_path=args.pretrained_video_path or None,
              stage_ckpt=args.ckpt_path or None)
    holder = {"p": build_params(cfg, **kw)}
    engine = InferenceEngine(holder["p"], cfg, tokenizer)

    annos = load_annotations(args.anno_path, args.anno_format)
    items = annos[:args.ab_items]
    mode = {"grounding": "grounding", "gqa": "grounding",
            "mc": "qa", "captioning": "grounding"}[args.benchmark]
    ids, mask, spatial, temporal = quant_ab.prepare_ab_inputs(
        engine, items, args.video_root, mode)

    def free_bf16():
        engine.params = None
        holder.clear()
        gc.collect()

    thr = {}
    if args.ab_max_kl is not None:
        thr["max_kl"] = args.ab_max_kl
    if args.ab_min_top1 is not None:
        thr["min_top1"] = args.ab_min_top1
    if args.ab_min_greedy is not None:
        thr["min_greedy"] = args.ab_min_greedy
    def build_quant():
        p2 = build_params(cfg, quantize=quant, **kw)
        if quant == "int8_full":
            # match bench.py's serving mode: int8_full = int8 LLM + W8A8
            # encoders — the bar must judge the tree that actually serves
            from grounded_video_llm_tpu.serve.quantize import (
                quantize_clip_for_serving, quantize_video_encoder_for_serving)
            p2 = dict(p2)
            p2["video_encoder"] = quantize_video_encoder_for_serving(
                p2["video_encoder"])
            p2["clip"] = quantize_clip_for_serving(p2["clip"])
        if args.static_scales:
            from grounded_video_llm_tpu.serve.calibrate import \
                calibrate_and_apply
            p2 = calibrate_and_apply(p2, cfg, [temporal])
        return p2

    report = quant_ab.run_quant_ab(
        holder["p"], build_quant, cfg,
        ids, mask, spatial, temporal,
        max_new_tokens=args.ab_max_new_tokens,
        eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id,
        free_bf16=free_bf16, **thr)
    result = {"mode": "quantize_ab", "llm": args.llm, "quantize": quant,
              "static_scales": bool(args.static_scales),
              "n_items": len(items), "report": report}
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    return 0 if report["pass"] else 1


def main():
    args = parse_args()
    if not weights_present(args) and not args.allow_random_weights:
        print(json.dumps({
            "status": "skipped",
            "reason": "reference checkpoints not present on disk",
            "required": {
                "ckpt_path": args.ckpt_path or "(unset)",
                "pretrained_video_path":
                    args.pretrained_video_path or "(unset)",
                "pretrained_vision_proj_llm_path":
                    args.pretrained_vision_proj_llm_path or "(unset)",
            }}))
        sys.exit(2)

    from grounded_video_llm_tpu.cli.model_loading import (build_params,
                                                          build_tokenizer)
    from grounded_video_llm_tpu.core.config import GenerateConfig, vlm_config
    from grounded_video_llm_tpu.serve.engine import InferenceEngine
    from grounded_video_llm_tpu.serve.captioning import eval_dense_captioning
    from grounded_video_llm_tpu.serve.eval import (eval_gqa, eval_grounding,
                                                   eval_multiple_choice)

    if args.debug_tiny:
        from grounded_video_llm_tpu.core.config import micro_vlm_config

        cfg = micro_vlm_config(args.llm)
    else:
        cfg = vlm_config(args.llm, stage="inference",
                         num_frames=args.num_frames, num_segs=args.num_segs)
    if args.quantize_ab:
        sys.exit(run_quantize_ab(args, cfg))
    params = build_params(
        cfg, weight_root=args.pretrained_vision_proj_llm_path or None,
        video_encoder_path=args.pretrained_video_path or None,
        stage_ckpt=args.ckpt_path or None,
        # pre-quantized build: required for llama3-8B (bf16 tree exceeds one
        # v5e's usable HBM); the engine detects it and skips its own pass
        quantize=args.quantize or None)
    tokenizer = build_tokenizer(cfg, args.tokenizer_path or None, expand=True)
    engine = InferenceEngine(
        params, cfg, tokenizer,
        GenerateConfig(max_new_tokens=args.max_new_tokens, do_sample=False,
                       temperature=0.0),
        quantize=args.quantize or None, prefix_cache=args.prefix_cache,
        static_scales=args.static_scales)

    annos = load_annotations(args.anno_path, args.anno_format)
    runner = {"grounding": eval_grounding, "gqa": eval_gqa,
              "mc": eval_multiple_choice,
              # ActivityNet-Captions SODA_c/METEOR (reference README.md:31-34)
              # — annotations are the official {video_id: {duration,
              # timestamps, sentences}} val json (use --anno_format json)
              "captioning": eval_dense_captioning}[args.benchmark]
    metrics = runner(engine, annos, video_root=args.video_root,
                     max_items=args.max_items, batch_size=args.batch_size)

    result = {
        "benchmark": args.benchmark,
        "llm": args.llm,
        "quantize": args.quantize or "bf16",
        "n_items": min(len(annos), args.max_items or len(annos)),
        "metrics": metrics,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
