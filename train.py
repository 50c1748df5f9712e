"""Training CLI — public-API parity with reference train.py.

Three-stage curriculum over the dataset mixes, FSDP/TP-sharded pjit training.
On TPU pods, launch one process per host (jax.distributed initializes from the
environment); torchrun is not needed.

    python train.py --stage pretrain --dataset mix_pretrain \
        --anno_path data/mix_pretrain.json --data_dir data/
"""

import argparse
import random

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--model", type=str, default="llava_next_video",
                        choices=["llava_next_video"])
    parser.add_argument("--llm", type=str, default="phi3.5",
                        choices=["llama3", "vicuna", "phi3.5"])
    parser.add_argument("--dataset", type=str, default="mix_sft",
                        choices=["mix_pretrain", "mix_grounded", "mix_sft"])
    parser.add_argument("--anno_path", type=str, required=True)
    parser.add_argument("--data_dir", type=str, default="")
    parser.add_argument("--stage", type=str, default="sft",
                        choices=["pretrain", "grounded", "sft"])
    parser.add_argument("--max_txt_len", type=int, default=2048)
    parser.add_argument("--num_temporal_tokens", type=int, default=300)
    parser.add_argument("--num_frames", type=int, default=96)
    parser.add_argument("--num_segs", type=int, default=12)
    parser.add_argument("--epoch", type=int, default=0,
                        help="override stage preset epochs if > 0")
    parser.add_argument("--global_batch_size", type=int, default=0,
                        help="override stage preset if > 0")
    parser.add_argument("--per_device_batch_size", type=int, default=0)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--resume_ckpt", type=str, default="")
    parser.add_argument("--save_dir", type=str, default="./experiments")
    # weights
    parser.add_argument("--tokenizer_path", type=str, default="")
    parser.add_argument("--pretrained_video_path", type=str, default="")
    parser.add_argument("--pretrained_vision_proj_llm_path", type=str,
                        default="")
    parser.add_argument("--pretrained_proj", type=str, default="",
                        help="previous-stage checkpoint (stage handoff, "
                        "reference train.py:117-124)")
    parser.add_argument("--debug_tiny", action="store_true",
                        help="micro model dims (pipeline smoke test; CPU-safe)")
    return parser.parse_args()


def main():
    args = parse_args()
    random.seed(args.seed)
    np.random.seed(args.seed)

    import dataclasses

    from grounded_video_llm_tpu.cli.model_loading import (build_params,
                                                          build_tokenizer)
    from grounded_video_llm_tpu.core.config import (STAGE_PRESETS, vlm_config)
    from grounded_video_llm_tpu.data.datasets import DATASETS
    from grounded_video_llm_tpu.parallel.mesh import initialize_distributed
    from grounded_video_llm_tpu.train.strategy import TrainingStrategy

    # multi-host init BEFORE any jax device use (the torchrun equivalent,
    # SURVEY §2.6); raises if a coordinator is configured but unreachable
    initialize_distributed()

    if args.debug_tiny:
        from grounded_video_llm_tpu.core.config import micro_vlm_config

        cfg = micro_vlm_config(args.llm)
        args.num_frames, args.num_segs = cfg.num_frames, cfg.num_segs
    else:
        cfg = vlm_config(args.llm, stage=args.stage,
                         num_frames=args.num_frames, num_segs=args.num_segs)
    import jax.numpy as jnp

    params = build_params(
        cfg, weight_root=args.pretrained_vision_proj_llm_path or None,
        video_encoder_path=args.pretrained_video_path or None,
        stage_ckpt=args.pretrained_proj or None, seed=args.seed,
        dtype=jnp.float32 if args.debug_tiny else jnp.bfloat16)
    tokenizer = build_tokenizer(
        cfg, args.tokenizer_path or None,
        expand=STAGE_PRESETS[args.stage].expand_vocab)

    dataset = DATASETS[args.dataset](
        anno_path=args.anno_path, video_path=args.data_dir,
        num_frames=args.num_frames, num_segs=args.num_segs,
        num_temporal_tokens=args.num_temporal_tokens, llm=args.llm,
        seed=args.seed)

    # preset overrides
    if any([args.epoch, args.global_batch_size, args.per_device_batch_size]):
        preset = STAGE_PRESETS[args.stage]
        over = {}
        if args.epoch:
            over["epochs"] = args.epoch
        if args.global_batch_size:
            over["global_batch_size"] = args.global_batch_size
        if args.per_device_batch_size:
            over["per_device_batch_size"] = args.per_device_batch_size
        STAGE_PRESETS[args.stage] = dataclasses.replace(preset, **over)

    strategy = TrainingStrategy(
        cfg, args.stage, params, tokenizer, run_dir=args.save_dir,
        n_train_examples=len(dataset), seed=args.seed)
    strategy.run_training(dataset,
                          resume_from=args.resume_ckpt if args.resume else None)
    strategy.save_checkpoint("final")
    strategy.export_reference_checkpoint(
        f"{args.save_dir}/{args.stage}_{args.model}_{args.llm}_"
        f"{args.dataset}.pth")


if __name__ == "__main__":
    main()
