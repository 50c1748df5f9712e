#!/usr/bin/env bash
# LLaVA-Next-Llama3-8B variant demo, parity with reference scripts/inference_llama3.sh.
set -euo pipefail
weight_path=${WEIGHT_PATH:-./weights}

python inference.py \
    --llm llama3 \
    --tokenizer_path "${weight_path}/Meta-Llama-3-8B-Instruct" \
    --pretrained_video_path "${weight_path}/internvideo/vision-encoder-InternVideo2-stage2_1b-224p-f4.pt" \
    --pretrained_vision_proj_llm_path "${weight_path}/llava-next-llama3-8b-seperated" \
    --ckpt_path "${weight_path}/ckpt/sft_llava_next_video_llama3_mix_sft_multi_modal_projector_video_projecter_language_model.pth" \
    --video_path ./experiments/video0.mp4
