#!/usr/bin/env bash
# Single-video demo (qa + grounding + referring), parity with reference
# scripts/inference_phi3_5.sh. Weight flags are optional (random-init smoke
# mode without them).
set -euo pipefail
weight_path=${WEIGHT_PATH:-./weights}

python inference.py \
    --llm phi3.5 \
    --tokenizer_path "${weight_path}/Phi-3.5-mini-instruct" \
    --pretrained_video_path "${weight_path}/internvideo/vision-encoder-InternVideo2-stage2_1b-224p-f4.pt" \
    --pretrained_vision_proj_llm_path "${weight_path}/Phi-3.5-vision-instruct-seperated" \
    --ckpt_path "${weight_path}/ckpt/sft_llava_next_video_phi3.5_mix_sft_multi_modal_projector_video_projecter_language_model.pth" \
    --video_path ./experiments/video0.mp4
