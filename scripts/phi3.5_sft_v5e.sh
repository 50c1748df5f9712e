#!/usr/bin/env bash
# Stage 3 (sft): instruction mix. Same trainable set as stage 2;
# global batch 96, per-device 12, 1 epoch, max_txt_len 2048.
set -euo pipefail
weight_path=${WEIGHT_PATH:-./weights}
data_dir=${DATA_PATH:-./data}

python train.py \
    --model llava_next_video \
    --llm phi3.5 \
    --stage sft \
    --dataset mix_sft \
    --anno_path "${data_dir}/mix_sft/mix_sft.json" \
    --data_dir "${data_dir}" \
    --max_txt_len 2048 --num_temporal_tokens 300 --num_frames 96 --num_segs 12 \
    --tokenizer_path "${weight_path}/Phi-3.5-mini-instruct" \
    --pretrained_video_path "${weight_path}/internvideo/vision-encoder-InternVideo2-stage2_1b-224p-f4.pt" \
    --pretrained_vision_proj_llm_path "${weight_path}/Phi-3.5-vision-instruct-seperated" \
    --pretrained_proj ./experiments/grounded_llava_next_video_phi3.5_mix_grounded.pth \
    --save_dir ./experiments
