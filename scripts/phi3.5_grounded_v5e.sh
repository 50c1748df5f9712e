#!/usr/bin/env bash
# Stage 2 (grounded): temporal-token training. Vocab +302, LoRA r=128 on the LLM,
# lm_head/embed trainable at lr 2e-5 (LoRA 2e-4); ZeRO-3-style sharding;
# global batch 128, 3 epochs, max_txt_len 4096.
set -euo pipefail
weight_path=${WEIGHT_PATH:-./weights}
data_dir=${DATA_PATH:-./data}

python train.py \
    --model llava_next_video \
    --llm phi3.5 \
    --stage grounded \
    --dataset mix_grounded \
    --anno_path "${data_dir}/mix_grounded/mix_grounded.json" \
    --data_dir "${data_dir}" \
    --max_txt_len 4096 --num_temporal_tokens 300 --num_frames 96 --num_segs 12 \
    --tokenizer_path "${weight_path}/Phi-3.5-mini-instruct" \
    --pretrained_video_path "${weight_path}/internvideo/vision-encoder-InternVideo2-stage2_1b-224p-f4.pt" \
    --pretrained_vision_proj_llm_path "${weight_path}/Phi-3.5-vision-instruct-seperated" \
    --pretrained_proj ./experiments/pretrain_llava_next_video_phi3.5_mix_pretrain.pth \
    --save_dir ./experiments
