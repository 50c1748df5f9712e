#!/usr/bin/env bash
# Stage 1 (pretrain): projector alignment. Encoders + LLM frozen; video_projecter
# lr 1e-3, mm_projector lr 1e-5; ZeRO-2-style sharding; global batch 256.
# (stage matrix: reference scripts/phi3.5_pretrain_8_a100.sh + SURVEY §2.4)
# One process per TPU host; jax.distributed initializes from the pod environment.
set -euo pipefail
weight_path=${WEIGHT_PATH:-./weights}
data_dir=${DATA_PATH:-./data}

python train.py \
    --model llava_next_video \
    --llm phi3.5 \
    --stage pretrain \
    --dataset mix_pretrain \
    --anno_path "${data_dir}/mix_pretrain/mix_pretrain.json" \
    --data_dir "${data_dir}" \
    --max_txt_len 2048 --num_temporal_tokens 300 --num_frames 96 --num_segs 12 \
    --tokenizer_path "${weight_path}/Phi-3.5-mini-instruct" \
    --pretrained_video_path "${weight_path}/internvideo/vision-encoder-InternVideo2-stage2_1b-224p-f4.pt" \
    --pretrained_vision_proj_llm_path "${weight_path}/Phi-3.5-vision-instruct-seperated" \
    --save_dir ./experiments
