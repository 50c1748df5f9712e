#!/usr/bin/env bash
# Stage-3 (sft) data: the ~19-source instruction mix + mix_sft.json
# Mirrors reference scripts/download_data_stage3.sh (same HF-hosted sources).
set -euo pipefail
data_path=${DATA_PATH:-./data}
hf=https://huggingface.co/datasets/WHB139426/Grounded-VideoLLM/resolve/main

fetch_chunks() {
  mkdir -p "${data_path}/$1" && cd "${data_path}/$1"
  for i in $(seq 1 "$2"); do
    wget -O "chunk_${i}.zip" "${hf}/$1/chunk_${i}.zip"
    unzip -o "chunk_${i}.zip" && rm -f "chunk_${i}.zip"
  done
  cd - >/dev/null
}

# sources per reference scripts/download_data_stage3.sh:3-215
for spec in \
  "VideoChat_instruct 5" "TextVR 10" "charades 8" "didemo 10" "hirest 5" \
  "VTG-IT 20" "activitynet 15" "clevrer 10" "coin 10" "kinetics 15" \
  "msrvttqa 10" "msvdqa 5" "nextqa 10" "querYD 5" "sthsthv2 15" \
  "videochat2 10" "vitt 5" "youcook2 8" "sharegpt4video 15" "qvhighlights 5"; do
  set -- $spec
  fetch_chunks "$1" "$2"
done

mkdir -p "${data_path}/mix_sft"
wget -O "${data_path}/mix_sft/mix_sft.json" "${hf}/mix_sft/mix_sft.json"
