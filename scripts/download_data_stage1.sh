#!/usr/bin/env bash
# Stage-1 (pretrain) data: webvid-703k, internvid, panda70m_2m + mix_pretrain.json
# Mirrors reference scripts/download_data_stage1.sh (same HF-hosted zip chunks).
set -euo pipefail
data_path=${DATA_PATH:-./data}
hf=https://huggingface.co/datasets/WHB139426/Grounded-VideoLLM/resolve/main

fetch_chunks() {  # name nchunks
  mkdir -p "${data_path}/$1" && cd "${data_path}/$1"
  for i in $(seq 1 "$2"); do
    wget -O "chunk_${i}.zip" "${hf}/$1/chunk_${i}.zip"
    unzip -o "chunk_${i}.zip" && rm -f "chunk_${i}.zip"
  done
  cd - >/dev/null
}

fetch_chunks webvid-703k 15
fetch_chunks internvid 10
fetch_chunks panda70m_2m 25

mkdir -p "${data_path}/mix_pretrain"
wget -O "${data_path}/mix_pretrain/mix_pretrain.json" "${hf}/mix_pretrain/mix_pretrain.json"
