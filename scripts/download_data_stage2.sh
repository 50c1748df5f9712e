#!/usr/bin/env bash
# Stage-2 (grounded) data: InternVid-G, vtimellm_stage2, Moment-10m + mix_grounded.json
# Mirrors reference scripts/download_data_stage2.sh.
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

fetch_chunks internvid_g 20
fetch_chunks vtimellm_stage2 10
fetch_chunks moment_10m 40

mkdir -p "${data_path}/mix_grounded"
wget -O "${data_path}/mix_grounded/mix_grounded.json" "${hf}/mix_grounded/mix_grounded.json"
