"""grounded_video_llm_tpu — a TPU-native video-LLM framework.

A from-scratch JAX / XLA / Pallas / pjit framework with the capabilities of
Grounded-VideoLLM (reference: WHB139426/Grounded-Video-LLM): fine-grained temporal
grounding, dense video captioning, grounded VideoQA, and general video understanding
through a dual-stream encoder (CLIP ViT-L/14-336 spatial + InternVideo2-1B temporal),
discrete temporal tokens <0>..<300>, and a Phi-3.5 / Llama-3 language model.

Layout:
    core/      typed configs, mesh + sharding, dtype policy, checkpointing
    text/      chat templates, tokenizers, temporal-token codec, label masking
    models/    pure-function JAX models: CLIP ViT, InternVideo2, projectors, LLMs, VLM
    ops/       Pallas kernels + XLA reference ops (attention, rmsnorm, rope, preprocess)
    video/     frame sampling + decoding (C++ libav decoder with Python fallback)
    data/      dataset mixes, collation, resumable loader
    train/     pjit train step, optimizer groups, LoRA, stage presets, resume
    serve/     generation engine (prefill/decode, KV cache, sampling), grounding parser
    parallel/  mesh axes and partition-spec rules for DP/FSDP/TP/SP
    obs/       rank-aware logging, JSONL metric trackers, profiling hooks
"""

__version__ = "0.1.0"
