"""Training-throughput benchmark: grounded-stage step on the real chip.

Measures the full grounded-stage train step (SURVEY §2.4 column 'grounded':
LoRA r=128 + trainable lm_head/embed + expanded vocab, remat decoder scan,
frozen encoders via trainable-partition autodiff) on the flagship Phi-3.5 VLM
at the largest single-chip batch, with real grounded-shaped sequences
(max_txt_len 4096 prompt side + 3420 video tokens ≈ 7.5k spliced length).

Prints ONE JSON line:
  {"metric": "train_s_per_sample", "value": ..., "unit": "s/sample",
   "projected_v5e8_samples_per_sec": ...,
   "reference_regime": "8xA100 global-batch 128 (scripts/phi3.5_grounded_8_a100.sh)"}

The reference publishes no train-step timings, so there is no vs_baseline
ratio — the artifact records our measured number and the pure-DP pod
projection (grounded-stage gradients are DP-replicated; projection = 8x the
single-chip rate, the same scaling the reference assumes across its 8 GPUs).

BENCH_TRAIN_BATCH (default 1) selects the per-chip batch.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("BENCH_TRAIN_BATCH", "1"))
MEASURE_ITERS = 3


def main():
    from grounded_video_llm_tpu.core.config import (STAGE_PRESETS, vlm_config)
    from grounded_video_llm_tpu.models import vlm
    from grounded_video_llm_tpu.train import lora as lora_mod
    from grounded_video_llm_tpu.train.optimizer import (make_optimizer,
                                                        trainable_mask)
    from grounded_video_llm_tpu.train.step import (create_train_state,
                                                   make_train_step)

    print(f"devices: {jax.devices()}  batch={B}", file=sys.stderr)
    stage = STAGE_PRESETS["grounded"]
    cfg = vlm_config("phi3.5", stage="grounded")

    t0 = time.time()
    params = jax.jit(lambda k: vlm.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0))
    params["llm"] = lora_mod.attach_lora(
        params["llm"],
        lora_mod.init_lora(jax.random.key(1), cfg.llm, rank=128,
                           dtype=jnp.bfloat16))
    jax.block_until_ready(params)
    print(f"param init: {time.time()-t0:.1f}s", file=sys.stderr)

    tx, labels = make_optimizer(stage, total_steps=100, params=params)
    state = create_train_state(params, tx)
    step = make_train_step(cfg, tx, grad_accum=1, remat=True,
                           trainable_mask=trainable_mask(labels),
                           lora_dropout=stage.lora_dropout)

    S = stage.max_txt_len  # 4096; splice adds 3420 video tokens
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 30000, size=(B, S)).astype(np.int32)
    ids[:, 1] = -200
    batch = vlm.Batch(
        input_ids=jnp.asarray(ids), labels=jnp.asarray(ids),
        attn_mask=jnp.ones((B, S), jnp.int32),
        spatial_pixels=jnp.zeros((B, cfg.num_segs, 336, 336, 3), jnp.bfloat16),
        temporal_pixels=jnp.zeros((B, cfg.num_frames, 224, 224, 3),
                                  jnp.bfloat16),
        is_text=jnp.zeros((B,), bool),
    )

    t0 = time.time()
    state, metrics = step(state, batch)
    loss = float(metrics["loss"])  # host fetch = barrier
    print(f"compile+first step: {time.time()-t0:.1f}s loss={loss:.3f}",
          file=sys.stderr)

    t0 = time.time()
    for _ in range(MEASURE_ITERS):
        state, metrics = step(state, batch)
        loss = float(metrics["loss"])
    step_s = (time.time() - t0) / MEASURE_ITERS
    s_per_sample = step_s / B
    pod_samples_per_sec = 8.0 * B / step_s  # pure-DP replication across v5e-8

    print(f"step: {step_s*1000:.0f} ms (B={B}, seq 4096+3420) — "
          f"{s_per_sample:.2f} s/sample; projected v5e-8 "
          f"{pod_samples_per_sec:.2f} samples/s "
          f"(global-batch-128 step ≈ {128/pod_samples_per_sec:.1f}s)",
          file=sys.stderr)
    print(json.dumps({
        "metric": "train_s_per_sample",
        "value": round(s_per_sample, 4),
        "unit": "s/sample",
        "batch": B,
        "projected_v5e8_samples_per_sec": round(pod_samples_per_sec, 3),
        "reference_regime":
            "8xA100 global-batch 128 (scripts/phi3.5_grounded_8_a100.sh)",
    }))


if __name__ == "__main__":
    main()
