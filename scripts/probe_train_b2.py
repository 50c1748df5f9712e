"""Bisect the B=2 grounded-train-step failure (VERDICT r4 task 2).

BENCH_TRAIN_r04.json recorded {"batch": 2, "failed": "JaxRuntimeError"} with
no attribution. Two suspects:
  (a) the axon compile-helper regression (COMPILE_HELPER_REGRESSION_r04.md:
      program-size-dependent, flash squares S>=7296 rejected instantly) also
      rejecting the LARGER B=2 step program, or
  (b) a legitimate HBM OOM: params ~8GB bf16 + opt state + B=2 activations
      at spliced S=7515 on the ~14.5GB-usable v5e.

This probes each constituent program at B=2, smallest first (an OOM can
hard-crash the TPU worker for ~90s — CLAUDE.md), classifying every failure
by error text: "tpu_compile_helper"/"INTERNAL" = helper rejection (fails in
seconds, before any execution), "RESOURCE_EXHAUSTED" = real OOM (fails after
a successful compile). Each program is its own jit so the failure point is
unambiguous:

  1. flash layer fwd      B=2 x S=7515 (the r4 regression was B=1 squares)
  2. flash layer fwd+bwd  the two-kernel bwd at B=2
  3. chunked CE fwd+bwd   B=2 hidden -> lm_head -> CE
  4. encode_video fwd     B=2 pixels (24 clips)
  5. forward_loss fwd     the full fwd at B=2
  6. value_and_grad       fwd+bwd, no optimizer
  7. full train step      fwd+bwd+AdamW (the program that failed in r4)

Usage: python scripts/probe_train_b2.py [B] [S_text]
Writes nothing; the dated result goes into the round notes / CLAUDE.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
S_TEXT = int(sys.argv[2]) if len(sys.argv) > 2 else 4096


def classify(e: Exception) -> str:
    s = f"{type(e).__name__}: {e}"
    if "RESOURCE_EXHAUSTED" in s or "Out of memory" in s.lower():
        return "OOM"
    if "tpu_compile_helper" in s or "exit code 1" in s:
        return "COMPILE_HELPER"
    return type(e).__name__


def probe(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"{name:24s} OK    {time.time()-t0:7.1f}s", flush=True)
        return "OK"
    except Exception as e:  # noqa: BLE001
        kind = classify(e)
        msg = str(e).replace("\n", " ")[:140]
        print(f"{name:24s} {kind:14s} {time.time()-t0:7.1f}s  {msg}",
              flush=True)
        if kind == "OOM":
            time.sleep(20)  # let the worker settle before the next probe
        return kind


def main():
    from grounded_video_llm_tpu.core.config import STAGE_PRESETS, vlm_config
    from grounded_video_llm_tpu.models import llm as llm_mod
    from grounded_video_llm_tpu.models import vlm
    from grounded_video_llm_tpu.ops.flash_attention import flash_mha
    from grounded_video_llm_tpu.train import lora as lora_mod
    from grounded_video_llm_tpu.train.optimizer import (make_optimizer,
                                                        trainable_mask)
    from grounded_video_llm_tpu.train.step import (create_train_state,
                                                   make_train_step)

    stage = STAGE_PRESETS["grounded"]
    cfg = vlm_config("phi3.5", stage="grounded")
    lm = cfg.llm
    S_sp = S_TEXT - 1 + cfg.num_video_tokens
    print(f"devices: {jax.devices()}  B={B} S_text={S_TEXT} spliced={S_sp}",
          flush=True)
    key = jax.random.key(0)

    # -- 1/2: flash layer at B, isolated (small HBM footprint) --------------
    q = jax.random.normal(key, (B, S_sp, lm.num_heads, lm.head_dim),
                          jnp.bfloat16)
    kv = jax.random.normal(key, (B, S_sp, lm.num_kv_heads, lm.head_dim),
                           jnp.bfloat16)
    f_fwd = jax.jit(lambda q, k, v: flash_mha(q, k, v, causal=True))
    probe(f"flash_fwd_B{B}", lambda: np.asarray(f_fwd(q, kv, kv)[0, 0, 0, 0]))
    f_bwd = jax.jit(jax.grad(
        lambda q, k, v: flash_mha(q, k, v, causal=True)
        .astype(jnp.float32).sum()))
    probe(f"flash_fwd_bwd_B{B}",
          lambda: np.asarray(f_bwd(q, kv, kv)[0, 0, 0, 0]))
    del q, kv

    # -- params (init once; bf16 + LoRA as the real step uses) --------------
    def build_params(k):
        p = dict(vlm.init_params(k, cfg, dtype=jnp.bfloat16))
        p["llm"] = lora_mod.attach_lora(
            p["llm"], lora_mod.init_lora(jax.random.fold_in(k, 1), cfg.llm,
                                         rank=128, dtype=jnp.bfloat16))
        return p

    init_jit = jax.jit(build_params)
    t0 = time.time()
    params = init_jit(jax.random.key(0))
    jax.block_until_ready(params)
    print(f"param init: {time.time()-t0:.1f}s", flush=True)

    # -- 3: chunked CE at B --------------------------------------------------
    hidden = jax.random.normal(key, (B, S_sp, lm.hidden_size), jnp.bfloat16)
    lbl = jnp.zeros((B, S_sp), jnp.int32)
    llm_p = params["llm"]

    def ce(h, w):
        p2 = dict(llm_p)
        p2["lm_head"] = w
        return llm_mod.causal_lm_loss_from_hidden(p2, h, lbl)

    ce_g = jax.jit(jax.grad(ce, argnums=(0, 1)))
    probe(f"ce_fwd_bwd_B{B}",
          lambda: np.asarray(ce_g(hidden, llm_p["lm_head"])[0][0, 0, 0]))
    # drop every extra reference to the param buffers before the donating
    # train step (a still-referenced donated buffer forces a copy)
    del hidden, ce_g, llm_p

    # -- batch ---------------------------------------------------------------
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 30000, size=(B, S_TEXT)).astype(np.int32)
    ids[:, 1] = -200
    batch = vlm.Batch(
        input_ids=jnp.asarray(ids), labels=jnp.asarray(ids),
        attn_mask=jnp.ones((B, S_TEXT), jnp.int32),
        spatial_pixels=jnp.zeros(
            (B, cfg.num_segs, cfg.clip.image_size, cfg.clip.image_size, 3),
            jnp.bfloat16),
        temporal_pixels=jnp.zeros(
            (B, cfg.num_frames, cfg.video.image_size, cfg.video.image_size,
             3), jnp.bfloat16),
        is_text=jnp.zeros((B,), bool))

    # -- 4: encode fwd --------------------------------------------------------
    enc = jax.jit(lambda p, b: vlm.encode_video(p, cfg, b.spatial_pixels,
                                                b.temporal_pixels))
    probe(f"encode_fwd_B{B}",
          lambda: np.asarray(enc(params, batch)[0, 0, 0]))

    # -- 5: forward_loss fwd ---------------------------------------------------
    fwd = jax.jit(lambda p, b: vlm.forward_loss(p, cfg, b, remat=True))
    probe(f"forward_loss_B{B}", lambda: float(fwd(params, batch)))

    # -- 6: value_and_grad ------------------------------------------------------
    from grounded_video_llm_tpu.train.step import (merge_params,
                                                   partition_params)

    tx, labels2 = make_optimizer(stage, total_steps=10, params=params)
    mask = trainable_mask(labels2)
    trainable, frozen = partition_params(params, mask)

    def lf(t, f, mb):
        return vlm.forward_loss(merge_params(t, f), cfg, mb, remat=True,
                                lora_dropout=stage.lora_dropout,
                                dropout_rng=jax.random.key(0))

    grad_fn = jax.jit(jax.value_and_grad(lf))
    probe(f"value_and_grad_B{B}",
          lambda: float(grad_fn(trainable, frozen, batch)[0]))
    del trainable, frozen, grad_fn

    # -- 7: the full step (the r4 failure) --------------------------------------
    step = make_train_step(cfg, tx, grad_accum=1, remat=True,
                           trainable_mask=mask,
                           lora_dropout=stage.lora_dropout)
    state = create_train_state(params, tx)
    del params  # state.params aliases these buffers; step donates them

    def run_step():
        nonlocal state
        state, metrics = step(state, batch)
        return float(metrics["loss"])

    probe(f"train_step_B{B}", run_step)


if __name__ == "__main__":
    main()
