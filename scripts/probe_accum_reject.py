"""Isolate WHY the helper rejects make_host_accum_step's grad program.

probe_train_b2.py proves plain value_and_grad compiles (B=1 S=7515, 73.1s on
the recovered service) while bench_train's grad_accum_fn — the same autodiff
plus a fused accumulate epilogue and a donated carry — is rejected
deterministically even at S_text=3000. Three legs bisect the feature:

  1. plain       value_and_grad (control)
  2. accum       + fused carry add, NO donation
  3. accum_don   + donate_argnums on the carry

Usage: python scripts/probe_accum_reject.py [S_text]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

S_TEXT = int(sys.argv[1]) if len(sys.argv) > 1 else 3000


def probe(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"{name:24s} OK    {time.time()-t0:7.1f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        kind = ("COMPILE_HELPER" if "exit code 1" in str(e) else
                "OOM" if "RESOURCE_EXHAUSTED" in str(e)
                else type(e).__name__)
        print(f"{name:24s} {kind:14s} {time.time()-t0:7.1f}s  "
              f"{str(e)[:120]}".replace("\n", " "), flush=True)


def main():
    from grounded_video_llm_tpu.core.config import STAGE_PRESETS, vlm_config
    from grounded_video_llm_tpu.models import vlm
    from grounded_video_llm_tpu.train import lora as lora_mod
    from grounded_video_llm_tpu.train.optimizer import (make_optimizer,
                                                        trainable_mask)
    from grounded_video_llm_tpu.train.step import (merge_params,
                                                   partition_params)

    stage = STAGE_PRESETS["grounded"]
    cfg = vlm_config("phi3.5", stage="grounded")
    print(f"devices: {jax.devices()}  S_text={S_TEXT}", flush=True)

    def build(k):
        p = dict(vlm.init_params(k, cfg, dtype=jnp.bfloat16))
        p["llm"] = lora_mod.attach_lora(
            p["llm"], lora_mod.init_lora(jax.random.fold_in(k, 1), cfg.llm,
                                         rank=128, dtype=jnp.bfloat16))
        return p

    params = jax.jit(build)(jax.random.key(0))
    jax.block_until_ready(params)
    tx, labels = make_optimizer(stage, total_steps=10, params=params)
    mask = trainable_mask(labels)
    trainable, frozen = partition_params(params, mask)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 30000, size=(1, S_TEXT)).astype(np.int32)
    ids[:, 1] = -200
    batch = vlm.Batch(
        input_ids=jnp.asarray(ids), labels=jnp.asarray(ids),
        attn_mask=jnp.ones((1, S_TEXT), jnp.int32),
        spatial_pixels=jnp.zeros((1, cfg.num_segs, 336, 336, 3),
                                 jnp.bfloat16),
        temporal_pixels=jnp.zeros((1, cfg.num_frames, 224, 224, 3),
                                  jnp.bfloat16),
        is_text=jnp.zeros((1,), bool))

    def lf(t, f, mb, r):
        return vlm.forward_loss(merge_params(t, f), cfg, mb, remat=True,
                                lora_dropout=stage.lora_dropout,
                                dropout_rng=r)

    key = jax.random.key(0)

    f1 = jax.jit(jax.value_and_grad(lf))
    probe("plain_vag", lambda: float(f1(trainable, frozen, batch, key)[0]))

    def accum_body(t, f, mb, r, carry):
        loss, grads = jax.value_and_grad(lf)(t, f, mb, r)
        ls, gs = carry
        return (ls + loss,
                jax.tree_util.tree_map(lambda a, g: a + g.astype(a.dtype),
                                       gs, grads))

    def zero_carry():
        return (jnp.zeros((), jnp.float32),
                jax.tree_util.tree_map(
                    lambda p: jnp.zeros(p.shape, jnp.bfloat16), trainable))

    f2 = jax.jit(accum_body)
    probe("accum_nodon",
          lambda: float(f2(trainable, frozen, batch, key, zero_carry())[0]))

    f3 = jax.jit(accum_body, donate_argnums=(4,))
    probe("accum_donate",
          lambda: float(f3(trainable, frozen, batch, key, zero_carry())[0]))


if __name__ == "__main__":
    main()
