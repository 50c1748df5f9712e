"""Training-throughput benchmark: grounded-stage step on the real chip,
with MFU accounting, batch-scaling points, and a phase split.

Measures the full grounded-stage train step (SURVEY §2.4 column 'grounded':
LoRA r=128 + trainable lm_head/embed + expanded vocab, remat decoder scan,
frozen encoders via trainable-partition autodiff) on the flagship Phi-3.5 VLM
with real grounded-shaped sequences (max_txt_len 4096 prompt side + 3420
video tokens ≈ 7.5k spliced length).

Env knobs:
  BENCH_TRAIN_BATCHES="1,2"  comma list of per-chip batch points, measured in
                             ONE process (same-process comparison; each point
                             is its own compiled program). Default "1".
  BENCH_TRAIN_BATCH=N        legacy single-point form (overridden by BATCHES).
  BENCH_TRAIN_PHASES=1       additionally time the encode-forward and
                             full-forward-loss programs at the first batch
                             point (adds two remote compiles) and print the
                             phase table encode / llm fwd / bwd+opt.

Prints ONE JSON line:
  {"metric": "train_s_per_sample", "value": ..., "unit": "s/sample",
   "mfu": ..., "model_tflops_per_sample": ..., "points": [...],
   "phases": {...} (BENCH_TRAIN_PHASES only), ...}

The reference publishes no train-step timings, so there is no vs_baseline
ratio — the artifact records our measured number and the pure-DP pod
projection (grounded-stage gradients are DP-replicated; projection = 8x the
single-chip rate, the same scaling the reference assumes across its 8 GPUs).

MFU accounting (analytic, documented assumptions — ±10% class estimate):
  * GEMM/conv forward FLOPs counted from the parameter tree (2·prod(shape)
    per routed token for every *_kernel / lm_head / LoRA leaf); LLM tokens =
    spliced length, encoder tokens = clip/seg sequence lengths, with the
    early-exit block fractions (IV2 39/40, CLIP 23/24) applied.
  * attention: causal LLM ≈ 2·B·S²·q_dim per layer forward (half of the
    bidirectional 4·S²·D); encoders bidirectional 4·S²·D.
  * backward multipliers: frozen encoders ×1 (no grad flows past the
    projectors); LLM GEMMs ×3 (forward + remat recompute + dx — base weights
    are FROZEN so no dW except LoRA/lm_head/embed; lm_head dW adds +1× its
    forward); LLM attention ×4.5 (forward + recompute + flash-bwd ≈ 2.5×).
  * v5e bf16 peak = 197 TFLOP/s.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

MEASURE_ITERS = 3
V5E_PEAK_TFLOPS = 197.0


def _batches():
    if os.environ.get("BENCH_TRAIN_BATCHES"):
        return [int(b) for b in os.environ["BENCH_TRAIN_BATCHES"].split(",")]
    return [int(os.environ.get("BENCH_TRAIN_BATCH", "1"))]


def _gemm_flops_per_token(tree, include=("kernel", "lm_head", "lora")) -> int:
    """2·prod(shape) per token over every GEMM/conv weight leaf. Conv patch
    embeds count correctly when multiplied by their OUTPUT token count (each
    output patch costs 2·prod(kernel) with stride==kernel)."""
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        name = jax.tree_util.keystr(path).lower()
        if not any(k in name for k in include):
            continue
        if "bias" in name or not hasattr(leaf, "ndim") or leaf.ndim < 2:
            continue
        total += 2 * int(np.prod(leaf.shape))
    return total


def train_step_flops(params, cfg, B: int, S_text: int) -> float:
    """Analytic model FLOPs of ONE grounded train step (see module docstring
    for the multiplier assumptions)."""
    S = S_text - 1 + cfg.num_video_tokens  # one <image> slot → video tokens
    ev, cl, lm = cfg.video, cfg.clip, cfg.llm

    # --- frozen encoders: forward only ---
    iv2_tok = B * cfg.num_segs * ev.seq_len
    iv2 = _gemm_flops_per_token(params["video_encoder"]) * iv2_tok
    iv2 *= ev.num_blocks_used / ev.depth  # early exit (trunk kernels dominate)
    iv2 += ev.num_blocks_used * 4 * (B * cfg.num_segs) * ev.seq_len ** 2 \
        * ev.embed_dim
    clip_tok = B * cfg.num_segs * (cl.num_patches + 1)
    clipf = _gemm_flops_per_token(params["clip"]) * clip_tok
    clipf *= (cl.num_layers - 1) / cl.num_layers  # penultimate tap
    clipf += (cl.num_layers - 1) * 4 * (B * cfg.num_segs) \
        * (cl.num_patches + 1) ** 2 * cl.hidden_size
    proj = sum(_gemm_flops_per_token(params[k]) * B * cfg.num_video_tokens
               for k in ("video_projector", "image_projector")
               if k in params)

    # --- LLM: fwd + remat recompute + dx (base frozen), lm_head dW extra ---
    llm_gemm = _gemm_flops_per_token(params["llm"]) * B * S
    lm_head_fwd = 2 * lm.hidden_size * lm.padded_vocab_size * B * S
    attn_fwd = lm.num_layers * 2 * B * S ** 2 * lm.q_dim  # causal half
    llm = 3.0 * llm_gemm + lm_head_fwd + 4.5 * attn_fwd

    return float(iv2 + clipf + proj + llm)


def _fetch(tree):
    """Host fetch = the only reliable barrier on the axon backend. Fetch a
    single element per leaf, not the leaf: the jit program has already run
    in full by the time any output element lands on the host (slicing happens
    OUTSIDE the jit boundary, so no dead-code narrowing), and fetching whole
    [B, 3420, 3072] feature tensors would time the tunnel transfer (~21MB),
    not the compute."""
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x[(0,) * getattr(x, "ndim", 0)]), tree)


def main():
    from grounded_video_llm_tpu.core.config import STAGE_PRESETS, vlm_config
    from grounded_video_llm_tpu.models import vlm
    from grounded_video_llm_tpu.train import lora as lora_mod
    from grounded_video_llm_tpu.train.optimizer import (make_optimizer,
                                                        trainable_mask)
    from grounded_video_llm_tpu.train.step import (create_train_state,
                                                   make_train_step)

    batches = _batches()
    phases_on = os.environ.get("BENCH_TRAIN_PHASES") == "1"
    print(f"devices: {jax.devices()}  batches={batches} phases={phases_on}",
          file=sys.stderr)
    stage = STAGE_PRESETS["grounded"]
    cfg = vlm_config("phi3.5", stage="grounded")
    S = stage.max_txt_len  # 4096; splice adds 3420 video tokens
    # BENCH_TRAIN_SEQ: reduced text length for the 2026-08-19 compile-helper
    # regression (flash S>=7296 rejected — COMPILE_HELPER_REGRESSION_r04.md).
    # S_text=3000 -> spliced 6419 <= 6912 compiles. The artifact labels such
    # runs reduced_seq so they are never confused with the full workload.
    reduced_seq = os.environ.get("BENCH_TRAIN_SEQ")
    if reduced_seq:
        S = int(reduced_seq)
        print(f"REDUCED seq: S_text={S} (spliced {S - 1 + cfg.num_video_tokens})",
              file=sys.stderr)

    def build_params(key):
        """Init + LoRA attach as ONE jittable program (CLAUDE.md: per-leaf
        init dispatch is ~25ms/call on axon)."""
        p = dict(vlm.init_params(key, cfg, dtype=jnp.bfloat16))
        p["llm"] = lora_mod.attach_lora(
            p["llm"],
            lora_mod.init_lora(jax.random.fold_in(key, 1), cfg.llm, rank=128,
                               dtype=jnp.bfloat16))
        return p

    # The train step DONATES its state (train/step.py:160), which invalidates
    # the params buffers after every measured point — and two live copies of
    # the 10GB bf16 tree would OOM the ~14.5GB HBM. So: a shape-only tree
    # feeds the optimizer labels + FLOPs model, and each point re-executes the
    # (once-compiled) init program for fresh buffers.
    _init_jit = jax.jit(build_params)
    fresh_params = lambda: _init_jit(jax.random.key(0))  # noqa: E731
    shapes = jax.eval_shape(build_params, jax.random.key(0))

    tx, labels = make_optimizer(stage, total_steps=100, params=shapes)
    step = make_train_step(cfg, tx, grad_accum=1, remat=True,
                           trainable_mask=trainable_mask(labels),
                           lora_dropout=stage.lora_dropout)

    def make_batch(B: int) -> vlm.Batch:
        rng = np.random.default_rng(0)
        ids = rng.integers(3, 30000, size=(B, S)).astype(np.int32)
        ids[:, 1] = -200
        return vlm.Batch(
            input_ids=jnp.asarray(ids), labels=jnp.asarray(ids),
            attn_mask=jnp.ones((B, S), jnp.int32),
            spatial_pixels=jnp.zeros(
                (B, cfg.num_segs, cfg.clip.image_size, cfg.clip.image_size, 3),
                jnp.bfloat16),
            temporal_pixels=jnp.zeros(
                (B, cfg.num_frames, cfg.video.image_size,
                 cfg.video.image_size, 3), jnp.bfloat16),
            is_text=jnp.zeros((B,), bool),
        )

    points = []

    def measure_point(B: int) -> dict:
        # fresh buffers per point: donate_argnums invalidated the old ones
        t0 = time.time()
        state = create_train_state(fresh_params(), tx)
        print(f"B={B} param init+opt state: {time.time()-t0:.1f}s",
              file=sys.stderr)
        batch = make_batch(B)
        try:
            t0 = time.time()
            state, metrics = step(state, batch)
            loss = float(metrics["loss"])  # host fetch = barrier
            print(f"B={B} compile+first step: {time.time()-t0:.1f}s "
                  f"loss={loss:.3f}", file=sys.stderr)

            t0 = time.time()
            for _ in range(MEASURE_ITERS):
                state, metrics = step(state, batch)
                loss = float(metrics["loss"])
        except Exception as e:  # OOM at a batch point: record and move on
            print(f"B={B} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
            return {"batch": B, "failed": type(e).__name__}
        step_s = (time.time() - t0) / MEASURE_ITERS
        flops = train_step_flops(shapes, cfg, B, S)
        mfu = flops / step_s / (V5E_PEAK_TFLOPS * 1e12)
        print(f"B={B}: step {step_s*1000:.0f} ms — "
              f"{step_s/B:.2f} s/sample, {flops/1e12:.0f} TFLOP/step, "
              f"MFU {mfu*100:.1f}%", file=sys.stderr)
        return {"batch": B, "s_per_sample": round(step_s / B, 4),
                "step_s": round(step_s, 4),
                "model_tflops_per_step": round(flops / 1e12, 1),
                "mfu": round(mfu, 4)}

    # first point, then phases (both at the safe batch), THEN larger points —
    # a larger-batch OOM can hard-crash the TPU worker (CLAUDE.md), so the
    # risky points run last
    points.append(measure_point(batches[0]))

    phases = None
    if phases_on:
        # phase programs are much smaller than the monolithic train step, so
        # they also serve as the PARTIAL artifact when the remote compile
        # service rejects the full step (observed: helper subprocess exit 1
        # on the ~760s grounded-step program while every smaller program
        # compiles — bwd_opt_s is then only derivable if the step ran)
        B = batches[0]
        batch = make_batch(B)
        params = fresh_params()  # point 0's step donated its copy
        enc = jax.jit(lambda p, b: vlm.encode_video(
            p, cfg, b.spatial_pixels, b.temporal_pixels))
        fwd = jax.jit(lambda p, b: vlm.forward_loss(p, cfg, b, remat=True))
        timings = {}
        for name, fn in (("encode_fwd", enc), ("forward_loss", fwd)):
            try:
                t0 = time.time()
                _fetch(fn(params, batch))
                print(f"{name} compile+first: {time.time()-t0:.1f}s",
                      file=sys.stderr)
                t0 = time.time()
                for _ in range(MEASURE_ITERS):
                    _fetch(fn(params, batch))
                timings[name] = (time.time() - t0) / MEASURE_ITERS
            except Exception as e:  # noqa: BLE001
                print(f"{name} FAILED: {type(e).__name__}: {str(e)[:160]}",
                      file=sys.stderr)
        del params  # free before the (riskier) larger batch points
        if timings:
            t_enc = timings.get("encode_fwd")
            t_fwd = timings.get("forward_loss")
            phases = {"batch": B}
            if t_enc is not None:
                phases["encode_fwd_s"] = round(t_enc, 3)
            if t_fwd is not None and t_enc is not None:
                phases["llm_fwd_s"] = round(t_fwd - t_enc, 3)
            if "s_per_sample" in points[0] and t_fwd is not None:
                step_s = points[0]["step_s"]
                phases["bwd_opt_s"] = round(step_s - t_fwd, 3)
                phases["step_s"] = round(step_s, 3)
            print(f"phases (B={B}): {phases}", file=sys.stderr)

    for B in batches[1:]:
        points.append(measure_point(B))

    ok_points = [p for p in points if "s_per_sample" in p]
    if not ok_points:  # backend failure: emit the failure record, exit 1
        rec = {"metric": "train_s_per_sample", "value": None,
               "seq_text": S, "points": points}
        if phases is not None:
            rec["phases"] = phases
        print(json.dumps(rec))
        sys.exit(1)
    best = min(ok_points, key=lambda p: p["s_per_sample"])
    pod_samples_per_sec = 8.0 * best["batch"] / best["step_s"]
    out = {
        "metric": "train_s_per_sample",
        "value": best["s_per_sample"],
        "unit": "s/sample",
        "batch": best["batch"],
        "seq_text": S,
        **({"reduced_seq_workaround": True} if reduced_seq else {}),
        "mfu": best["mfu"],
        "model_tflops_per_sample":
            round(best["model_tflops_per_step"] / best["batch"], 1),
        "points": points,
        "projected_v5e8_samples_per_sec": round(pod_samples_per_sec, 3),
        "reference_regime":
            "8xA100 global-batch 128 (scripts/phi3.5_grounded_8_a100.sh)",
    }
    if phases is not None:
        out["phases"] = phases
    print(json.dumps(out))


if __name__ == "__main__":
    main()
