"""Same-process A/B: dynamic vs STATIC W8A8 activation scales on the IV2 trunk.

Round-4 finding (MICROBENCH_IV2_r04.txt): fc2's dynamic activation quant
costs ~7 ms/block — two unavoidable HBM passes (rowmax, then scale+round)
over the ~1.8GB gelu output at the 72-clip serving shape. serve/calibrate.py
replaces the per-row scale with a calibrated per-tensor scale so the
quantize becomes a pure elementwise epilogue XLA fuses into fc1's dot (the
bf16 gelu output never round-trips HBM).

Variants (full trunk forward, real serving config, interleaved same-process
per the box-drift rule):

  dynamic      — shipped W8A8 path (per-row dynamic activations, all legs)
  static_fc2   — static scale on fc2 only
  static_f2p   — fc2 + proj (proj's dynamic quant measured a net LOSS
                 6.3→6.6 ms vs bf16 — static may flip it)
  static_all   — all four legs (qkv/proj/fc1/fc2)

Expected: ~7 ms/block on fc2 (≈ 0.27 s over 39 blocks at 72 clips) + ~1-2 on
proj. Reports sec/forward and ms/block deltas.

Usage: python scripts/microbench_static_scales.py [clips] [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CLIPS = int(sys.argv[1]) if len(sys.argv) > 1 else 72   # batch-6 serving
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main():
    from grounded_video_llm_tpu.core.config import vlm_config
    from grounded_video_llm_tpu.models import internvideo2
    from grounded_video_llm_tpu.serve import calibrate
    from grounded_video_llm_tpu.serve.quantize import (
        quantize_video_encoder_for_serving)

    cfg = vlm_config("phi3.5", stage="inference")
    vcfg = cfg.video
    print(f"devices: {jax.devices()}  clips={CLIPS} "
          f"blocks={vcfg.num_blocks_used}", file=sys.stderr)

    t0 = time.time()
    params = jax.jit(lambda k: quantize_video_encoder_for_serving(
        internvideo2.init_params(k, vcfg, dtype=jnp.bfloat16)))(
            jax.random.key(0))
    jax.block_until_ready(params)
    print(f"init+quantize: {time.time()-t0:.1f}s", file=sys.stderr)

    fps = cfg.num_frames_per_seg
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.normal(size=(CLIPS, fps, vcfg.image_size,
                                         vcfg.image_size, 3)).astype(
                                             np.float32) * 0.5, jnp.bfloat16)

    # calibration: one pass over the same pixel distribution (random weights
    # + representative pixels is mechanically valid for the PERF figure)
    t0 = time.time()
    stats = jax.jit(lambda p, c: internvideo2.features_absmax(
        p, vcfg, c)[1])(params, clips)
    calib = jax.tree_util.tree_map(np.asarray, stats)
    print(f"calibration pass: {time.time()-t0:.1f}s", file=sys.stderr)

    trees = {
        "dynamic": params,
        "static_fc2": calibrate.apply_static_scales(params, calib,
                                                    legs=("fc2",)),
        "static_f2p": calibrate.apply_static_scales(params, calib,
                                                    legs=("fc2", "proj")),
        "static_all": calibrate.apply_static_scales(params, calib,
                                                    legs=calibrate.LEGS),
    }

    run = jax.jit(lambda p, c: internvideo2.features(p, vcfg, c),
                  static_argnums=())
    # NOTE: one jit instance; each tree's distinct treedef compiles its own
    # program through it (same cache, no fresh-jit recompile trap)

    # interleave: compile everything first, then measure round-robin
    # (host fetch of one element = the reliable barrier on axon)
    results = {}
    for name, tree in trees.items():
        o = run(tree, clips)
        np.asarray(o[0, 0, :1])
    for rep in range(REPS):
        for name, tree in trees.items():
            t0 = time.time()
            o = run(tree, clips)
            np.asarray(o[0, 0, :1])
            dt = time.time() - t0
            results.setdefault(name, []).append(dt)
            print(f"rep{rep} {name:12s} {dt:.3f}s", file=sys.stderr)

    best = {k: min(v) for k, v in results.items()}
    base = best["dynamic"]
    summary = {
        "metric": "iv2_static_scales_sec_per_forward",
        "clips": CLIPS,
        **{k: round(v, 4) for k, v in best.items()},
        "delta_ms_per_block": {
            k: round(1000 * (base - v) / vcfg.num_blocks_used, 2)
            for k, v in best.items() if k != "dynamic"},
        "speedup": {k: round(base / v, 4) for k, v in best.items()
                    if k != "dynamic"},
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
