"""Static W8A8 activation-scale calibration for the InternVideo2 trunk.

The dynamic W8A8 path (ops/int8_matmul.dynamic_int8_matmul) pays two full
HBM passes over each GEMM input to quantize it per-row (absmax, then
scale+round). For fc2 the input is the ~1.8GB gelu output and those passes
measured ~7 ms/block — 39 blocks ≈ 0.27 s/batch-6, the largest quantified
single-chip e2e lever left after round 4 (MICROBENCH_IV2_r04.txt).

This module replaces the per-row dynamic scale with a CALIBRATED per-tensor
static scale per block per leg:

1. `calibrate_video_encoder` runs the serving forward over N sample clips
   recording per-block PER-CHANNEL input absmaxes for every GEMM leg
   (models/internvideo2.features_absmax) — the per-channel record is kept so
   a finer scheme (channel-smoothed scales a la SmoothQuant) can be derived
   later without re-running calibration.
2. `static_scales_from_absmax` reduces them to per-tensor int8 scales
   (max over channels × margin / 127).
3. `apply_static_scales` writes an "x_scale" [Lyr] leaf into the chosen
   kernel dicts; ops/int8_matmul.matmul_any dispatches on it, and XLA fuses
   the now-pure-elementwise quantize into the producing op's epilogue (for
   fc2: fc1's dot → bias → gelu → int8, the bf16 gelu output never
   round-trips HBM).

Accuracy: per-tensor static is coarser than per-row dynamic; the committed
quant_ab bar (serve/quant_ab.py, eval.py --quantize_ab --static_scales)
delivers the verdict automatically when real weights land. Calibration on
random weights + real pixels is mechanically valid for the PERF measurement
(scales land in a sane range); the accuracy numbers only mean something with
real checkpoints.

Matches: the MLP/projection quantization surface of
/root/reference/models/internvideo2.py:639-692 (reference runs bf16; this is
a serving approximation the reference does not attempt).
"""

from __future__ import annotations

from typing import Dict, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import VLMConfig
from ..models import internvideo2

# Encoder GEMM legs, in block order. fc2 (the gelu output) is the expensive
# one; proj is the leg where DYNAMIC quant measured a net loss (6.3→6.6 ms,
# MICROBENCH_IV2_r04.txt) because its input is small but the rowmax passes
# are not free.
LEGS = ("qkv", "proj", "fc1", "fc2")
DEFAULT_LEGS = ("fc2", "proj")
# Headroom over the observed calibration max: absmax clipping saturates
# rarely-seen outliers instead of scaling everything else down.
DEFAULT_MARGIN = 1.0


def calibrate_video_encoder(params, cfg: VLMConfig,
                            temporal_pixel_batches: Iterable[np.ndarray]
                            ) -> Dict[str, np.ndarray]:
    """Run the IV2 trunk over calibration clip batches, return per-block
    per-channel input absmaxes {"qkv"/"proj"/"fc1" [Lyr, D], "fc2"
    [Lyr, mlp_hidden]} max-reduced over batches.

    `params` is the FULL VLM tree (bf16 or serving-quantized — calibrate on
    the tree that will serve so the stats match its numerics); batches are
    [B, num_frames, S, S, 3] preprocessed temporal pixels exactly as the
    serving path feeds encode_video (uint8 raw-resized or pre-normalized
    float — the same _maybe_normalize dispatch applies)."""
    from ..models.vlm import _maybe_normalize
    from ..ops.preprocess import INTERNVIDEO_MEAN, INTERNVIDEO_STD

    enc = params["video_encoder"]
    enc_dtype = enc["patch_kernel"].dtype
    fps = cfg.num_frames_per_seg

    def stats_fn(p, px):
        px = _maybe_normalize(px, INTERNVIDEO_MEAN, INTERNVIDEO_STD,
                              enc_dtype)
        B = px.shape[0]
        clips = px.reshape(B * cfg.num_segs, fps, *px.shape[2:])
        return internvideo2.features_absmax(p, cfg.video, clips)[1]

    run = jax.jit(stats_fn)
    agg: Dict[str, np.ndarray] = {}
    for px in temporal_pixel_batches:
        stats = jax.tree_util.tree_map(np.asarray, run(enc, jnp.asarray(px)))
        for leg in LEGS:
            agg[leg] = (np.maximum(agg[leg], stats[leg]) if leg in agg
                        else stats[leg])
    return agg


def static_scales_from_absmax(calib: Dict[str, np.ndarray],
                              legs: Sequence[str] = DEFAULT_LEGS,
                              margin: float = DEFAULT_MARGIN
                              ) -> Dict[str, np.ndarray]:
    """Per-channel absmaxes → per-tensor int8 scales [Lyr] per leg."""
    out = {}
    for leg in legs:
        amax = np.asarray(calib[leg], np.float32).max(axis=-1)  # [Lyr]
        out[leg] = np.maximum(amax * margin / 127.0, 1e-8).astype(np.float32)
    return out


def apply_static_scales(encoder_params: dict,
                        calib: Dict[str, np.ndarray],
                        legs: Sequence[str] = DEFAULT_LEGS,
                        margin: float = DEFAULT_MARGIN) -> dict:
    """Insert "x_scale" [Lyr_total] leaves into the W8A8 kernel dicts of the
    chosen legs. The trunk's lax.scan slices the leaf to a per-block scalar;
    blocks past num_blocks_used (the early-exit tail) pad with 1.0 — they
    never run. Requires quantize_video_encoder_for_serving to have run first
    (kernels must already be {"q","scale"} dicts)."""
    scales = static_scales_from_absmax(calib, legs, margin)
    blocks = dict(encoder_params["blocks"])
    n_total = np.asarray(blocks["norm1_w"]).shape[0]

    def padded(s):
        if s.shape[0] < n_total:
            s = np.concatenate(
                [s, np.ones(n_total - s.shape[0], np.float32)])
        return jnp.asarray(s)

    for leg in legs:
        kernel_key = "qkv_kernel" if leg == "qkv" else leg
        node = blocks[kernel_key]
        kern = node if leg == "qkv" else node["kernel"]
        if not (isinstance(kern, dict) and "q" in kern):
            raise ValueError(
                f"leg {leg!r} is not W8A8-quantized; run "
                "quantize_video_encoder_for_serving first")
        kern = dict(kern)
        kern["x_scale"] = padded(scales[leg])
        if leg == "qkv":
            blocks[kernel_key] = kern
        else:
            node = dict(node)
            node["kernel"] = kern
            blocks[kernel_key] = node
    out = dict(encoder_params)
    out["blocks"] = blocks
    return out


def calibrate_and_apply(params: dict, cfg: VLMConfig,
                        temporal_pixel_batches: Iterable[np.ndarray],
                        legs: Sequence[str] = DEFAULT_LEGS,
                        margin: float = DEFAULT_MARGIN) -> dict:
    """One-call wrapper: calibrate on the given clips, return a new VLM tree
    with static scales applied to the video encoder."""
    calib = calibrate_video_encoder(params, cfg, temporal_pixel_batches)
    out = dict(params)
    out["video_encoder"] = apply_static_scales(
        params["video_encoder"], calib, legs, margin)
    return out
