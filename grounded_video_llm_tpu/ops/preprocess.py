"""Frame preprocessing: resize (bicubic, shorter edge) → center crop → normalize.

Parity with reference mm_utils/utils.py:153-183 (torchvision Compose) in two
parameterizations (mm_utils/utils.py:147-151):
  temporal stream: 224px, INTERNVIDEO mean/std
  spatial  stream: 336px, OPENAI (CLIP) mean/std

Two implementations:
  * host   — PIL-bit-exact fixed-point bicubic (ops/pil_resize.py: native C++
             when cpp/ is built, numpy fallback), used by data-loader workers
             (decode already lives on the host; keeping preprocess there
             overlaps with TPU compute).
  * xla    — jit-able jax version for the serving path, where frames go to the
             device raw-uint8 (small transfer) and the whole resize/normalize
             fuses into the encoder's first conv input pipeline.

Output layout is channel-last [T, S, S, 3] — TPU conv-friendly (the reference
produces [T, 3, S, S] for cuDNN).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

OPENAI_DATASET_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_DATASET_STD = (0.26862954, 0.26130258, 0.27577711)
INTERNVIDEO_MEAN = (0.485, 0.456, 0.406)
INTERNVIDEO_STD = (0.229, 0.224, 0.225)


def _resize_shape(h: int, w: int, size: int) -> Tuple[int, int]:
    """Shorter edge → size, aspect preserved. torchvision 0.16.2 (the
    reference's pinned version) TRUNCATES the long edge:
    `int(size * long / short)` (transforms/functional.py int-size path)."""
    from .pil_resize import resized_shape_torchvision

    return resized_shape_torchvision(h, w, size)


def _crop_box(h: int, w: int, size: int) -> Tuple[int, int]:
    """torchvision CenterCrop origin (round-half-down used by PIL)."""
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return top, left


# ---------------------------------------------------------------------------
# Host path (cv2)
# ---------------------------------------------------------------------------


def preprocess_frames_host(
    frames: np.ndarray,  # uint8 [T, H, W, 3]
    size: int,
    mean: Tuple[float, float, float],
    std: Tuple[float, float, float],
    dtype=np.float32,
) -> np.ndarray:
    """PIL-bit-exact pixel path (ops/pil_resize.py): uint8 frames resized and
    cropped exactly as the reference's ToPILImage → Resize(BICUBIC) →
    CenterCrop → ToTensor → Normalize (mm_utils/utils.py:153-183)."""
    u8 = resize_frames_host_u8(frames, size)
    mean_arr = np.asarray(mean, dtype=np.float32)
    std_arr = np.asarray(std, dtype=np.float32)
    out = (u8.astype(np.float32) / 255.0 - mean_arr) / std_arr
    return out.astype(dtype, copy=False)


# ---------------------------------------------------------------------------
# XLA path
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("size", "mean", "std", "out_dtype"))
def preprocess_frames_xla(
    frames: jax.Array,  # uint8 [T, H, W, 3]
    size: int,
    mean: Tuple[float, float, float],
    std: Tuple[float, float, float],
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    T, h, w, _ = frames.shape
    rh, rw = _resize_shape(h, w, size)
    x = frames.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (T, rh, rw, 3), method="bicubic", antialias=True)
    # bicubic can overshoot outside [0,1]; PIL clips at the uint8 boundary.
    x = jnp.clip(x, 0.0, 1.0)
    top, left = _crop_box(rh, rw, size)
    x = jax.lax.dynamic_slice(x, (0, top, left, 0), (T, size, size, 3))
    mean_arr = jnp.asarray(mean, dtype=jnp.float32)
    std_arr = jnp.asarray(std, dtype=jnp.float32)
    x = (x - mean_arr) / std_arr
    return x.astype(out_dtype)


def dual_stream_preprocess_host(
    frames: np.ndarray,
    num_segs: int,
    temporal_size: int = 224,
    spatial_size: int = 336,
    dtype=np.float32,
) -> Tuple[np.ndarray, np.ndarray]:
    """frames uint8 [num_frames,H,W,3] → (temporal [F,224,224,3],
    spatial [num_segs,336,336,3]) — the dual-stream inputs of reference
    inference.py:65-90 (temporal: all frames @224/InternVideo norm; spatial:
    mid-segment frames @336/CLIP norm)."""
    from ..video.sampling import spatial_indices

    num_frames = frames.shape[0]
    temporal = preprocess_frames_host(frames, temporal_size,
                                      INTERNVIDEO_MEAN, INTERNVIDEO_STD, dtype)
    idx = spatial_indices(num_frames, num_segs)
    spatial = preprocess_frames_host(frames[idx], spatial_size,
                                     OPENAI_DATASET_MEAN, OPENAI_DATASET_STD, dtype)
    return temporal, spatial


def resize_frames_host_u8(frames: np.ndarray, size: int) -> np.ndarray:
    """Resize (bicubic, shorter edge) → center crop, staying uint8 — the
    host half of the hybrid serving path (normalize runs on-device,
    models/vlm.py:_maybe_normalize). Matches preprocess_frames_host's
    geometry exactly; only the float conversion moves to the TPU, where the
    cast+normalize fuses into the encoder's first conv. ~2x less host CPU per
    video and 4x smaller host→device transfer (uint8 vs fp32).

    The resize is PIL-bit-exact (ops/pil_resize.py: antialiased fixed-point
    bicubic, native C++ when cpp/ is built, numpy fallback otherwise) — the
    frozen encoders were trained on PIL pixels, so cv2.INTER_CUBIC
    (no antialias) was an uncontrolled input perturbation."""
    from .pil_resize import resize_bicubic_batch_u8

    T, h, w, _ = frames.shape
    rh, rw = _resize_shape(h, w, size)
    top, left = _crop_box(rh, rw, size)
    r = resize_bicubic_batch_u8(np.ascontiguousarray(frames), rh, rw)
    return np.ascontiguousarray(r[:, top:top + size, left:left + size])


def dual_stream_resize_host(
    frames: np.ndarray,
    num_segs: int,
    temporal_size: int = 224,
    spatial_size: int = 336,
) -> Tuple[np.ndarray, np.ndarray]:
    """Hybrid-path analogue of dual_stream_preprocess_host: uint8 outputs,
    normalization deferred to the device (same stream split semantics)."""
    from ..video.sampling import spatial_indices

    num_frames = frames.shape[0]
    temporal = resize_frames_host_u8(frames, temporal_size)
    idx = spatial_indices(num_frames, num_segs)
    spatial = resize_frames_host_u8(frames[idx], spatial_size)
    return temporal, spatial


def dual_stream_preprocess_xla(
    frames: jax.Array,
    num_segs: int,
    temporal_size: int = 224,
    spatial_size: int = 336,
    out_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array]:
    from ..video.sampling import spatial_indices

    num_frames = frames.shape[0]
    temporal = preprocess_frames_xla(frames, temporal_size,
                                     INTERNVIDEO_MEAN, INTERNVIDEO_STD, out_dtype)
    idx = jnp.asarray(spatial_indices(num_frames, num_segs))
    spatial = preprocess_frames_xla(frames[idx, ...], spatial_size,
                                    OPENAI_DATASET_MEAN, OPENAI_DATASET_STD,
                                    out_dtype)
    return temporal, spatial
