"""PIL-exact resize parity: ops/pil_resize.py (numpy + native C++) vs Pillow
itself, and the preprocess pipeline vs a hand-assembled reference transform
(mm_utils/utils.py:153-183 semantics with torchvision 0.16.2 geometry)."""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from grounded_video_llm_tpu.ops import pil_resize as pr  # noqa: E402


def _rand(h, w, t=1, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(t, h, w, 3), dtype=np.uint8)


CASES = [
    (360, 640, 224, 398),   # downscale both (temporal stream geometry)
    (240, 400, 336, 560),   # upscale both (spatial stream from small video)
    (57, 91, 120, 191),     # strong upscale
    (480, 480, 224, 224),   # square downscale
    (224, 300, 224, 299),   # width-only
    (250, 224, 223, 200),   # height-dominant downscale
]


@pytest.mark.parametrize("h,w,oh,ow", CASES)
def test_numpy_resize_bit_exact_with_pillow(h, w, oh, ow):
    img = _rand(h, w, seed=h + w)[0]
    want = np.asarray(Image.fromarray(img).resize((ow, oh), Image.BICUBIC))
    got = pr._resize_np(img, oh, ow)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("h,w,oh,ow", CASES)
def test_native_resize_bit_exact_with_pillow(h, w, oh, ow):
    if pr._native_lib() is None:
        pytest.skip("cpp/ not built")
    frames = _rand(h, w, t=3, seed=h * w)
    got = pr.resize_bicubic_batch_u8(frames, oh, ow)
    want = np.stack([
        np.asarray(Image.fromarray(f).resize((ow, oh), Image.BICUBIC))
        for f in frames])
    np.testing.assert_array_equal(got, want)


def test_identity_passthrough():
    frames = _rand(64, 64, t=2)
    out = pr.resize_bicubic_batch_u8(frames, 64, 64)
    np.testing.assert_array_equal(out, frames)


def test_shorter_edge_truncates_like_torchvision_0_16():
    # 639*224/360 = 397.6 → torchvision 0.16.2 int() truncation gives 397
    assert pr.resized_shape_torchvision(360, 639, 224) == (224, 397)
    assert pr.resized_shape_torchvision(639, 360, 224) == (397, 224)
    assert pr.resized_shape_torchvision(360, 640, 224) == (224, 398)
    # upscale: shorter edge still pinned to size
    assert pr.resized_shape_torchvision(100, 150, 224) == (224, 336)


def test_preprocess_host_matches_reference_transform_exactly():
    """preprocess_frames_host == ToPILImage → Resize(BICUBIC) →
    CenterCrop → ToTensor → Normalize, assembled from PIL + numpy with
    torchvision 0.16.2 geometry (Resize long-edge truncation; CenterCrop
    round-half crop origin; ToTensor /255)."""
    from grounded_video_llm_tpu.ops.preprocess import (INTERNVIDEO_MEAN,
                                                       INTERNVIDEO_STD,
                                                       preprocess_frames_host)

    size = 224
    frames = _rand(240, 427, t=3, seed=9)
    mean = np.asarray(INTERNVIDEO_MEAN, np.float32)
    std = np.asarray(INTERNVIDEO_STD, np.float32)
    want = []
    for f in frames:
        img = Image.fromarray(f)
        w, h = img.size
        short, long = (w, h) if w <= h else (h, w)
        new_long = int(size * long / short)
        nw, nh = (size, new_long) if w <= h else (new_long, size)
        img = img.resize((nw, nh), Image.BICUBIC)
        left = int(round((nw - size) / 2.0))
        top = int(round((nh - size) / 2.0))
        img = img.crop((left, top, left + size, top + size))
        x = np.asarray(img).astype(np.float32) / 255.0
        want.append((x - mean) / std)
    want = np.stack(want)
    got = preprocess_frames_host(frames, size, INTERNVIDEO_MEAN,
                                 INTERNVIDEO_STD)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_hybrid_u8_path_still_matches_float_path():
    from grounded_video_llm_tpu.ops.preprocess import (OPENAI_DATASET_MEAN,
                                                       OPENAI_DATASET_STD,
                                                       preprocess_frames_host,
                                                       resize_frames_host_u8)

    frames = _rand(200, 320, t=2, seed=4)
    want = preprocess_frames_host(frames, 112, OPENAI_DATASET_MEAN,
                                  OPENAI_DATASET_STD)
    u8 = resize_frames_host_u8(frames, 112)
    got = (u8.astype(np.float32) / 255.0
           - np.asarray(OPENAI_DATASET_MEAN, np.float32)) \
        / np.asarray(OPENAI_DATASET_STD, np.float32)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
