"""Native libav decoder tests (cpp/frame_decoder.cc) — parity with the cv2
fallback path and with reference read_frames_decord semantics."""

import numpy as np
import pytest

from grounded_video_llm_tpu.video import reader
from grounded_video_llm_tpu.video.native import decoder


@pytest.fixture(scope="module")
def native():
    if not decoder.available():
        pytest.skip("native decoder not built (run make -C cpp)")
    return decoder


def test_probe(native, demo_video):
    nframes, fps = native.probe(demo_video)
    assert nframes > 0
    assert fps > 0
    vlen_cv2, fps_cv2 = reader._video_meta_cv2(demo_video)
    assert nframes == vlen_cv2
    assert abs(fps - fps_cv2) < 0.5


def test_decode_matches_cv2(native, demo_video):
    indices = [0, 7, 33, 100, 150]
    nat = native.decode_frames(demo_video, indices)
    cv2_frames = reader._read_frames_cv2(demo_video, indices)
    assert nat.shape == cv2_frames.shape
    diff = np.abs(nat.astype(int) - cv2_frames.astype(int)).mean()
    assert diff < 1.0  # same decoder family → essentially identical


def test_decode_order_preserved(native, demo_video):
    a = native.decode_frames(demo_video, [50, 10])
    b = native.decode_frames(demo_video, [10, 50])
    np.testing.assert_array_equal(a[0], b[1])
    np.testing.assert_array_equal(a[1], b[0])


def test_decode_repeated_indices(native, demo_video):
    out = native.decode_frames(demo_video, [5, 5, 5])
    np.testing.assert_array_equal(out[0], out[1])
    np.testing.assert_array_equal(out[1], out[2])


def test_reader_uses_native(demo_video):
    vf = reader.read_frames(demo_video, 16, sample="middle", backend="native")
    assert vf.frames.shape[0] == 16
    assert vf.frames.dtype == np.uint8
    assert vf.duration > 0
    vf2 = reader.read_frames(demo_video, 16, sample="middle", backend="cv2")
    assert vf.frame_indices == vf2.frame_indices
    diff = np.abs(vf.frames.astype(int) - vf2.frames.astype(int)).mean()
    assert diff < 1.0


def test_reader_fallback_chain(demo_video, tmp_path):
    bad = tmp_path / "missing.mp4"
    vf, used_fallback = reader.read_frames_with_fallback(
        str(bad), 8, "middle", fallback_video=demo_video)
    assert used_fallback
    assert vf.frames.shape[0] == 8
