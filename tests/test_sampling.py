"""Frame-index sampling parity (reference mm_utils/video_utils.py:13-51)."""

import numpy as np

from grounded_video_llm_tpu.video.sampling import (get_frame_indices,
                                                   spatial_indices)


def test_middle_sampling_golden():
    # vlen=100, 10 frames: intervals [0,10,...,100], midpoints (lo+hi)//2
    idx = get_frame_indices(10, 100, sample="middle")
    assert idx == [4, 14, 24, 34, 44, 54, 64, 74, 84, 94]


def test_middle_sampling_96_of_2000():
    idx = get_frame_indices(96, 2000, sample="middle")
    assert len(idx) == 96
    assert idx[0] == (0 + int(np.linspace(0, 2000, 97).astype(int)[1]) - 1) // 2
    assert all(0 <= i < 2000 for i in idx)
    assert idx == sorted(idx)


def test_short_video_pads_with_last():
    idx = get_frame_indices(8, 5, sample="middle")
    assert len(idx) == 8
    assert idx == [0, 1, 2, 3, 4, 4, 4, 4]


def test_rand_sampling_within_intervals():
    rng = np.random.default_rng(0)
    idx = get_frame_indices(10, 100, sample="rand", rng=rng)
    intervals = np.linspace(0, 100, 11).astype(int)
    assert len(idx) == 10
    for k, i in enumerate(idx):
        assert intervals[k] <= i < intervals[k + 1]


def test_fix_start():
    idx = get_frame_indices(10, 100, sample="middle", fix_start=2)
    # fix_start branch requires sample in rand/middle and fix_start not None;
    # reference checks rand first, then fix_start, then middle
    assert idx == [2, 12, 22, 32, 42, 52, 62, 72, 82, 92]


def test_fps_sampling():
    # 100 frames at 10fps = 10s; fps2 → frames every 0.5s starting 0.25s
    idx = get_frame_indices(0, 100, sample="fps2", input_fps=10)
    assert idx[0] == round(0.25 * 10)
    assert all(i < 100 for i in idx)
    idx_capped = get_frame_indices(0, 100, sample="fps2", input_fps=10,
                                   max_num_frames=5)
    assert len(idx_capped) == 5
    assert idx_capped == idx[:5]


def test_spatial_indices():
    # 96 frames, 12 segs → i*8+4 (reference inference.py:83)
    assert spatial_indices(96, 12) == [4, 12, 20, 28, 36, 44, 52, 60, 68, 76, 84, 92]
