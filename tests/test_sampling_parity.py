"""Frame-index sampling parity against the reference's get_frame_indices
(mm_utils/video_utils.py:13-51), AST-extracted (the module itself imports
decord/av which are absent)."""

import ast
import textwrap

import numpy as np
import pytest

from grounded_video_llm_tpu.video.sampling import get_frame_indices

REF = "/root/reference/mm_utils/video_utils.py"


def _oracle():
    src = open(REF).read()
    tree = ast.parse(src)
    import math
    import random

    ns = {"np": np, "random": random, "math": math}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == "get_frame_indices":
            code = textwrap.dedent(ast.get_source_segment(src, node))
            exec(compile(code, REF, "exec"), ns)
            return ns["get_frame_indices"]
    raise AssertionError("get_frame_indices not found")


@pytest.mark.parametrize("num_frames,vlen", [(96, 2000), (96, 96), (8, 5),
                                             (10, 100), (96, 97), (1, 1)])
def test_middle_sampling_parity(num_frames, vlen):
    ref = _oracle()
    want = ref(num_frames, vlen, sample="middle")
    got = get_frame_indices(num_frames, vlen, sample="middle")
    assert got == list(want)


@pytest.mark.parametrize("num_frames,vlen,fix", [(10, 100, 0), (10, 100, 3),
                                                 (96, 2000, 5)])
def test_fix_start_parity(num_frames, vlen, fix):
    ref = _oracle()
    want = ref(num_frames, vlen, sample="middle", fix_start=fix)
    got = get_frame_indices(num_frames, vlen, sample="middle", fix_start=fix)
    assert got == list(want)


@pytest.mark.parametrize("mode,fps,cap", [("fps2", 10, -1), ("fps0.5", 30, -1),
                                          ("fps2", 10, 5), ("fps1", 24, 12)])
def test_fps_sampling_parity(mode, fps, cap):
    ref = _oracle()
    want = ref(0, 300, sample=mode, input_fps=fps, max_num_frames=cap)
    got = get_frame_indices(0, 300, sample=mode, input_fps=fps,
                            max_num_frames=cap)
    assert got == [int(x) for x in want]


@pytest.mark.parametrize("num_frames,vlen", [(8, 5), (8, 8), (8, 12),
                                             (96, 96), (96, 100), (96, 150),
                                             (96, 191), (96, 192)])
def test_rand_short_video_fallback_branch_parity(num_frames, vlen):
    """Reference mm_utils/video_utils.py:22-28: choice(range(lo, hi)) raises on
    an empty interval and the except-branch replaces the ENTIRE draw with a
    sorted whole-video permutation sample. Verify both implementations take the
    same branch for short videos (vlen < ~2*num_frames) and that the fallback
    output is a sorted distinct subset padded with the last frame."""
    ref = _oracle()
    import random

    acc = min(num_frames, vlen)
    intervals = np.linspace(0, vlen, acc + 1).astype(int)
    ranges = [(intervals[i], intervals[i + 1] - 1) for i in range(acc)]
    fallback = any(hi <= lo for lo, hi in ranges)

    random.seed(0)
    want = [int(x) for x in ref(num_frames, vlen, sample="rand")]
    got = get_frame_indices(num_frames, vlen, sample="rand",
                            rng=np.random.default_rng(0))
    assert len(got) == num_frames and len(want) == num_frames

    def is_perm_sample(idx):
        body = idx[:acc]
        return (body == sorted(body) and len(set(body)) == acc
                and all(0 <= i < vlen for i in body)
                and idx[acc:] == [body[-1]] * (num_frames - acc))

    if fallback:
        # both must have hit the permutation branch: sorted, distinct, padded
        assert is_perm_sample(want), want
        assert is_perm_sample(got), got
    else:
        for k in range(acc):
            # both draw from choice(range(lo, hi)) ≡ integers(lo, hi): [lo, hi)
            assert ranges[k][0] <= want[k] < ranges[k][1]
            assert ranges[k][0] <= got[k] < ranges[k][1]


def test_rand_sampling_same_interval_structure():
    """'rand' draws differ (different RNG) but must land in the same
    per-interval ranges the reference derives."""
    ref = _oracle()
    import random

    random.seed(0)
    want = ref(10, 100, sample="rand")
    got = get_frame_indices(10, 100, sample="rand",
                            rng=np.random.default_rng(0))
    intervals = np.linspace(0, 100, 11).astype(int)
    for k in range(10):
        assert intervals[k] <= want[k] < intervals[k + 1]
        assert intervals[k] <= got[k] < intervals[k + 1]
