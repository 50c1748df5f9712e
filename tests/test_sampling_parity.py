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
