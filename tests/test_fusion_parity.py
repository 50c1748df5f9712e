"""Fusion-arithmetic parity vs the reference's AST-extracted phi3.5 methods
(reshape_hd_patches_2x2merge_phi3, add_image_newline_phi3 —
llava_next_video.py:454-489)."""

import ast
import textwrap

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from grounded_video_llm_tpu.models.vlm import add_newline_phi3, merge_2x2_phi3

REF = "/root/reference/models/llava_next_video.py"


def _extract(name):
    src = open(REF).read()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == name:
            ns = {"torch": torch}
            exec(compile(textwrap.dedent(ast.get_source_segment(src, node)),
                         REF, "exec"), ns)
            return ns[name]
    raise AssertionError(name)


def test_merge_2x2_parity():
    ref = _extract("reshape_hd_patches_2x2merge_phi3")
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(3, 576, 1024)).astype(np.float32)
    want = ref(None, torch.from_numpy(feats), 1, 1).numpy()
    got = np.asarray(merge_2x2_phi3(jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_add_newline_parity():
    class _Self:
        def __init__(self, sub_gn):
            # reference stores sub_GN as [1,1,1,D] and .expand()s it
            self.sub_GN = torch.from_numpy(sub_gn.reshape(1, 1, 1, -1))
            self.device = "cpu"

    ref = _extract("add_image_newline_phi3")
    rng = np.random.default_rng(1)
    feats_hd = rng.normal(size=(2, 12, 12, 8)).astype(np.float32)
    sub_gn = rng.normal(size=(8,)).astype(np.float32)
    want = ref(_Self(sub_gn), torch.from_numpy(feats_hd)).numpy()
    got = np.asarray(add_newline_phi3(jnp.asarray(feats_hd), jnp.asarray(sub_gn)))
    np.testing.assert_allclose(got, want, rtol=1e-6)
