"""Weights-day dress rehearsal pieces (scripts/eval_dress_rehearsal.py).

The committed artifact EVAL_DRYRUN_r05.json is the full-chain run (subprocess
eval.py, real weights gate, int8 upload); these tests pin the pieces that
must keep working for the artifact to be reproducible: the full-module
reference-format exporters roundtrip bit-for-bit through the REAL load path
(cli/model_loading.build_params → models/convert.py), and the synthetic
Charades items parse through eval.py's annotation loader.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

pytest.importorskip("torch")

_SPEC = importlib.util.spec_from_file_location(
    "eval_dress_rehearsal",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "eval_dress_rehearsal.py"))
dress = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(dress)


def test_export_roundtrip_through_real_load_path(tmp_path):
    """init → export_*_full dumps → build_params reload == bf16(source),
    every leaf, zero tolerance (the roundtrip the artifact certifies)."""
    out = dress.write_weight_dumps(str(tmp_path))
    assert out["roundtrip_ok"], out["roundtrip_mismatches"]
    # every weight source the reference load path uses exists on disk
    for key in ("vision_model", "multi_modal_projector", "image_newlines",
                "language_model", "video_encoder", "stage_ckpt"):
        assert os.path.exists(out["paths"][key]), key
    assert out["n_tensors"] > 40


def test_llm_full_export_splits_llama_fused_kernels():
    """llama exports re-split our fused qkv/gate_up into HF q/k/v+gate/up;
    convert must fuse them back to the identical kernel."""
    import jax

    from grounded_video_llm_tpu.core.config import micro_vlm_config
    from grounded_video_llm_tpu.models import convert, export as ex
    from grounded_video_llm_tpu.models import llm as llm_mod

    cfg = micro_vlm_config("llama3").llm
    params = llm_mod.init_params(jax.random.key(1), cfg)
    sd = ex.export_llm_full(params, cfg)
    assert "model.layers.0.self_attn.q_proj.weight" in sd
    assert "model.layers.0.self_attn.qkv_proj.weight" not in sd
    back = convert.convert_llm(sd, cfg)
    np.testing.assert_allclose(
        np.asarray(back["layers"]["qkv_kernel"], np.float32),
        np.asarray(params["layers"]["qkv_kernel"], np.float32),
        rtol=0, atol=0)
    np.testing.assert_allclose(
        np.asarray(back["layers"]["gate_up_kernel"], np.float32),
        np.asarray(params["layers"]["gate_up_kernel"], np.float32),
        rtol=0, atol=0)


def test_charades_items_parse_through_eval_loader(tmp_path):
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    data = dress.write_charades_items(str(tmp_path), 3)
    sys.path.insert(0, dress.REPO)
    try:
        from eval import load_annotations
    finally:
        sys.path.pop(0)
    items = load_annotations(data["anno_path"], "charades_sta")
    assert len(items) == 3
    for it in items:
        assert set(it) == {"video", "query", "start", "end"}
        assert it["end"] > it["start"]
        assert os.path.exists(os.path.join(data["video_root"], it["video"]))
