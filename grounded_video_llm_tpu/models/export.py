"""JAX param-tree → reference-format torch export (inverse of convert.py).

Produces the reference's split-by-module, trainable-only checkpoint layout
({"model": {module: state_dict}}, reference training/fsdp.py:116-127) so
weights trained here can be loaded by the original codebase and vice versa.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..core.config import VLMConfig
from ..core.checkpoint import export_reference_pth
from ..train import lora as lora_mod


def _t(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32).T)


def _a(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def export_mm_projector(params: Dict, llm_name: str) -> Dict[str, np.ndarray]:
    a, b = ("linear_0", "linear_1") if llm_name == "phi3.5" else (
        "linear_1", "linear_2")
    return {
        a + ".weight": _t(params["fc1"]["kernel"]),
        a + ".bias": _a(params["fc1"]["bias"]),
        b + ".weight": _t(params["fc2"]["kernel"]),
        b + ".bias": _a(params["fc2"]["bias"]),
    }


def export_video_projector(params: Dict) -> Dict[str, np.ndarray]:
    return {
        "up_proj.weight": _t(params["fc1"]["kernel"]),
        "up_proj.bias": _a(params["fc1"]["bias"]),
        "down_proj.weight": _t(params["fc2"]["kernel"]),
        "down_proj.bias": _a(params["fc2"]["bias"]),
    }


def export_llm_trainable(llm_params: Dict) -> Dict[str, np.ndarray]:
    """Trainable LLM pieces (grounded/sft: lm_head + embed + merged LoRA
    deltas folded into the projection weights)."""
    merged = lora_mod.merge_lora(llm_params)
    out = {
        "lm_head.weight": _t(merged["lm_head"]),
        "model.embed_tokens.weight": _a(merged["embed"]),
    }
    return out


def export_vlm_to_reference(params: Dict, cfg: VLMConfig, path: str,
                            trainable_only: bool = True) -> None:
    modules = {
        "multi_modal_projector": export_mm_projector(params["mm_projector"],
                                                     cfg.llm_name),
        "video_projecter": export_video_projector(params["video_projector"]),
    }
    if not trainable_only or "lora" in params["llm"]["layers"] or (
            params["llm"]["embed"].shape[0] > cfg.llm.vocab_size):
        modules["language_model"] = export_llm_trainable(params["llm"])
    export_reference_pth(path, modules)
