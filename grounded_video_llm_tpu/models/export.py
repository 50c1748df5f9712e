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


# ---------------------------------------------------------------------------
# Full-module exports (weights-day dress rehearsal, scripts/eval_dress_rehearsal.py)
#
# Exact inverses of convert.convert_{clip,internvideo2,llm} and convert_extras:
# emit the HF/reference state-dict names each weight dump ships with
# (reference llava_next_video.py:117-151 load order), so a synthetic
# checkpoint written from OUR tree exercises cli/model_loading.build_params'
# real load → convert → quantize-on-upload chain and can be asserted to
# roundtrip bit-for-bit.
# ---------------------------------------------------------------------------


def export_clip_full(clip: Dict, cfg) -> Dict[str, np.ndarray]:
    """Inverse of convert.convert_clip (HF CLIPVisionModel state dict,
    'pre_layrnorm' typo included)."""
    p = "vision_model."
    L = cfg.num_layers
    emb = clip["embeddings"]
    sd = {
        p + "embeddings.class_embedding": _a(emb["class_embedding"]),
        # HWIO → OIHW
        p + "embeddings.patch_embedding.weight":
            np.ascontiguousarray(_a(emb["patch_kernel"]).transpose(3, 2, 0, 1)),
        p + "embeddings.position_embedding.weight":
            _a(emb["position_embedding"]),
        p + "pre_layrnorm.weight": _a(clip["pre_ln"]["scale"]),
        p + "pre_layrnorm.bias": _a(clip["pre_ln"]["bias"]),
        p + "post_layernorm.weight": _a(clip["post_ln"]["scale"]),
        p + "post_layernorm.bias": _a(clip["post_ln"]["bias"]),
    }
    lyr = clip["layers"]
    names = {"self_attn.q_proj": "q", "self_attn.k_proj": "k",
             "self_attn.v_proj": "v", "self_attn.out_proj": "o",
             "mlp.fc1": "fc1", "mlp.fc2": "fc2"}
    lns = {"layer_norm1": "ln1", "layer_norm2": "ln2"}
    for i in range(L):
        q = p + f"encoder.layers.{i}."
        for hf, ours in names.items():
            sd[q + hf + ".weight"] = _t(lyr[ours]["kernel"][i])
            sd[q + hf + ".bias"] = _a(lyr[ours]["bias"][i])
        for hf, ours in lns.items():
            sd[q + hf + ".weight"] = _a(lyr[ours]["scale"][i])
            sd[q + hf + ".bias"] = _a(lyr[ours]["bias"][i])
    return sd


def export_internvideo2_full(enc: Dict, cfg) -> Dict[str, np.ndarray]:
    """Inverse of convert.convert_internvideo2. pos_embed is emitted at the
    tree's OWN temporal length: pass ckpt_num_frames=cfg.num_frames when
    re-importing for an exact roundtrip (the real f4 release instead ships
    4-frame tables that convert interpolates — internvideo2.py:260-320)."""
    sd = {
        # HWIO → Conv3d OIDHW with D=tubelet=1
        "patch_embed.proj.weight":
            np.ascontiguousarray(
                _a(enc["patch_kernel"]).transpose(3, 2, 0, 1)[:, :, None]),
        "patch_embed.proj.bias": _a(enc["patch_bias"]),
        "cls_token": _a(enc["cls_token"]).reshape(1, 1, -1),
        "pos_embed": _a(enc["pos_embed"])[None],
        "clip_pos_embed": _a(enc["pos_embed"])[None],
    }
    b = enc["blocks"]
    L = np.asarray(b["norm1_w"]).shape[0]
    for i in range(L):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"] = _a(b["norm1_w"][i])
        sd[p + "attn.qkv.weight"] = _t(b["qkv_kernel"][i])
        sd[p + "attn.q_norm.weight"] = _a(b["q_norm_w"][i])
        sd[p + "attn.k_norm.weight"] = _a(b["k_norm_w"][i])
        sd[p + "attn.proj.weight"] = _t(b["proj"]["kernel"][i])
        sd[p + "attn.proj.bias"] = _a(b["proj"]["bias"][i])
        sd[p + "ls1.gamma"] = _a(b["ls1"][i])
        sd[p + "norm2.weight"] = _a(b["norm2_w"][i])
        sd[p + "mlp.fc1.weight"] = _t(b["fc1"]["kernel"][i])
        sd[p + "mlp.fc1.bias"] = _a(b["fc1"]["bias"][i])
        sd[p + "mlp.fc2.weight"] = _t(b["fc2"]["kernel"][i])
        sd[p + "mlp.fc2.bias"] = _a(b["fc2"]["bias"][i])
        sd[p + "ls2.gamma"] = _a(b["ls2"][i])
    return sd


def export_llm_full(llm: Dict, cfg) -> Dict[str, np.ndarray]:
    """Inverse of convert.convert_llm: phi3 keeps the fused qkv/gate_up dumps
    HF ships; llama re-splits our fused kernels into q/k/v + gate/up."""
    merged = lora_mod.merge_lora(llm)
    lyr = merged["layers"]
    L = np.asarray(lyr["input_norm_w"]).shape[0]
    sd = {
        "model.embed_tokens.weight": _a(merged["embed"]),
        "model.norm.weight": _a(merged["final_norm_w"]),
        "lm_head.weight": _t(merged["lm_head"]),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = _a(lyr["input_norm_w"][i])
        sd[p + "post_attention_layernorm.weight"] = _a(lyr["post_norm_w"][i])
        sd[p + "self_attn.o_proj.weight"] = _t(lyr["o_kernel"][i])
        sd[p + "mlp.down_proj.weight"] = _t(lyr["down_kernel"][i])
        qkv = _a(lyr["qkv_kernel"][i])
        gu = _a(lyr["gate_up_kernel"][i])
        if cfg.family == "phi3":
            sd[p + "self_attn.qkv_proj.weight"] = _t(qkv)
            sd[p + "mlp.gate_up_proj.weight"] = _t(gu)
        else:
            q_dim = cfg.num_heads * cfg.head_dim
            kv_dim = cfg.num_kv_heads * cfg.head_dim
            sd[p + "self_attn.q_proj.weight"] = _t(qkv[:, :q_dim])
            sd[p + "self_attn.k_proj.weight"] = _t(qkv[:, q_dim:q_dim + kv_dim])
            sd[p + "self_attn.v_proj.weight"] = _t(qkv[:, q_dim + kv_dim:])
            half = gu.shape[1] // 2
            sd[p + "mlp.gate_proj.weight"] = _t(gu[:, :half])
            sd[p + "mlp.up_proj.weight"] = _t(gu[:, half:])
    return sd


def export_extras_full(extras: Dict, llm_name: str) -> Dict[str, np.ndarray]:
    """Inverse of convert.convert_extras (reference shapes: glb_GN [1,1,4C],
    sub_GN [1,1,1,4C], image_newline [H])."""
    if llm_name == "phi3.5":
        return {"glb_GN": _a(extras["glb_GN"]).reshape(1, 1, -1),
                "sub_GN": _a(extras["sub_GN"]).reshape(1, 1, 1, -1)}
    return {"image_newline": _a(extras["image_newline"])}


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
