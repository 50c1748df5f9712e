"""Model assembly for the CLIs: build the VLM param tree from pretrained
weight dumps when present (reference llava_next_video.py:117-162 load order),
falling back to random init for smoke runs without weights."""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core import checkpoint as ckpt
from ..core.config import VLMConfig
from ..models import convert, vlm
from ..text.tokenizer import load_tokenizer


def build_params(
    cfg: VLMConfig,
    weight_root: Optional[str] = None,
    video_encoder_path: Optional[str] = None,
    stage_ckpt: Optional[str] = None,
    dtype=jnp.bfloat16,
    seed: int = 42,
    quantize: Optional[str] = None,
) -> Dict:
    """weight_root layout mirrors the reference's *-seperated dirs:
    vision_model.pth, image_newline(s).pth, multi_modal_projector.pth,
    language_model state dict; video_encoder_path is the InternVideo2 .pt.
    Missing pieces are randomly initialized (smoke mode).

    quantize ("int8" | "int8_full"): build the LLM ALREADY serving-quantized
    — required for big-vocab flagships (llama-3-8B bf16 ≈ 16.1GB exceeds one
    v5e's usable ~14.5GB, so engine-side quantize-after-load cannot run):
    random init goes through serve/quantize.init_llm_params_quantized (per-
    layer scan, no bf16 stack), loaded weights stream through
    upload_llm_quantized (chunked upload+quantize). The engine detects the
    pre-quantized tree and skips its own pass."""
    w8a8 = quantize == "int8_full"
    if quantize:
        import functools

        from ..serve.quantize import init_llm_params_quantized

        params = jax.jit(lambda k: vlm.init_params(
            k, cfg, dtype=dtype,
            llm_init=functools.partial(init_llm_params_quantized,
                                       w8a8=w8a8)))(jax.random.key(seed))
    else:
        params = jax.jit(
            lambda k: vlm.init_params(k, cfg, dtype=dtype))(
            jax.random.key(seed))

    def load_sd(path):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "model" in sd and isinstance(
                sd["model"], dict):
            sd = sd["model"]
        import numpy as np

        return {k: v.to(torch.float32).numpy() for k, v in sd.items()
                if hasattr(v, "numpy")}

    cast = lambda tree: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype), tree)

    if weight_root and os.path.isdir(weight_root):
        vt = os.path.join(weight_root, "vision_model.pth")
        if os.path.exists(vt):
            params["clip"] = cast(convert.convert_clip(load_sd(vt), cfg.clip))
        mm = os.path.join(weight_root, "multi_modal_projector.pth")
        if os.path.exists(mm):
            params["mm_projector"] = cast(
                convert.convert_projector(load_sd(mm), cfg.llm_name))
        for nl_name in ("image_newlines.pth", "image_newline.pth"):
            nl = os.path.join(weight_root, nl_name)
            if os.path.exists(nl):
                params["extras"] = cast(
                    convert.convert_extras(load_sd(nl), cfg.llm_name))
                break
        lm_dir = os.path.join(weight_root, "language_model_seperated")
        if os.path.isdir(lm_dir):
            sd = {}
            for f in sorted(os.listdir(lm_dir)):
                if f.endswith((".bin", ".pth", ".pt")):
                    sd.update(load_sd(os.path.join(lm_dir, f)))
            if sd:
                host_llm = convert.convert_llm(sd, cfg.llm)
                if quantize:
                    from ..serve.quantize import upload_llm_quantized

                    params["llm"] = upload_llm_quantized(host_llm, w8a8=w8a8)
                else:
                    params["llm"] = cast(host_llm)

    if video_encoder_path and os.path.exists(video_encoder_path):
        params["video_encoder"] = cast(convert.convert_internvideo2(
            load_sd(video_encoder_path), cfg.video))

    if stage_ckpt and os.path.exists(stage_ckpt):
        modules = ckpt.import_reference_pth(stage_ckpt)
        if "multi_modal_projector" in modules:
            params["mm_projector"] = cast(convert.convert_projector(
                modules["multi_modal_projector"], cfg.llm_name))
        if "video_projecter" in modules:
            params["video_projector"] = cast(convert.convert_video_projector(
                modules["video_projecter"]))
        if "language_model" in modules:
            lm = modules["language_model"]
            if "model.embed_tokens.weight" in lm:
                emb = jnp.asarray(lm["model.embed_tokens.weight"], dtype)
                if quantize:
                    from ..serve.quantize import quantize_embed_int8

                    emb = jax.jit(quantize_embed_int8)(emb)
                params["llm"]["embed"] = emb
            if "lm_head.weight" in lm:
                head = jnp.asarray(lm["lm_head.weight"].T, dtype)
                if quantize:
                    from ..ops.int8_matmul import quantize_weights_int8

                    q, s = jax.jit(quantize_weights_int8)(head)
                    head = {"q": q, "scale": s}
                params["llm"]["lm_head"] = head
    return params


def build_tokenizer(cfg: VLMConfig, tokenizer_path: Optional[str] = None,
                    expand: bool = True):
    return load_tokenizer(cfg.llm_name, tokenizer_path,
                          cfg.num_temporal_tokens, expand_vocab=expand)
