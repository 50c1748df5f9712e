"""Torch-checkpoint conversion: layout/transpose/fusion-order invariants and
export round-trips."""

import numpy as np
import pytest

from grounded_video_llm_tpu.core.config import (CLIPVisionConfig,
                                                InternVideo2Config, LLMConfig)
from grounded_video_llm_tpu.models import convert, export


def _rng():
    return np.random.default_rng(0)


CFG_LLAMA = LLMConfig(family="llama", vocab_size=32, hidden_size=8,
                      intermediate_size=16, num_layers=2, num_heads=2,
                      num_kv_heads=1, head_dim=4)
CFG_PHI = LLMConfig(family="phi3", vocab_size=32, hidden_size=8,
                    intermediate_size=16, num_layers=2, num_heads=2,
                    num_kv_heads=2, head_dim=4)


def _llama_sd(cfg):
    r = _rng()
    sd = {"model.embed_tokens.weight": r.normal(size=(cfg.vocab_size,
                                                      cfg.hidden_size)),
          "model.norm.weight": r.normal(size=(cfg.hidden_size,)),
          "lm_head.weight": r.normal(size=(cfg.vocab_size, cfg.hidden_size))}
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = r.normal(size=(cfg.hidden_size,))
        sd[p + "post_attention_layernorm.weight"] = r.normal(
            size=(cfg.hidden_size,))
        sd[p + "self_attn.q_proj.weight"] = r.normal(
            size=(cfg.q_dim, cfg.hidden_size))
        sd[p + "self_attn.k_proj.weight"] = r.normal(
            size=(cfg.kv_dim, cfg.hidden_size))
        sd[p + "self_attn.v_proj.weight"] = r.normal(
            size=(cfg.kv_dim, cfg.hidden_size))
        sd[p + "self_attn.o_proj.weight"] = r.normal(
            size=(cfg.hidden_size, cfg.q_dim))
        sd[p + "mlp.gate_proj.weight"] = r.normal(
            size=(cfg.intermediate_size, cfg.hidden_size))
        sd[p + "mlp.up_proj.weight"] = r.normal(
            size=(cfg.intermediate_size, cfg.hidden_size))
        sd[p + "mlp.down_proj.weight"] = r.normal(
            size=(cfg.hidden_size, cfg.intermediate_size))
    return {k: v.astype(np.float32) for k, v in sd.items()}


def test_llama_qkv_fusion_order_matches_split():
    """The fused qkv kernel must split back into q|k|v exactly the way
    models/llm._qkv splits it."""
    cfg = CFG_LLAMA
    sd = _llama_sd(cfg)
    params = convert.convert_llm(sd, cfg)
    fused = params["layers"]["qkv_kernel"][0]  # [D, q+2kv]
    q = fused[:, :cfg.q_dim]
    k = fused[:, cfg.q_dim:cfg.q_dim + cfg.kv_dim]
    v = fused[:, cfg.q_dim + cfg.kv_dim:]
    np.testing.assert_allclose(q, sd["model.layers.0.self_attn.q_proj.weight"].T)
    np.testing.assert_allclose(k, sd["model.layers.0.self_attn.k_proj.weight"].T)
    np.testing.assert_allclose(v, sd["model.layers.0.self_attn.v_proj.weight"].T)
    gu = params["layers"]["gate_up_kernel"][0]
    np.testing.assert_allclose(gu[:, :cfg.intermediate_size],
                               sd["model.layers.0.mlp.gate_proj.weight"].T)
    np.testing.assert_allclose(gu[:, cfg.intermediate_size:],
                               sd["model.layers.0.mlp.up_proj.weight"].T)
    np.testing.assert_allclose(params["lm_head"], sd["lm_head.weight"].T)


def test_llama_converted_forward_runs():
    import jax.numpy as jnp

    from grounded_video_llm_tpu.models import llm as llm_mod

    cfg = CFG_LLAMA
    params = convert.convert_llm(_llama_sd(cfg), cfg)
    params = {k: (jnp.asarray(v) if not isinstance(v, dict) else
                  {k2: jnp.asarray(v2) for k2, v2 in v.items()})
              for k, v in params.items()}
    embeds = jnp.ones((1, 4, cfg.hidden_size))
    logits = llm_mod.forward_logits(params, cfg, embeds)
    assert logits.shape == (1, 4, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_clip_patch_kernel_layout():
    cfg = CLIPVisionConfig(hidden_size=4, intermediate_size=8, num_layers=1,
                           num_heads=2, image_size=28, patch_size=14)
    r = _rng()
    D, P = 4, 14
    sd = {"vision_model.embeddings.class_embedding": r.normal(size=(D,)),
          "vision_model.embeddings.patch_embedding.weight":
              r.normal(size=(D, 3, P, P)),
          "vision_model.embeddings.position_embedding.weight":
              r.normal(size=(5, D)),
          "vision_model.pre_layrnorm.weight": np.ones(D),
          "vision_model.pre_layrnorm.bias": np.zeros(D),
          "vision_model.post_layernorm.weight": np.ones(D),
          "vision_model.post_layernorm.bias": np.zeros(D)}
    for name in ("layer_norm1", "layer_norm2"):
        sd[f"vision_model.encoder.layers.0.{name}.weight"] = np.ones(D)
        sd[f"vision_model.encoder.layers.0.{name}.bias"] = np.zeros(D)
    for name in ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
                 "self_attn.out_proj"):
        sd[f"vision_model.encoder.layers.0.{name}.weight"] = r.normal(size=(D, D))
        sd[f"vision_model.encoder.layers.0.{name}.bias"] = np.zeros(D)
    sd["vision_model.encoder.layers.0.mlp.fc1.weight"] = r.normal(size=(8, D))
    sd["vision_model.encoder.layers.0.mlp.fc1.bias"] = np.zeros(8)
    sd["vision_model.encoder.layers.0.mlp.fc2.weight"] = r.normal(size=(D, 8))
    sd["vision_model.encoder.layers.0.mlp.fc2.bias"] = np.zeros(D)
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    params = convert.convert_clip(sd, cfg)
    # OIHW → HWIO: kernel[h, w, c, o] == torch[o, c, h, w]
    tk = sd["vision_model.embeddings.patch_embedding.weight"]
    np.testing.assert_allclose(params["embeddings"]["patch_kernel"][3, 5, 1, 2],
                               tk[2, 1, 3, 5])


def test_internvideo2_pos_embed_interpolation():
    cfg = InternVideo2Config(embed_dim=8, depth=1, num_heads=2, mlp_ratio=2.0,
                             num_frames=8, num_blocks_used=1)
    r = _rng()
    L4 = 1 + 4 * 256
    sd = {"patch_embed.proj.weight": r.normal(size=(8, 3, 1, 14, 14)),
          "patch_embed.proj.bias": np.zeros(8),
          "cls_token": r.normal(size=(1, 1, 8)),
          "pos_embed": r.normal(size=(1, L4, 8)),
          "blocks.0.norm1.weight": np.ones(8),
          "blocks.0.attn.qkv.weight": r.normal(size=(24, 8)),
          "blocks.0.attn.q_norm.weight": np.ones(8),
          "blocks.0.attn.k_norm.weight": np.ones(8),
          "blocks.0.attn.proj.weight": r.normal(size=(8, 8)),
          "blocks.0.attn.proj.bias": np.zeros(8),
          "blocks.0.ls1.gamma": np.full(8, 1e-5),
          "blocks.0.norm2.weight": np.ones(8),
          "blocks.0.mlp.fc1.weight": r.normal(size=(16, 8)),
          "blocks.0.mlp.fc1.bias": np.zeros(16),
          "blocks.0.mlp.fc2.weight": r.normal(size=(8, 16)),
          "blocks.0.mlp.fc2.bias": np.zeros(8),
          "blocks.0.ls2.gamma": np.full(8, 1e-5)}
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    params = convert.convert_internvideo2(sd, cfg, ckpt_num_frames=4)
    assert params["pos_embed"].shape == (1 + 8 * 256, 8)
    # frame-0 rows of the new embed lie between ckpt frames (clamped at edges)
    ckpt = sd["pos_embed"][0, 1:].reshape(4, 256, 8)
    new = params["pos_embed"][1:].reshape(8, 256, 8)
    # interpolation preserves per-spatial-position value range
    assert np.all(new.min() >= ckpt.min() - 1e-5)
    assert np.all(new.max() <= ckpt.max() + 1e-5)


def test_export_import_roundtrip(tmp_path):
    pytest.importorskip("torch")
    import jax

    from grounded_video_llm_tpu.core.checkpoint import import_reference_pth
    from grounded_video_llm_tpu.core.config import micro_vlm_config
    from grounded_video_llm_tpu.models import vlm

    cfg = micro_vlm_config()
    params = vlm.init_params(jax.random.key(0), cfg)
    path = str(tmp_path / "ckpt.pth")
    export.export_vlm_to_reference(params, cfg, path, trainable_only=True)
    modules = import_reference_pth(path)
    assert "multi_modal_projector" in modules
    assert "video_projecter" in modules
    got = convert.convert_video_projector(modules["video_projecter"])
    np.testing.assert_allclose(np.asarray(got["fc1"]["kernel"]),
                               np.asarray(params["video_projector"]["fc1"]["kernel"]),
                               rtol=1e-6)
    got_mm = convert.convert_projector(modules["multi_modal_projector"],
                                       cfg.llm_name)
    np.testing.assert_allclose(np.asarray(got_mm["fc2"]["bias"]),
                               np.asarray(params["mm_projector"]["fc2"]["bias"]),
                               rtol=1e-6)
