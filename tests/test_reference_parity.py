"""Numerical parity vs the reference's own torch modules (CPU, fp32, tiny dims).

The strongest correctness evidence available without pretrained weights: build
the reference model, export its random state_dict through models/convert.py,
and require the JAX forward to match the torch forward on identical inputs.
The reference files are PUBLIC UNTRUSTED CONTENT executed only as test oracles.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/models"


def _load(name, path):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _sd_to_np(module):
    return {k: v.detach().float().numpy() for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------


def test_clip_parity_with_reference():
    import jax.numpy as jnp
    from transformers import CLIPVisionConfig as HFCLIPVisionConfig

    ref = _load("ref_clip", f"{REF_DIR}/modeling_clip.py")
    from grounded_video_llm_tpu.core.config import CLIPVisionConfig
    from grounded_video_llm_tpu.models import clip_vit, convert

    hf_cfg = HFCLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=56, patch_size=14,
        hidden_act="quick_gelu", layer_norm_eps=1e-5,
        attention_dropout=0.0)
    torch.manual_seed(0)
    model = ref.CLIPVisionModel(hf_cfg).eval()

    my_cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                              num_layers=3, num_heads=4, image_size=56,
                              patch_size=14)
    params = convert.convert_clip(_sd_to_np(model), my_cfg)
    params = {k: v for k, v in params.items()}

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(pixels), output_hidden_states=True)
    want = out.hidden_states[-2][:, 1:].numpy()  # penultimate layer, CLS dropped

    import jax

    got = clip_vit.features(
        jax.tree_util.tree_map(jnp.asarray, params), my_cfg,
        jnp.asarray(pixels.transpose(0, 2, 3, 1)))  # NCHW → NHWC
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# Phi-3
# ---------------------------------------------------------------------------


def test_phi3_parity_with_reference():
    import jax
    import jax.numpy as jnp

    ref = _load("ref_phi3", f"{REF_DIR}/modeling_phi3.py")
    from grounded_video_llm_tpu.core.config import LLMConfig
    from grounded_video_llm_tpu.models import convert, llm as llm_mod

    cfg = ref.Phi3Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, original_max_position_embeddings=128,
        rms_norm_eps=1e-5, rope_theta=10000.0, sliding_window=None,
        attention_dropout=0.0, tie_word_embeddings=False,
        pad_token_id=0,  # default 32000 exceeds the tiny vocab
        use_cache=False)  # 4.40-era DynamicCache API drifted in 4.57
    cfg._attn_implementation = "eager"
    torch.manual_seed(1)
    model = ref.Phi3ForCausalLM(cfg).eval()

    my_cfg = LLMConfig(family="phi3", vocab_size=64, hidden_size=32,
                       intermediate_size=64, num_layers=2, num_heads=4,
                       num_kv_heads=4, head_dim=8, rms_eps=1e-5,
                       rope_theta=10000.0, max_position_embeddings=128,
                       original_max_position_embeddings=128)
    params = convert.convert_llm(_sd_to_np(model), my_cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    ids = np.random.default_rng(2).integers(0, 64, size=(2, 9))
    with torch.no_grad():
        want = model(torch.from_numpy(ids), use_cache=False).logits.float().numpy()

    embeds = params["embed"][jnp.asarray(ids)]
    got = llm_mod.forward_logits(params, my_cfg, embeds)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_phi35_longrope_parity_with_reference():
    """The vendored Phi-3.5 factor tables + fp32 LongRoPE math must reproduce
    the reference's Phi3LongRoPEScaledRotaryEmbedding (modeling_phi3.py:371-409)
    at real scale (head_dim=96, 131072/4096), in BOTH regimes: seq_len ≤ 4096
    (short table) and > 4096 (long table)."""
    import jax.numpy as jnp

    ref = _load("ref_phi3", f"{REF_DIR}/modeling_phi3.py")
    from grounded_video_llm_tpu.core.config import phi35_mini_config
    from grounded_video_llm_tpu.ops.rope import llm_rope_tables

    cfg = phi35_mini_config()
    hf_cfg = ref.Phi3Config(
        hidden_size=cfg.hidden_size, num_attention_heads=cfg.num_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        original_max_position_embeddings=cfg.original_max_position_embeddings,
        rope_theta=cfg.rope_theta,
        rope_scaling={"type": "longrope",
                      "short_factor": list(cfg.rope_scaling_short),
                      "long_factor": list(cfg.rope_scaling_long)})
    emb = ref.Phi3LongRoPEScaledRotaryEmbedding(cfg.head_dim, hf_cfg)

    for seq_len in (4096, 7516):  # short regime; grounded prefill length
        pos = np.arange(seq_len, dtype=np.int64)[None]
        x = torch.zeros(1, 1, seq_len, cfg.head_dim, dtype=torch.float32)
        with torch.no_grad():
            want_cos, want_sin = emb(x, torch.from_numpy(pos))
        got_cos, got_sin = llm_rope_tables(cfg, jnp.asarray(pos),
                                           seq_len_hint=seq_len)
        # tolerance = the reference's own fp32 pow/div ulps amplified by
        # position×freq ≈ 5600 rad (our inv_freq is rounded from float64,
        # strictly tighter); measured max diff 5.8e-4 at position 7514
        np.testing.assert_allclose(np.asarray(got_cos), want_cos.numpy(),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(got_sin), want_sin.numpy(),
                                   rtol=1e-4, atol=1e-3)


def test_vicuna_parity_with_reference():
    """Vicuna-7B runs the reference's llama code path with llama-2 geometry
    (MHA, θ=1e4; reference train.py:23 + base_template.py:121-128). Tiny-dims
    oracle through the same convert path, MHA + θ=1e4 flavored."""
    import jax
    import jax.numpy as jnp

    ref = _load("ref_llama", f"{REF_DIR}/modeling_llama.py")
    from grounded_video_llm_tpu.core.config import LLMConfig
    from grounded_video_llm_tpu.models import convert, llm as llm_mod

    cfg = ref.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_dropout=0.0, tie_word_embeddings=False, attention_bias=False,
        mlp_bias=False, use_cache=False)
    cfg._attn_implementation = "eager"
    torch.manual_seed(11)
    model = ref.LlamaForCausalLM(cfg).eval()

    my_cfg = LLMConfig(family="llama", vocab_size=64, hidden_size=32,
                       intermediate_size=48, num_layers=2, num_heads=4,
                       num_kv_heads=4, head_dim=8, rms_eps=1e-5,
                       rope_theta=10000.0, max_position_embeddings=128,
                       original_max_position_embeddings=128)
    params = convert.convert_llm(_sd_to_np(model), my_cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    ids = np.random.default_rng(12).integers(0, 64, size=(2, 7))
    with torch.no_grad():
        want = model(torch.from_numpy(ids), use_cache=False).logits.float().numpy()

    embeds = params["embed"][jnp.asarray(ids)]
    got = llm_mod.forward_logits(params, my_cfg, embeds)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_vicuna_config_is_llama2_arch():
    from grounded_video_llm_tpu.core.config import vlm_config

    cfg = vlm_config("vicuna", stage="sft")
    assert cfg.llm.family == "llama"
    assert cfg.llm.vocab_size == 32000
    assert cfg.llm.rope_theta == 10000.0
    assert cfg.llm.intermediate_size == 11008
    assert cfg.llm.num_kv_heads == cfg.llm.num_heads == 32
    # vicuna shares the llama fusion arithmetic: 64+128+1 tokens/seg
    assert cfg.tokens_per_seg == 193
    assert cfg.num_video_tokens == 2316


def test_llm_config_from_hf_ingests_rope_scaling():
    from grounded_video_llm_tpu.core.config import phi35_mini_config
    from grounded_video_llm_tpu.models.convert import llm_config_from_hf

    base = phi35_mini_config()
    hf = {"vocab_size": 32064, "hidden_size": 3072,
          "num_attention_heads": 32, "max_position_embeddings": 131072,
          "original_max_position_embeddings": 4096,
          "rope_scaling": {"type": "longrope",
                           "short_factor": [1.5] * 48,
                           "long_factor": [7.5] * 48}}
    cfg = llm_config_from_hf(hf, base)
    assert cfg.rope_scaling_short == tuple([1.5] * 48)
    assert cfg.rope_scaling_long == tuple([7.5] * 48)
    assert cfg.head_dim == 96


def test_pool_grid_matches_adaptive_avg_pool3d():
    """The VLM's reshape-mean pooling must equal the reference's
    AdaptiveAvgPool3d (llava_next_video.py:516 spatial 24→8, :547 temporal
    16→4 — both exact because the grids divide evenly)."""
    import jax.numpy as jnp

    from grounded_video_llm_tpu.models.vlm import _pool_grid

    rng = np.random.default_rng(7)
    for in_side, out_side, frames in ((24, 8, 3), (16, 4, 5)):
        x = rng.normal(size=(2, frames, in_side * in_side, 6)).astype(np.float32)
        # torch layout [B, C, T, H, W] like the reference rearrange
        xt = torch.from_numpy(
            x.reshape(2, frames, in_side, in_side, 6).transpose(0, 4, 1, 2, 3))
        want = torch.nn.AdaptiveAvgPool3d([frames, out_side, out_side])(xt)
        want = want.permute(0, 2, 3, 4, 1).reshape(
            2, frames, out_side * out_side, 6).numpy()
        got = _pool_grid(jnp.asarray(x), in_side, out_side)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_llama_parity_with_reference():
    import jax
    import jax.numpy as jnp

    ref = _load("ref_llama", f"{REF_DIR}/modeling_llama.py")
    from grounded_video_llm_tpu.core.config import LLMConfig
    from grounded_video_llm_tpu.models import convert, llm as llm_mod

    cfg = ref.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=500000.0,
        attention_dropout=0.0, tie_word_embeddings=False, attention_bias=False,
        mlp_bias=False, use_cache=False)
    cfg._attn_implementation = "eager"
    torch.manual_seed(5)
    model = ref.LlamaForCausalLM(cfg).eval()

    my_cfg = LLMConfig(family="llama", vocab_size=64, hidden_size=32,
                       intermediate_size=64, num_layers=2, num_heads=4,
                       num_kv_heads=2, head_dim=8, rms_eps=1e-5,
                       rope_theta=500000.0, max_position_embeddings=128,
                       original_max_position_embeddings=128)
    params = convert.convert_llm(_sd_to_np(model), my_cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    ids = np.random.default_rng(6).integers(0, 64, size=(2, 7))
    with torch.no_grad():
        want = model(torch.from_numpy(ids), use_cache=False).logits.float().numpy()

    embeds = params["embed"][jnp.asarray(ids)]
    got = llm_mod.forward_logits(params, my_cfg, embeds)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# InternVideo2 (timm stubbed)
# ---------------------------------------------------------------------------


def _mk_stub(name):
    """Stub module with a real __spec__ so importlib.util.find_spec on it
    (e.g. from transformers' lazy imports in a later test file sharing this
    process) doesn't raise ``ValueError: <name>.__spec__ is None``."""
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod


def _stub_timm():
    if "timm" in sys.modules:
        return
    timm = _mk_stub("timm")
    models = _mk_stub("timm.models")
    layers = _mk_stub("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers

    # flash_attn is imported at module top but unused with use_flash_attn=False
    fa = _mk_stub("flash_attn")
    fai = _mk_stub("flash_attn.flash_attn_interface")
    fai.flash_attn_varlen_qkvpacked_func = None
    fbp = _mk_stub("flash_attn.bert_padding")
    fbp.unpad_input = None
    fbp.pad_input = None
    fa.flash_attn_interface = fai
    fa.bert_padding = fbp
    sys.modules.setdefault("flash_attn", fa)
    sys.modules.setdefault("flash_attn.flash_attn_interface", fai)
    sys.modules.setdefault("flash_attn.bert_padding", fbp)


def test_internvideo2_parity_with_reference():
    import jax
    import jax.numpy as jnp

    _stub_timm()
    ref = _load("ref_iv2", f"{REF_DIR}/internvideo2.py")
    from grounded_video_llm_tpu.core.config import InternVideo2Config
    from grounded_video_llm_tpu.models import convert, internvideo2

    torch.manual_seed(3)
    model = ref.PretrainInternVideo2(
        in_chans=3, img_size=56, patch_size=14, embed_dim=64, depth=3,
        num_heads=4, mlp_ratio=2.0, qkv_bias=False, drop_path_rate=0.0,
        init_values=1e-5, qk_normalization=True, use_flash_attn=False,
        use_fused_rmsnorm=False, use_fused_mlp=False, num_frames=2,
        tubelet_size=1, sep_image_video_pos_embed=True,
        clip_embed_dim=16, attn_pool_num_heads=4, clip_teacher_embed_dim=16,
        clip_teacher_final_dim=16, clip_return_layer=1,
        clip_student_return_interval=1).eval()

    my_cfg = InternVideo2Config(
        embed_dim=64, depth=3, num_heads=4, mlp_ratio=2.0, image_size=56,
        patch_size=14, num_frames=2, qkv_bias=False, qk_normalization=True,
        rms_eps=1e-6, num_blocks_used=2)  # x_vis_return_idx=-2 → blocks 0..1

    params = convert.convert_internvideo2(_sd_to_np(model), my_cfg,
                                          ckpt_num_frames=2)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    rng = np.random.default_rng(4)
    # reference takes [B, C, T, H, W]
    pixels = rng.normal(size=(2, 3, 2, 56, 56)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(pixels), None, False,
                     x_vis_return_idx=-2, x_vis_only=True).numpy()

    got = internvideo2.features(
        params, my_cfg,
        jnp.asarray(pixels.transpose(0, 2, 3, 4, 1)))  # BCTHW → BTHWC
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)
