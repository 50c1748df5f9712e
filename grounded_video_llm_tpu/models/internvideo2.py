"""InternVideo2-1B temporal encoder — pure-function JAX.

Architecture parity with reference models/internvideo2.py:766-1087 on the
runtime path (x_vis_only=True, x_vis_return_idx=-2): 3D patch embed
(tubelet=1 → per-frame 14x14 conv), CLS + 3D sin-cos positions, then
depth-1 (=39 of 40) pre-RMSNorm blocks with QK-RMSNorm-over-flattened-heads
(internvideo2.py:590-597), fp32-forced LayerScale (:458-463), exact-GELU MLP
(hidden = int(1408*48/11) = 6144), non-causal attention. The CLIP-teacher
projector/decoder heads never run at inference/training in the VLM and are
not modeled.

Param tree (stacked blocks for lax.scan):
  patch_kernel [P,P,3,D], patch_bias [D]
  cls_token [D], pos_embed [1+T*L, D]
  blocks: {norm1_w [Lyr,D], qkv_kernel [Lyr,D,3D], q_norm_w, k_norm_w [Lyr,D],
           proj {kernel,bias}, ls1 [Lyr,D], norm2_w,
           fc1 {kernel,bias}, fc2 {kernel,bias}, ls2 [Lyr,D]}
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import InternVideo2Config
from ..ops.attention import mha
from ..ops.int8_matmul import matmul_any
from ..ops.normalization import layer_scale, rms_norm


# ---------------------------------------------------------------------------
# 3D sin-cos position embeddings (reference internvideo2.py:33-160)
# ---------------------------------------------------------------------------


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_3d_sincos_pos_embed(embed_dim: int, grid_size: int, t_size: int,
                            cls_token: bool = False) -> np.ndarray:
    """[T*H*W, D] (optionally with a leading zero CLS row). Temporal gets D/4
    dims, spatial 3D/4 (h and w each 3D/8), concatenated [temporal|spatial]."""
    assert embed_dim % 4 == 0
    dim_spatial = embed_dim // 4 * 3
    dim_temporal = embed_dim // 4

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # w first
    emb_h = _sincos_1d(dim_spatial // 2, grid[0])
    emb_w = _sincos_1d(dim_spatial // 2, grid[1])
    pos_spatial = np.concatenate([emb_h, emb_w], axis=1)        # [H*W, 3D/4]

    pos_temporal = _sincos_1d(dim_temporal, np.arange(t_size, dtype=np.float32))

    pos_temporal = np.repeat(pos_temporal[:, None, :], grid_size ** 2, axis=1)
    pos_spatial = np.repeat(pos_spatial[None, :, :], t_size, axis=0)
    pos = np.concatenate([pos_temporal, pos_spatial], axis=-1).reshape(-1, embed_dim)
    if cls_token:
        pos = np.concatenate([np.zeros((1, embed_dim)), pos], axis=0)
    return pos.astype(np.float32)


def interpolate_temporal_pos_embed(pos_embed: np.ndarray, orig_t: int,
                                   new_t: int, spatial_tokens: int) -> np.ndarray:
    """Linearly interpolate the temporal axis of a [1+T*L, D] pos embed
    (reference internvideo2.py:260-320 does this when loading the 4-frame
    checkpoint into an 8-frame model)."""
    cls_row, rest = pos_embed[:1], pos_embed[1:]
    D = pos_embed.shape[-1]
    grid = rest.reshape(orig_t, spatial_tokens, D)
    # linear interpolation along t (matches torch interpolate mode='linear'
    # with align_corners=False semantics used on pos embeds)
    old_pos = (np.arange(orig_t) + 0.5) / orig_t
    new_pos = (np.arange(new_t) + 0.5) / new_t
    out = np.empty((new_t, spatial_tokens, D), dtype=pos_embed.dtype)
    for j, p in enumerate(new_pos):
        x = p * orig_t - 0.5
        lo = int(np.floor(x))
        hi = min(lo + 1, orig_t - 1)
        w = x - lo
        lo = max(lo, 0)
        out[j] = (1 - w) * grid[lo] + w * grid[hi]
    return np.concatenate([cls_row, out.reshape(-1, D)], axis=0)


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: InternVideo2Config, dtype=jnp.float32):
    D, Lyr = cfg.embed_dim, cfg.depth
    I = cfg.mlp_hidden
    P = cfg.patch_size
    keys = jax.random.split(key, 8)
    init = jax.nn.initializers.truncated_normal(0.02)

    def dense(k, d_in, d_out):
        return {"kernel": init(k, (Lyr, d_in, d_out), dtype),
                "bias": jnp.zeros((Lyr, d_out), dtype)}

    t = cfg.num_frames // cfg.tubelet_size
    pos = get_3d_sincos_pos_embed(D, cfg.image_size // P, t, cls_token=True)
    return {
        "patch_kernel": init(keys[0], (P, P, 3, D), dtype),
        "patch_bias": jnp.zeros((D,), dtype),
        "cls_token": jnp.zeros((D,), dtype),
        "pos_embed": jnp.asarray(pos, dtype),
        "blocks": {
            "norm1_w": jnp.ones((Lyr, D), dtype),
            "qkv_kernel": init(keys[1], (Lyr, D, 3 * D), dtype),
            "q_norm_w": jnp.ones((Lyr, D), dtype),
            "k_norm_w": jnp.ones((Lyr, D), dtype),
            "proj": dense(keys[2], D, D),
            "ls1": jnp.full((Lyr, D), cfg.layerscale_init, dtype),
            "norm2_w": jnp.ones((Lyr, D), dtype),
            "fc1": dense(keys[3], D, I),
            "fc2": dense(keys[4], I, D),
            "ls2": jnp.full((Lyr, D), cfg.layerscale_init, dtype),
        },
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _block_fused_int8(x, bp, cfg: InternVideo2Config):
    """W8A8 serving block with fused Pallas GEMMs (ops/fused_block):
    norm+quant+qkv+QK-RMSNorm in one program, proj/fc2 with in-kernel fp32
    LayerScale + residual, fc1 with in-kernel exact GELU. Same quantization
    semantics as the unfused W8A8 path (per-row dynamic activations,
    per-out-channel weights); eliminates the per-pass HBM round-trips that
    capped in-situ W8A8 at 1.08x (CLAUDE.md round-2 findings)."""
    from ..ops.fused_block import (fused_norm_quant_gemm,
                                   fused_quant_gemm_ls_residual)

    B, S, D = x.shape
    H = cfg.num_heads
    Dh = cfg.head_dim
    qn = jnp.stack([bp["q_norm_w"], bp["k_norm_w"]])
    qkv = fused_norm_quant_gemm(
        x, bp["norm1_w"], bp["qkv_kernel"]["q"], bp["qkv_kernel"]["scale"],
        eps=cfg.rms_eps,
        epilogue="qk_norm" if cfg.qk_normalization else "none",
        qk_norm_w=qn)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, S, H, Dh)
    k = k.reshape(B, S, H, Dh)
    v = v.reshape(B, S, H, Dh)
    attn = mha(q, k, v, causal=False,
               bounded_softmax=cfg.qk_normalization).reshape(B, S, D)
    x = fused_quant_gemm_ls_residual(
        attn, bp["proj"]["kernel"]["q"], bp["proj"]["kernel"]["scale"],
        bp["proj"]["bias"], bp["ls1"], x)
    h = fused_norm_quant_gemm(
        x, bp["norm2_w"], bp["fc1"]["kernel"]["q"],
        bp["fc1"]["kernel"]["scale"], eps=cfg.rms_eps, epilogue="gelu",
        bias=bp["fc1"]["bias"])
    return fused_quant_gemm_ls_residual(
        h, bp["fc2"]["kernel"]["q"], bp["fc2"]["kernel"]["scale"],
        bp["fc2"]["bias"], bp["ls2"], x)


def _fused_int8_ok(bp, cfg: InternVideo2Config) -> bool:
    # Opt-in only: measured SLOWER than the unfused W8A8 path at the serving
    # shape (108 vs 80 ms/block, microbench_iv2_block) — the Mosaic fp32
    # VPU work (norm/quant/erf in-kernel) costs more than the HBM passes it
    # saves; the trunk's binding constraint is the attention softmax VPU
    # time, not inter-pass traffic. Kept for shapes/backends where the
    # balance differs.
    import os

    return (os.environ.get("GVLLM_FUSED_IV2", "0") == "1"
            and isinstance(bp.get("qkv_kernel"), dict)
            and cfg.embed_dim % 128 == 0
            and cfg.mlp_hidden % 512 == 0)


def _block(x, bp, cfg: InternVideo2Config):
    if _fused_int8_ok(bp, cfg):
        return _block_fused_int8(x, bp, cfg)
    B, S, D = x.shape
    H = cfg.num_heads
    Dh = cfg.head_dim

    h = rms_norm(x, bp["norm1_w"], cfg.rms_eps)
    qkv = matmul_any(h, bp["qkv_kernel"])  # [B, S, 3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if cfg.qk_normalization:
        # RMSNorm over the *flattened* head dim (reference internvideo2.py:590-597)
        q = rms_norm(q, bp["q_norm_w"], cfg.rms_eps)
        k = rms_norm(k, bp["k_norm_w"], cfg.rms_eps)
    q = q.reshape(B, S, H, Dh)
    k = k.reshape(B, S, H, Dh)
    v = v.reshape(B, S, H, Dh)
    # QK-RMSNorm bounds the scores, so the flash kernel may skip its row-max
    # pass (ops/flash_attention.BOUNDED_OFFSET; measured -20% attention time)
    attn = mha(q, k, v, causal=False,
               bounded_softmax=cfg.qk_normalization).reshape(B, S, D)
    attn = matmul_any(attn, bp["proj"]["kernel"]) + bp["proj"]["bias"]
    x = x + layer_scale(attn, bp["ls1"])

    h = rms_norm(x, bp["norm2_w"], cfg.rms_eps)
    h = jax.nn.gelu(matmul_any(h, bp["fc1"]["kernel"]) + bp["fc1"]["bias"],
                    approximate=False)
    h = matmul_any(h, bp["fc2"]["kernel"]) + bp["fc2"]["bias"]
    return x + layer_scale(h, bp["ls2"])


def patch_embed(params, cfg: InternVideo2Config, pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels [B, T, S, S, 3] → [B, T*L, D]. tubelet=1 → per-frame 2D conv
    (the reference's Conv3d with kernel (1,14,14), internvideo2.py:714-718)."""
    B, T, Hp, Wp, C = pixels.shape
    dtype = params["patch_kernel"].dtype
    flat = pixels.reshape(B * T, Hp, Wp, C).astype(dtype)
    patches = jax.lax.conv_general_dilated(
        flat, params["patch_kernel"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_bias"]
    return patches.reshape(B, T * cfg.patches_per_frame, cfg.embed_dim)


def init_clip_projector(key: jax.Array, cfg: InternVideo2Config,
                        out_dim: int = 768, dtype=jnp.float32):
    """CLIP-teacher attention-pooling head (reference internvideo2.py:338-435:
    CrossAttention + AttentionPoolingBlock, qkv_bias=True, out_dim=768). Off
    the VLM runtime path — provided for full-architecture parity (contrastive /
    retrieval use of the encoder)."""
    D = cfg.embed_dim
    keys = jax.random.split(key, 4)
    init = jax.nn.initializers.truncated_normal(0.02)

    def ln():
        return {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)}

    return {
        "norm_q": ln(), "norm_k": ln(), "norm_v": ln(),
        "q": {"kernel": init(keys[0], (D, D), dtype),
              "bias": jnp.zeros((D,), dtype)},
        "k": {"kernel": init(keys[1], (D, D), dtype),
              "bias": jnp.zeros((D,), dtype)},
        "v": {"kernel": init(keys[2], (D, D), dtype),
              "bias": jnp.zeros((D,), dtype)},
        "proj": {"kernel": init(keys[3], (D, out_dim), dtype),
                 "bias": jnp.zeros((out_dim,), dtype)},
    }


def clip_projector(params, cfg: InternVideo2Config,
                   x: jnp.ndarray) -> jnp.ndarray:
    """Attention pooling: mean-token query cross-attends the sequence →
    [B, out_dim] (reference AttentionPoolingBlock.forward)."""
    from ..ops.normalization import layer_norm

    B, S, D = x.shape
    H = cfg.num_heads
    Dh = D // H
    xq = jnp.mean(x, axis=1, keepdims=True)
    q_in = layer_norm(xq, params["norm_q"]["scale"], params["norm_q"]["bias"])
    k_in = layer_norm(x, params["norm_k"]["scale"], params["norm_k"]["bias"])
    v_in = layer_norm(x, params["norm_v"]["scale"], params["norm_v"]["bias"])
    q = (q_in @ params["q"]["kernel"] + params["q"]["bias"]).reshape(B, 1, H, Dh)
    k = (k_in @ params["k"]["kernel"] + params["k"]["bias"]).reshape(B, S, H, Dh)
    v = (v_in @ params["v"]["kernel"] + params["v"]["bias"]).reshape(B, S, H, Dh)
    pooled = mha(q, k, v, causal=False).reshape(B, D)
    return pooled @ params["proj"]["kernel"] + params["proj"]["bias"]


def features(params, cfg: InternVideo2Config, pixels: jnp.ndarray) -> jnp.ndarray:
    """Run the trunk with early exit; returns [B, 1+T*L, D] (CLS included —
    callers drop it, matching reference llava_next_video.py:532's [:, 1:, :])."""
    x = patch_embed(params, cfg, pixels)
    B = x.shape[0]
    dtype = x.dtype
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype),
                           (B, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(dtype)

    blocks = params["blocks"]
    n_total = blocks["norm1_w"].shape[0]
    if cfg.num_blocks_used == n_total:
        def body(h, bp):
            return _block(h, bp, cfg), None

        x, _ = jax.lax.scan(body, x, blocks)
    else:
        # early exit (reference internvideo2.py:1028-1030 runs depth-2 = 39 of
        # 40 blocks): scan INDICES and gather each block's weights per step —
        # a tree_map slice a[:39] materializes a second full copy of the
        # trunk weights (~2GB bf16 in the train step, ~1GB int8 serving; the
        # allocation that pushed the grounded-stage step out of HBM)
        def body(h, i):
            bp = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, i, 0,
                                                       keepdims=False),
                blocks)
            return _block(h, bp, cfg), None

        x, _ = jax.lax.scan(body, x,
                            jnp.arange(cfg.num_blocks_used, dtype=jnp.int32))
    return x


def _block_absmax(x, bp, cfg: InternVideo2Config):
    """_block's unfused math + per-channel absmax of each GEMM's INPUT
    (the calibration recorder for serve/calibrate.py's static activation
    scales). Runs whatever weight form `bp` holds (bf16 or W8A8 dicts) so
    the recorded maxima match the serving numerics that will consume them."""
    B, S, D = x.shape
    H = cfg.num_heads
    Dh = cfg.head_dim

    def amax(t):
        return jnp.max(jnp.abs(t.astype(jnp.float32)), axis=(0, 1))

    stats = {}
    h = rms_norm(x, bp["norm1_w"], cfg.rms_eps)
    stats["qkv"] = amax(h)
    qkv = matmul_any(h, bp["qkv_kernel"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if cfg.qk_normalization:
        q = rms_norm(q, bp["q_norm_w"], cfg.rms_eps)
        k = rms_norm(k, bp["k_norm_w"], cfg.rms_eps)
    q = q.reshape(B, S, H, Dh)
    k = k.reshape(B, S, H, Dh)
    v = v.reshape(B, S, H, Dh)
    attn = mha(q, k, v, causal=False,
               bounded_softmax=cfg.qk_normalization).reshape(B, S, D)
    stats["proj"] = amax(attn)
    attn = matmul_any(attn, bp["proj"]["kernel"]) + bp["proj"]["bias"]
    x = x + layer_scale(attn, bp["ls1"])

    h = rms_norm(x, bp["norm2_w"], cfg.rms_eps)
    stats["fc1"] = amax(h)
    h = jax.nn.gelu(matmul_any(h, bp["fc1"]["kernel"]) + bp["fc1"]["bias"],
                    approximate=False)
    stats["fc2"] = amax(h)
    h = matmul_any(h, bp["fc2"]["kernel"]) + bp["fc2"]["bias"]
    return x + layer_scale(h, bp["ls2"]), stats


def features_absmax(params, cfg: InternVideo2Config, pixels: jnp.ndarray):
    """features() that ALSO returns per-block per-channel input absmaxes
    {"qkv"/"proj"/"fc1" [Lyr_used, D], "fc2" [Lyr_used, mlp_hidden]} — the
    calibration pass for static W8A8 activation scales (serve/calibrate.py).
    Not a serving path: one extra fp32 reduce per GEMM input."""
    x = patch_embed(params, cfg, pixels)
    B = x.shape[0]
    dtype = x.dtype
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype),
                           (B, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(dtype)

    blocks = params["blocks"]
    n_total = blocks["norm1_w"].shape[0]
    if cfg.num_blocks_used == n_total:
        def body(h, bp):
            return _block_absmax(h, bp, cfg)

        x, stats = jax.lax.scan(body, x, blocks)
    else:
        def body(h, i):
            bp = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, i, 0,
                                                       keepdims=False),
                blocks)
            return _block_absmax(h, bp, cfg)

        x, stats = jax.lax.scan(body, x,
                                jnp.arange(cfg.num_blocks_used,
                                           dtype=jnp.int32))
    return x, stats
