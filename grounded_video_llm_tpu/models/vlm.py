"""The composite dual-stream VLM — encode, fuse, splice, loss.

Functional parity with reference models/llava_next_video.py:491-614:

  encode_video:
    spatial [B,12,336,336,3] → CLIP penultimate (CLS dropped) → [B*12,576,1024]
      phi3.5: 2x2 patch merge (:454-476) → +sub_GN newline col (:478-489)
              → [B*12,156,4096] → mm_projector → [B,12,156,3072]
      llama3: 24x24 → 8x8 avg pool (:509-517) → mm_projector → [B,12,64,4096]
    temporal [B,96,224,224,3] → 12 clips of 8 → InternVideo2 (early exit, CLS
      dropped) → [B*12, 8*256, 1408] (:528-532) → per-frame 16x16 → 4x4 avg
      pool (:543-549) → video_projector → [B,12,128,H]
    fuse: per-seg concat [image | segment | newline] (:555-565)
      newline = mm_projector(glb_GN) (phi3.5) or image_newline (llama3)

  splice_multimodal: replace the single IMAGE_TOKEN_INDEX slot with the video
    tokens (:568-596), expressed as a static-shape vectorized gather instead of
    per-sample python concatenation (TPU: no dynamic shapes under jit). The
    text-only branch (video tokens appended at the end with attention 0,
    :583-586) is a per-sample boolean, not a python branch.

All pooling is exact reshape-mean (grid sizes divide evenly: 24→8, 16→4), which
XLA fuses; no windowed reduce needed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import VLMConfig
from ..text.templates import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from . import clip_vit, internvideo2, llm as llm_mod, projectors


class Batch(NamedTuple):
    """Device-side training batch."""
    input_ids: jnp.ndarray       # [B, S] int32, one IMAGE_TOKEN_INDEX per row
    labels: jnp.ndarray          # [B, S] int32, IGNORE_INDEX masked
    attn_mask: jnp.ndarray       # [B, S] int32
    spatial_pixels: jnp.ndarray  # [B, num_segs, 336, 336, 3]
    temporal_pixels: jnp.ndarray  # [B, num_frames, 224, 224, 3]
    is_text: jnp.ndarray         # [B] bool — text-only sample (video_ids=='text')


def init_params(key: jax.Array, cfg: VLMConfig, dtype=jnp.float32,
                llm_init=None):
    """llm_init: optional (key, llm_cfg, dtype) -> tree override for the LLM
    component — serve/quantize.init_llm_params_quantized injects a fused
    init+quantize here so big-vocab flagships (llama-3-8B bf16 ≈ 16.1GB)
    never materialize a full bf16 stack on one chip."""
    keys = jax.random.split(key, 6)
    H = cfg.llm.hidden_size
    C = cfg.clip.hidden_size
    params = {
        "clip": clip_vit.init_params(keys[0], cfg.clip, dtype),
        "video_encoder": internvideo2.init_params(keys[1], cfg.video, dtype),
        "mm_projector": projectors.init_mm_projector(keys[2], cfg.llm_name, H,
                                                     C, dtype),
        "video_projector": projectors.init_video_projector(
            keys[3], H, cfg.video.embed_dim, dtype),
        "llm": (llm_init or llm_mod.init_params)(keys[4], cfg.llm, dtype),
    }
    init = jax.nn.initializers.normal(0.02)
    if cfg.llm_name == "phi3.5":
        # glb_GN [1,1,4C], sub_GN [1,1,1,4C] (reference :124-127)
        params["extras"] = {"glb_GN": init(keys[5], (4 * C,), dtype),
                            "sub_GN": init(jax.random.fold_in(key, 7),
                                           (4 * C,), dtype)}
    else:
        params["extras"] = {"image_newline": init(keys[5], (H,), dtype)}
    return params


# ---------------------------------------------------------------------------
# Fusion pieces
# ---------------------------------------------------------------------------


def merge_2x2_phi3(feats: jnp.ndarray) -> jnp.ndarray:
    """[N, 576, C] → [N, 12, 12, 4C] 2x2 patch merge (reference :454-476,
    h_crop=w_crop=1)."""
    N, L, C = feats.shape
    H = 24
    x = feats.reshape(N, H // 2, 2, H // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(N, H // 2, H // 2, 4 * C)


def add_newline_phi3(feats_hd: jnp.ndarray, sub_gn: jnp.ndarray) -> jnp.ndarray:
    """[N, h, w, D] + newline col → [N, h*(w+1), D] (reference :478-489)."""
    N, h, w, D = feats_hd.shape
    newline = jnp.broadcast_to(sub_gn.astype(feats_hd.dtype), (N, h, 1, D))
    return jnp.concatenate([feats_hd, newline], axis=2).reshape(N, h * (w + 1), D)


def _pool_grid(x: jnp.ndarray, in_side: int, out_side: int) -> jnp.ndarray:
    """[..., in_side*in_side, C] → [..., out_side*out_side, C] exact mean pool."""
    lead = x.shape[:-2]
    C = x.shape[-1]
    r = in_side // out_side
    x = x.reshape(*lead, out_side, r, out_side, r, C)
    x = x.mean(axis=(-4, -2))
    return x.reshape(*lead, out_side * out_side, C)


def _maybe_normalize(pixels: jnp.ndarray, mean, std, dtype) -> jnp.ndarray:
    """uint8 pixels → fp32 /255 → normalize → cast (trace-time dispatch on
    dtype). Lets hosts ship RAW RESIZED uint8 frames — 4x smaller transfers
    and no per-frame fp32 normalize on the (single-core) host; the elementwise
    normalize fuses into the encoder's first conv on device. Float inputs pass
    through untouched (the data-pipeline path normalizes on the host,
    ops/preprocess.py parity functions)."""
    if pixels.dtype != jnp.uint8:
        return pixels
    x = pixels.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    return x.astype(dtype)


def encode_video(params, cfg: VLMConfig, spatial_pixels: jnp.ndarray,
                 temporal_pixels: jnp.ndarray,
                 freeze_encoders: bool = True) -> jnp.ndarray:
    """→ video features [B, num_video_tokens, H_llm].

    freeze_encoders: stop gradients at the encoder outputs. Both encoders are
    frozen in every reference training stage (SURVEY §2.4 /
    llava_next_video.py:155-210), so the backward pass through their ~1.3B
    params is never needed — stop_gradient lets XLA drop that entire backward
    graph instead of computing gradients the optimizer would zero."""
    from ..ops.preprocess import (INTERNVIDEO_MEAN, INTERNVIDEO_STD,
                                  OPENAI_DATASET_MEAN, OPENAI_DATASET_STD)

    enc_dtype = params["clip"]["embeddings"]["patch_kernel"].dtype
    spatial_pixels = _maybe_normalize(
        spatial_pixels, OPENAI_DATASET_MEAN, OPENAI_DATASET_STD, enc_dtype)
    temporal_pixels = _maybe_normalize(
        temporal_pixels, INTERNVIDEO_MEAN, INTERNVIDEO_STD, enc_dtype)
    B, S_segs = spatial_pixels.shape[:2]
    F = cfg.num_frames
    fps = cfg.num_frames_per_seg

    sg = jax.lax.stop_gradient if freeze_encoders else (lambda x: x)

    # ---- spatial stream
    sp = spatial_pixels.reshape(B * S_segs, *spatial_pixels.shape[2:])
    image_feats = sg(clip_vit.features(params["clip"], cfg.clip, sp))  # [B*12,576,C]
    if cfg.llm_name == "phi3.5":
        x = merge_2x2_phi3(image_feats)                       # [B*12,12,12,4C]
        x = add_newline_phi3(x, params["extras"]["sub_GN"])   # [B*12,156,4C]
        x = x.reshape(B, S_segs, *x.shape[1:])
        image_feats = projectors.mlp_project(params["mm_projector"], x)
    else:
        x = image_feats.reshape(B, S_segs, 576, -1)
        x = _pool_grid(x, 24, 8)                              # [B,12,64,C]
        image_feats = projectors.mlp_project(params["mm_projector"], x)

    # ---- temporal stream
    tp = temporal_pixels.reshape(B * S_segs, fps, *temporal_pixels.shape[2:])
    chunk = cfg.encoder_chunk_clips
    if chunk and B * S_segs > chunk and (B * S_segs) % chunk == 0:
        # clip-chunked encode: segments are independent until fusion
        # (SURVEY §5.7), so lax.map over chunks caps the encoder's activation
        # transients (qkv/MLP buffers scale with the chunk size, not with
        # B*num_segs) at the cost of serializing chunk launches
        n_chunks = (B * S_segs) // chunk
        seg = jax.lax.map(
            lambda c: internvideo2.features(params["video_encoder"],
                                            cfg.video, c),
            tp.reshape(n_chunks, chunk, *tp.shape[1:]))
        seg = sg(seg.reshape(B * S_segs, *seg.shape[2:]))
    else:
        seg = sg(internvideo2.features(params["video_encoder"], cfg.video, tp))
    seg = seg[:, 1:, :]                                       # drop CLS
    seg = seg.reshape(B * S_segs, fps, cfg.video.patches_per_frame, -1)
    seg = _pool_grid(seg, 16, 4)                              # [B*12,fps,16,1408]
    seg = seg.reshape(B, S_segs, fps * 16, -1)                # [B,12,128,1408]
    seg_feats = projectors.mlp_project(params["video_projector"], seg)

    # ---- newline + fuse
    H = cfg.llm.hidden_size
    if cfg.llm_name == "phi3.5":
        nl = projectors.mlp_project(params["mm_projector"],
                                    params["extras"]["glb_GN"][None, :])
        newline = jnp.broadcast_to(nl.reshape(1, 1, 1, H), (B, S_segs, 1, H))
    else:
        newline = jnp.broadcast_to(
            params["extras"]["image_newline"].reshape(1, 1, 1, H),
            (B, S_segs, 1, H))
    newline = newline.astype(image_feats.dtype)
    video = jnp.concatenate([image_feats, seg_feats, newline], axis=2)
    return video.reshape(B, S_segs * video.shape[2], H)


# Standalone jitted encode — module-level so serving reuses ONE jit instance
# (a fresh jax.jit per call recompiles; CLAUDE.md). The feature-cache path
# (serve/engine.py) encodes each unique video once through this program and
# runs queries through generate_tokens_from_features.
encode_video_jit = functools.partial(
    jax.jit, static_argnames=("cfg", "freeze_encoders"))(encode_video)


# ---------------------------------------------------------------------------
# Multimodal splice
# ---------------------------------------------------------------------------


def splice_multimodal(
    input_ids: jnp.ndarray,   # [B, S] with exactly one IMAGE_TOKEN_INDEX
    labels: Optional[jnp.ndarray],  # [B, S] or None (generation)
    attn_mask: jnp.ndarray,   # [B, S]
    video_features: jnp.ndarray,  # [B, NV, H]
    embed_table: jnp.ndarray,     # [V, H]
    is_text: Optional[jnp.ndarray] = None,  # [B] bool
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Static-shape splice: out length = S - 1 + NV.

    Normal rows:   [pre_text | video | post_text]  (video labels IGNORE, attn 1)
    Text-only rows:[text (image slot removed) | video]  (video attn 0)
    Parity with reference llava_next_video.py:568-596.
    """
    B, S = input_ids.shape
    NV = video_features.shape[1]
    H = video_features.shape[2]
    S_out = S - 1 + NV
    if is_text is None:
        is_text = jnp.zeros((B,), bool)

    img_pos = jnp.argmax(input_ids == IMAGE_TOKEN_INDEX, axis=1)  # [B]
    vstart = jnp.where(is_text, S - 1, img_pos)                   # [B]

    j = jnp.arange(S_out)[None, :]                                # [1, S_out]
    in_video = (j >= vstart[:, None]) & (j < vstart[:, None] + NV)
    # text source index: before video → j (+1 past the removed image slot for
    # text-only rows); after video → j - NV + 1 (skipping the image slot)
    t_pre = j + (j >= img_pos[:, None]).astype(j.dtype) * is_text[:, None]
    t_post = j - NV + 1
    t = jnp.where(j < vstart[:, None], t_pre, t_post)
    t = jnp.clip(t, 0, S - 1)

    gathered_ids = jnp.take_along_axis(input_ids, t, axis=1)
    safe_ids = jnp.where(gathered_ids == IMAGE_TOKEN_INDEX, 0, gathered_ids)
    text_embeds = llm_mod.embed_lookup(
        embed_table, safe_ids, llm_mod.embed_dtype(embed_table))  # [B,S_out,H]

    vj = jnp.clip(j - vstart[:, None], 0, NV - 1)
    video_gathered = jnp.take_along_axis(
        video_features, vj[..., None].astype(jnp.int32), axis=1)
    embeds = jnp.where(in_video[..., None],
                       video_gathered.astype(text_embeds.dtype), text_embeds)

    video_attn = jnp.where(is_text[:, None], 0, 1)
    mask_out = jnp.where(in_video, video_attn,
                         jnp.take_along_axis(attn_mask, t, axis=1))
    if labels is None:
        return embeds, None, mask_out
    labels_out = jnp.where(in_video, IGNORE_INDEX,
                           jnp.take_along_axis(labels, t, axis=1))
    return embeds, labels_out, mask_out


# ---------------------------------------------------------------------------
# Train / eval forward
# ---------------------------------------------------------------------------


def forward_loss(params, cfg: VLMConfig, batch: Batch,
                 remat: bool = False, freeze_encoders: bool = True,
                 lora_dropout: float = 0.0,
                 dropout_rng: Optional[jax.Array] = None,
                 mesh=None, remat_group: int = 1) -> jnp.ndarray:
    """Full multimodal forward → scalar CE loss (reference :598-614).

    lora_dropout + dropout_rng: training-only dropout on the LoRA branch
    (reference llava_next_video.py:215, peft lora_dropout=0.05).

    mesh: SPMD training — forwarded to the chunked CE so the chunk logits
    get an explicit sharding (llm._chunk_logits_sharding)."""
    video_features = encode_video(params, cfg, batch.spatial_pixels,
                                  batch.temporal_pixels,
                                  freeze_encoders=freeze_encoders)
    embeds, labels, mask = splice_multimodal(
        batch.input_ids, batch.labels, batch.attn_mask, video_features,
        params["llm"]["embed"], batch.is_text)
    hidden, _ = llm_mod.forward_hidden(params["llm"], cfg.llm, embeds,
                                       attn_mask=mask, remat=remat,
                                       lora_dropout=lora_dropout,
                                       dropout_rng=dropout_rng,
                                       remat_group=remat_group)
    # sequence-chunked CE: the full fp32 [S, V] logits (2 x 930MB at the
    # grounded length) never materialize — see causal_lm_loss_from_hidden
    return llm_mod.causal_lm_loss_from_hidden(params["llm"], hidden, labels,
                                              mesh=mesh)


def embed_tokens(params, token_ids: jnp.ndarray) -> jnp.ndarray:
    return llm_mod.embed_lookup(params["llm"]["embed"], token_ids)
