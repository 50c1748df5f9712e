"""CLIP ViT-L/14-336 spatial encoder — pure-function JAX.

Architecture parity with the reference's vendored HF CLIP
(models/modeling_clip.py:159-895): patch conv → CLS + learned positions →
pre-layernorm → N pre-LN transformer layers (quick-GELU MLP). The runtime only
ever consumes the penultimate layer's hidden states with CLS dropped
(reference llava_next_video.py:504-505), so `features()` runs layers
0..N-2 and skips the final layer + post-layernorm entirely.

Param tree (stacked layers for lax.scan):
  embeddings: class_embedding [D], patch_kernel [P,P,3,D], position_embedding [1+N,D]
  pre_ln: {scale, bias}
  layers: {ln1:{scale,bias}, q:{kernel,bias}, k:{...}, v:{...}, o:{...},
           ln2:{scale,bias}, fc1:{kernel,bias}, fc2:{kernel,bias}}  — all [L, ...]
  post_ln: {scale, bias}   (kept for checkpoint fidelity; unused by features())
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import CLIPVisionConfig
from ..ops.attention import mha
from ..ops.int8_matmul import matmul_any
from ..ops.normalization import layer_norm


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def init_params(key: jax.Array, cfg: CLIPVisionConfig, dtype=jnp.float32):
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    P = cfg.patch_size
    n_pos = cfg.num_patches + 1
    keys = jax.random.split(key, 8)
    init = jax.nn.initializers.normal(0.02)

    def dense(k, d_in, d_out):
        return {"kernel": init(k, (L, d_in, d_out), dtype),
                "bias": jnp.zeros((L, d_out), dtype)}

    def ln():
        return {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)}

    return {
        "embeddings": {
            "class_embedding": init(keys[0], (D,), dtype),
            "patch_kernel": init(keys[1], (P, P, 3, D), dtype),
            "position_embedding": init(keys[2], (n_pos, D), dtype),
        },
        "pre_ln": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
        "layers": {
            "ln1": ln(), "ln2": ln(),
            "q": dense(keys[3], D, D), "k": dense(keys[4], D, D),
            "v": dense(keys[5], D, D), "o": dense(keys[6], D, D),
            "fc1": dense(keys[7], D, I),
            "fc2": dense(jax.random.fold_in(key, 99), I, D),
        },
        "post_ln": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
    }


def _layer(x, lp, cfg: CLIPVisionConfig):
    B, S, D = x.shape
    H = cfg.num_heads
    residual = x
    h = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], cfg.layer_norm_eps)
    q = (matmul_any(h, lp["q"]["kernel"]) + lp["q"]["bias"]).reshape(B, S, H, -1)
    k = (matmul_any(h, lp["k"]["kernel"]) + lp["k"]["bias"]).reshape(B, S, H, -1)
    v = (matmul_any(h, lp["v"]["kernel"]) + lp["v"]["bias"]).reshape(B, S, H, -1)
    attn = mha(q, k, v, causal=False).reshape(B, S, D)
    x = residual + (matmul_any(attn, lp["o"]["kernel"]) + lp["o"]["bias"])
    residual = x
    h = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], cfg.layer_norm_eps)
    h = quick_gelu(matmul_any(h, lp["fc1"]["kernel"]) + lp["fc1"]["bias"])
    x = residual + (matmul_any(h, lp["fc2"]["kernel"]) + lp["fc2"]["bias"])
    return x


def embed(params, cfg: CLIPVisionConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels [B, S, S, 3] channel-last → [B, 1+N, D]."""
    emb = params["embeddings"]
    dtype = emb["patch_kernel"].dtype
    patches = jax.lax.conv_general_dilated(
        pixels.astype(dtype), emb["patch_kernel"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, 24, 24, D]
    B = patches.shape[0]
    patches = patches.reshape(B, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(emb["class_embedding"].astype(dtype),
                           (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, patches], axis=1)
    return x + emb["position_embedding"].astype(dtype)


def features(params, cfg: CLIPVisionConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """Penultimate-layer features, CLS dropped: [B, num_patches, D].

    Runs num_layers-1 layers (hidden_states[-2] tap) via lax.scan over stacked
    layer params."""
    x = embed(params, cfg, pixels)
    x = layer_norm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"],
                   cfg.layer_norm_eps)
    n_used = cfg.num_layers + cfg.feature_layer + 1  # -2 → N-1 layers
    layers = params["layers"]
    if n_used == cfg.num_layers:
        def body(h, lp):
            return _layer(h, lp, cfg), None

        x, _ = jax.lax.scan(body, x, layers)
    else:
        # early exit (penultimate tap): scan INDICES and gather each layer's
        # weights per step — a tree_map slice a[:n_used] materializes a second
        # full copy of 23/24 trunk layers (~580MB bf16, ~300MB int8) exactly
        # like the InternVideo2 a[:39] bug (internvideo2.py:244-257)
        def body(h, i):
            lp = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, i, 0,
                                                       keepdims=False),
                layers)
            return _layer(h, lp, cfg), None

        x, _ = jax.lax.scan(body, x, jnp.arange(n_used, dtype=jnp.int32))
    return x[:, 1:, :]
