"""Projector MLPs bridging vision features into the LLM embedding space.

  video_projector — Linear(1408→H_llm) → GELU → Linear(H_llm→H_llm)
                    (reference llava_next_video.py:26-39, Video_Projecter)
  mm_projector    — phi3.5: Linear(4096→3072) → GELU → Linear(3072→3072)
                    (reference llava_next_video.py:41-54, Phi3_5_Projecter)
                    llama3: Linear(1024→4096) → GELU → Linear(4096→4096)
                    (HF LlavaMultiModalProjector, reference :15, :140)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_mlp_params(key: jax.Array, d_in: int, d_mid: int, d_out: int,
                    dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    init = jax.nn.initializers.lecun_normal()
    return {
        "fc1": {"kernel": init(k1, (d_in, d_mid), dtype),
                "bias": jnp.zeros((d_mid,), dtype)},
        "fc2": {"kernel": init(k2, (d_mid, d_out), dtype),
                "bias": jnp.zeros((d_out,), dtype)},
    }


def mlp_project(params, x: jnp.ndarray) -> jnp.ndarray:
    h = x @ params["fc1"]["kernel"] + params["fc1"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ params["fc2"]["kernel"] + params["fc2"]["bias"]


def init_video_projector(key, llm_hidden: int, video_dim: int = 1408,
                         dtype=jnp.float32):
    return init_mlp_params(key, video_dim, llm_hidden, llm_hidden, dtype)


def init_mm_projector(key, llm_name: str, llm_hidden: int,
                      clip_hidden: int = 1024, dtype=jnp.float32):
    if llm_name == "phi3.5":
        # input is 2x2-merged CLIP features: 4*clip_hidden
        return init_mlp_params(key, 4 * clip_hidden, llm_hidden, llm_hidden, dtype)
    return init_mlp_params(key, clip_hidden, llm_hidden, llm_hidden, dtype)
