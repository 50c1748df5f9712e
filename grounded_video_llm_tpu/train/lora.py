"""LoRA overlay on the LLM's fused projection matrices.

Parity intent with reference llava_next_video.py:212-229 (peft r=128, α=256,
dropout 0.05): low-rank adapters on attention + MLP projections, trained
alongside lm_head/embed in the grounded/sft stages. TPU-idiomatic differences:
adapters attach to the *fused* qkv/gate_up matrices (the reference's phi3.5
target list is exactly these fused mats plus o/down; llama's 7 separate mats
fold into the same four fused slots), and the forward computes x@A@B without
materializing the delta (models/llm.py:_dense).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import LLMConfig

LORA_TARGETS = ("qkv", "o", "gate_up", "down")
_TARGET_DIMS = {
    "qkv": lambda cfg: (cfg.hidden_size, cfg.q_dim + 2 * cfg.kv_dim),
    "o": lambda cfg: (cfg.q_dim, cfg.hidden_size),
    "gate_up": lambda cfg: (cfg.hidden_size, 2 * cfg.intermediate_size),
    "down": lambda cfg: (cfg.intermediate_size, cfg.hidden_size),
}


def init_lora(key: jax.Array, cfg: LLMConfig, rank: int = 128,
              alpha: float = 256.0, dtype=jnp.float32):
    """A ~ N(0, 0.02), B = 0 (standard LoRA init: delta starts at zero)."""
    L = cfg.num_layers
    init = jax.nn.initializers.normal(0.02)
    out = {}
    for i, name in enumerate(LORA_TARGETS):
        d_in, d_out = _TARGET_DIMS[name](cfg)
        out[name] = {
            "a": init(jax.random.fold_in(key, i), (L, d_in, rank), dtype),
            "b": jnp.zeros((L, rank, d_out), dtype),
            "scale": jnp.full((L,), alpha / rank, dtype),
        }
    return out


def attach_lora(llm_params, lora_params):
    """Insert the lora subtree into the layer params (consumed by
    models/llm.py:_dense)."""
    layers = dict(llm_params["layers"])
    layers["lora"] = lora_params
    out = dict(llm_params)
    out["layers"] = layers
    return out


def detach_lora(llm_params):
    layers = dict(llm_params["layers"])
    lora = layers.pop("lora", None)
    out = dict(llm_params)
    out["layers"] = layers
    return out, lora


def merge_lora(llm_params):
    """Fold adapters into the base weights (for serving without the extra
    matmuls): W' = W + scale * A@B."""
    params, lora = detach_lora(llm_params)
    if lora is None:
        return llm_params
    layers = dict(params["layers"])
    for name, la in lora.items():
        key = f"{name}_kernel"
        delta = jnp.einsum("lir,lro->lio", la["a"], la["b"])
        layers[key] = layers[key] + delta * la["scale"][:, None, None].astype(
            layers[key].dtype)
    out = dict(params)
    out["layers"] = layers
    return out
