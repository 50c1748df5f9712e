"""Opt-in int8 weight-only quantization of the LLM for serving.

Replaces each decoder projection (qkv / o / gate_up / down) and the lm_head
with {"q": int8, "scale": fp32} pairs consumed by models/llm._dense via
ops/int8_matmul, and the embedding table with a per-row int8 pair consumed by
models/llm.embed_lookup (lookups dequantize in-gather; ~100MB HBM on the
32k-vocab flagship). Halves the per-token weight streaming, the single-chip
decode bound. LoRA must be merged first (merge_lora) — adapters don't
quantize."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.int8_matmul import quantize_weights_int8

QUANT_KERNELS = ("qkv_kernel", "o_kernel", "gate_up_kernel", "down_kernel")


def quantize_embed_int8(embed: jnp.ndarray) -> dict:
    """[V, D] → {"q" int8 [V, D], "scale" f32 [V]} (per-row absmax)."""
    absmax = jnp.max(jnp.abs(embed.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(embed.astype(jnp.float32) / scale[:, None]),
                 -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def quantize_llm_for_serving(llm_params: dict, w8a8: bool = False) -> dict:
    """Weight-only int8 by default. w8a8=True additionally tags each decoder
    projection so prefill-sized GEMMs run W8A8 (dynamic per-row activation
    int8 on the int8 MXU, ~1.25x measured on prefill) — an accuracy
    approximation beyond weight-only, so it is a separate opt-in (the
    engine's "int8_full" mode). The tag is a `"w8a8": None` dict entry: None
    is an empty pytree subtree, so the marker lives in the treedef (static
    under jit) rather than as an array leaf."""
    layers = dict(llm_params["layers"])
    assert "lora" not in layers, "merge_lora before quantizing"
    for name in QUANT_KERNELS:
        q, s = quantize_weights_int8(layers[name])  # [L,D,O] → int8 + [L,O]
        layers[name] = {"q": q, "scale": s}
        if w8a8:
            layers[name]["w8a8"] = None
    out = dict(llm_params)
    out["layers"] = layers
    q, s = quantize_weights_int8(llm_params["lm_head"])
    out["lm_head"] = {"q": q, "scale": s}
    out["embed"] = quantize_embed_int8(llm_params["embed"])
    return out


def is_quantized(kernel) -> bool:
    return isinstance(kernel, dict) and "q" in kernel


def _quantize_dense(d: dict) -> dict:
    out = dict(d)
    q, s = quantize_weights_int8(d["kernel"])
    out["kernel"] = {"q": q, "scale": s}
    return out


def quantize_video_encoder_for_serving(params: dict) -> dict:
    """W8A8 serving quantization of the InternVideo2 trunk: per-out-channel
    int8 weights for qkv/proj/fc1/fc2; activations quantize per-row
    dynamically inside ops/int8_matmul.matmul_any. The int8 MXU runs these
    compute-bound GEMMs ~1.5x faster than bf16 (measured) and halves the
    trunk's weight HBM. Attention, norms, LayerScale, patch embed and the
    pos tables stay bf16/fp32 — the fp32-island parity contract is untouched.
    Opt-in: W8A8 is a serving approximation, off by default."""
    blocks = dict(params["blocks"])
    q, s = quantize_weights_int8(blocks["qkv_kernel"])  # [Lyr, D, 3D]
    blocks["qkv_kernel"] = {"q": q, "scale": s}
    for name in ("proj", "fc1", "fc2"):
        blocks[name] = _quantize_dense(blocks[name])
    out = dict(params)
    out["blocks"] = blocks
    return out


def quantize_clip_for_serving(params: dict) -> dict:
    """W8A8 serving quantization of the CLIP ViT (same scheme as the video
    encoder: q/k/v/o/fc1/fc2 per-out-channel int8, dynamic activations)."""
    layers = dict(params["layers"])
    for name in ("q", "k", "v", "o", "fc1", "fc2"):
        layers[name] = _quantize_dense(layers[name])
    out = dict(params)
    out["layers"] = layers
    return out


def init_llm_params_quantized(key, cfg, dtype=jnp.bfloat16,
                              w8a8: bool = False) -> dict:
    """Random-init the LLM DIRECTLY in serving-int8 form, without ever
    materializing the full bf16 stack.

    Why: llama-3-8B bf16 is ~16.1GB against ~14.5GB of usable HBM on one
    v5e, so jit(init) → jit(quantize, donate) cannot run — and because the
    axon backend's block_until_ready is not a barrier, the OOM surfaces only
    at the first real forward, far from the cause. Here a lax.scan generates
    ONE layer's bf16 projections per step and quantizes them in the same
    program: peak memory = the int8 stacks plus a single layer of bf16
    transients (~0.5GB for llama-3-8B).

    Tree structure/dtypes match quantize_llm_for_serving(llm.init_params(...))
    exactly (tested); values differ only in the per-layer rng fold."""
    import jax

    D = cfg.hidden_size
    I = cfg.intermediate_size
    L = cfg.num_layers
    V = cfg.padded_vocab_size
    qkv_out = cfg.q_dim + 2 * cfg.kv_dim
    init = jax.nn.initializers.normal(0.02)
    keys = jax.random.split(key, 8)

    shapes = (("qkv_kernel", (D, qkv_out)), ("o_kernel", (cfg.q_dim, D)),
              ("gate_up_kernel", (D, 2 * I)), ("down_kernel", (I, D)))

    def one_layer(carry, k):
        ks = jax.random.split(k, len(shapes))
        out = {}
        for (name, shape), kk in zip(shapes, ks):
            q, s = quantize_weights_int8(init(kk, shape, dtype))
            out[name] = {"q": q, "scale": s}
        return carry, out

    _, stacks = jax.lax.scan(one_layer, 0, jax.random.split(keys[1], L))
    layers = {"input_norm_w": jnp.ones((L, D), dtype),
              "post_norm_w": jnp.ones((L, D), dtype)}
    for name in QUANT_KERNELS:
        layers[name] = dict(stacks[name])
        if w8a8:
            layers[name]["w8a8"] = None
    hq, hs = quantize_weights_int8(init(keys[5], (D, V), dtype))
    return {
        "embed": quantize_embed_int8(init(keys[0], (V, D), dtype)),
        "layers": layers,
        "final_norm_w": jnp.ones((D,), dtype),
        "lm_head": {"q": hq, "scale": hs},
    }


def init_vlm_params_serving(key, cfg, w8a8: bool = False,
                            quantize_encoders: bool = False) -> dict:
    """Full serving-quantized VLM random init as ONE traceable program (jit
    the whole call): the LLM goes through init_llm_params_quantized (no bf16
    stack), encoders init bf16 and quantize as intra-program transients.
    This is the memory-safe setup path for big-vocab flagships — bench.py
    and CLI smoke mode use it whenever int8 serving is requested."""
    import functools

    from ..models import vlm as vlm_mod

    params = vlm_mod.init_params(
        key, cfg, jnp.bfloat16,
        llm_init=functools.partial(init_llm_params_quantized, w8a8=w8a8))
    if quantize_encoders:
        params["video_encoder"] = quantize_video_encoder_for_serving(
            params["video_encoder"])
        params["clip"] = quantize_clip_for_serving(params["clip"])
    return params


def upload_llm_quantized(host_llm: dict, w8a8: bool = False,
                         chunk_layers: int = 4) -> dict:
    """Host (numpy, any float dtype) LLM tree → serving-int8 tree ON DEVICE
    without the bf16 stack ever existing device-side. Each projection stack
    uploads in layer chunks that are quantized into a pre-allocated int8
    buffer (donated dynamic_update_slice → in-place); peak device memory is
    the int8 stacks plus one chunk of bf16 (~1GB for llama-3-8B at
    chunk_layers=4, vs 16.1GB for the full bf16 tree — more than one v5e's
    usable HBM). Chunking also bounds host-pinned transfer buffers on the
    ~50MB/s axon tunnel. Quantization math is chunk-invariant (per-out-
    channel absmax over D), so the result is BIT-IDENTICAL to
    quantize_llm_for_serving over a whole bf16 upload (tested)."""
    import jax
    import numpy as np

    quant = jax.jit(quantize_weights_int8)
    upd3 = jax.jit(
        lambda buf, val, i: jax.lax.dynamic_update_slice(buf, val, (i, 0, 0)),
        donate_argnums=0)
    upd2 = jax.jit(
        lambda buf, val, i: jax.lax.dynamic_update_slice(buf, val, (i, 0)),
        donate_argnums=0)

    layers_in = host_llm["layers"]
    layers = {
        "input_norm_w": jnp.asarray(np.asarray(layers_in["input_norm_w"]),
                                    jnp.bfloat16),
        "post_norm_w": jnp.asarray(np.asarray(layers_in["post_norm_w"]),
                                   jnp.bfloat16),
    }
    for name in QUANT_KERNELS:
        w = np.asarray(layers_in[name])              # [L, D, O] host
        L, D, O = w.shape
        qbuf = jnp.zeros((L, D, O), jnp.int8)
        sbuf = jnp.zeros((L, O), jnp.float32)
        for s0 in range(0, L, chunk_layers):
            chunk = jnp.asarray(w[s0:s0 + chunk_layers].astype(np.float32),
                                jnp.bfloat16)
            q, s = quant(chunk)
            qbuf = upd3(qbuf, q, s0)
            sbuf = upd2(sbuf, s, s0)
            del chunk
        layers[name] = {"q": qbuf, "scale": sbuf}
        if w8a8:
            layers[name]["w8a8"] = None
    hq, hs = quant(jnp.asarray(np.asarray(host_llm["lm_head"], np.float32),
                               jnp.bfloat16))
    return {
        "embed": jax.jit(quantize_embed_int8)(
            jnp.asarray(np.asarray(host_llm["embed"], np.float32),
                        jnp.bfloat16)),
        "layers": layers,
        "final_norm_w": jnp.asarray(np.asarray(host_llm["final_norm_w"]),
                                    jnp.bfloat16),
        "lm_head": {"q": hq, "scale": hs},
    }
