"""Decoder-only causal LM: Phi-3.5-mini and Llama-3 in one functional module.

Architecture parity:
  phi3  — fused qkv_proj / gate_up_proj, SiLU-gated MLP, LongRoPE-capable,
          no attention/MLP biases (reference models/modeling_phi3.py:448-611).
  llama — separate q/k/v (GQA, 8 kv heads), rope theta from config
          (reference models/modeling_llama.py:207-401).
Both: pre-RMSNorm blocks, fp32 logits (reference modeling_phi3.py:1524-1526).

Weights are stored in the *fused* layout for both families (llama's separate
q/k/v concatenate into qkv at conversion time) — one [D, (H+2Hkv)*Dh] matmul
keeps the MXU busy and simplifies tensor-parallel sharding. Layers are stacked
along a leading axis and executed with lax.scan (fast compile, rematerializable,
shardable by annotating the per-layer dims).

Decode uses a fixed-shape KV cache ([L, B, max_len, Hkv, Dh]) with a validity
length — the static-shape TPU replacement for HF DynamicCache (SURVEY §3.5).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import LLMConfig
from ..ops.attention import decode_attention, mha
from ..ops.normalization import rms_norm
from ..ops.rope import apply_rope, llm_rope_tables


class KVCache(NamedTuple):
    k: jnp.ndarray      # [L, B, max_len, Hkv, Dh]
    v: jnp.ndarray      # [L, B, max_len, Hkv, Dh]
    length: jnp.ndarray  # [B] int32 — number of valid positions

    @classmethod
    def create(cls, cfg: LLMConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                   jnp.zeros((batch,), jnp.int32))


class QuantKVCache(NamedTuple):
    """Int8 KV cache (per-position-per-head scales): halves cache HBM, the
    capacity wall limiting the serving batch on one chip. HEAD-MAJOR,
    K/V-TRANSPOSED layout (head_dim on sublanes, max_len on lanes) — phi3's
    head_dim 96 in the lane dim would pad to 128 (1.33x HBM; measured +1.78GB
    across k+v at batch 8). See ops/decode_attention_int8."""
    k: jnp.ndarray        # [L, B, Hkv, Dh, max_len] int8
    k_scale: jnp.ndarray  # [L, B, Hkv, 1, max_len] f32
    v: jnp.ndarray        # int8
    v_scale: jnp.ndarray  # f32
    length: jnp.ndarray   # [B] int32

    @property
    def max_len(self) -> int:
        return self.k.shape[4]


def init_params(key: jax.Array, cfg: LLMConfig, dtype=jnp.float32):
    D = cfg.hidden_size
    I = cfg.intermediate_size
    L = cfg.num_layers
    V = cfg.padded_vocab_size
    qkv_out = cfg.q_dim + 2 * cfg.kv_dim
    keys = jax.random.split(key, 8)
    init = jax.nn.initializers.normal(0.02)
    return {
        "embed": init(keys[0], (V, D), dtype),
        "layers": {
            "input_norm_w": jnp.ones((L, D), dtype),
            "qkv_kernel": init(keys[1], (L, D, qkv_out), dtype),
            "o_kernel": init(keys[2], (L, cfg.q_dim, D), dtype),
            "post_norm_w": jnp.ones((L, D), dtype),
            "gate_up_kernel": init(keys[3], (L, D, 2 * I), dtype),
            "down_kernel": init(keys[4], (L, I, D), dtype),
        },
        "final_norm_w": jnp.ones((D,), dtype),
        "lm_head": init(keys[5], (D, V), dtype),
    }


def embed_lookup(embed, token_ids: jnp.ndarray,
                 dtype=jnp.bfloat16) -> jnp.ndarray:
    """Embedding gather supporting the int8 serving table ({"q" [V,D] int8,
    "scale" [V] f32} per-row symmetric — lookups dequantize rows in-gather;
    saves ~100MB HBM on the 32k-vocab flagship)."""
    if isinstance(embed, dict):
        rows = embed["q"][token_ids].astype(jnp.float32)
        return (rows * embed["scale"][token_ids][..., None]).astype(dtype)
    return embed[token_ids]


def embed_dtype(embed):
    """Activation dtype implied by an embedding table (dict → bf16)."""
    return jnp.bfloat16 if isinstance(embed, dict) else embed.dtype


# Row count above which an int8-weight matmul dequantizes the weight once and
# runs a plain bf16 MXU matmul instead of the Pallas dequant-in-VMEM GEMV
# kernel. The kernel wins when memory-bound (decode: rows = batch ≤ 8 —
# halved weight streaming is the whole point); at prefill rows ≈ B*S ≈ 21k
# the matmul is compute-bound and the in-kernel dequant throttles the MXU
# (profiled: prefill ~72 TF/s effective vs ~126 for bf16 — ~2.2s of a 7.7s
# batch). Dequant traffic (read int8 + write bf16 per layer) is ~20ms/batch,
# noise against the ~1s saved.
_INT8_GEMM_MIN_ROWS = 256


def _matmul_maybe_int8(x, kernel):
    """x [..., D] @ kernel, where kernel is a dense array or an int8
    {"q", "scale"} pair (serve/quantize.py): few-row GEMVs run the Pallas
    dequant-in-VMEM kernel; large GEMMs either dequantize-then-matmul
    (weight-only semantics) or, when the kernel carries the "w8a8" opt-in
    marker (quantize_llm_for_serving(w8a8=True) — the engine's "int8_full"
    mode), run W8A8 with dynamic per-row activation quantization on the int8
    MXU (~1.25x measured on prefill; a further accuracy approximation)."""
    if isinstance(kernel, dict):
        lead = x.shape[:-1]
        rows = 1
        for d in lead:
            rows *= d
        if rows >= _INT8_GEMM_MIN_ROWS:
            if "w8a8" in kernel:
                from ..ops.int8_matmul import dynamic_int8_matmul

                return dynamic_int8_matmul(x, kernel["q"], kernel["scale"])
            # weight-only: dequantize the weight once (fused by XLA into the
            # matmul's operand stream) and run the bf16 MXU — compute-bound
            # at these row counts, so int8 streaming buys nothing
            w = kernel["q"].astype(x.dtype) * kernel["scale"].astype(
                x.dtype)[..., None, :]
            return jnp.matmul(x, w, preferred_element_type=jnp.float32
                              ).astype(x.dtype)
        from ..ops.int8_matmul import int8_matmul

        flat = x.reshape(-1, x.shape[-1])
        out = int8_matmul(flat, kernel["q"], kernel["scale"])
        return out.reshape(*lead, out.shape[-1])
    return x @ kernel


_LORA_SLOT = {"qkv": 0, "o": 1, "gate_up": 2, "down": 3}


def _dense(x, kernel, lp, name: str, drop=None):
    """Dense matmul with optional LoRA overlay (x@A@B, rank kept small — the
    delta matrix is never materialized). LoRA targets the fused projections,
    the TPU-idiomatic equivalent of the reference's per-matrix peft targets
    (reference llava_next_video.py:212-229, r=128 α=256, dropout=0.05).

    drop: (rate, per-layer key) — training-only inverted dropout on the LoRA
    branch input, peft semantics (dropout feeds A; the frozen base path is
    untouched)."""
    y = _matmul_maybe_int8(x, kernel)
    lora = lp.get("lora")
    if lora is not None and name in lora:
        la = lora[name]
        xl = x
        if drop is not None:
            rate, key = drop
            key = jax.random.fold_in(key, _LORA_SLOT[name])
            keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
            xl = jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)
        y = y + ((xl @ la["a"]) @ la["b"]) * la["scale"][..., None, None]
    return y


def _qkv(x, lp, cfg: LLMConfig, drop=None):
    B, S, _ = x.shape
    qkv = _dense(x, lp["qkv_kernel"], lp, "qkv", drop)
    q, k, v = jnp.split(qkv, [cfg.q_dim, cfg.q_dim + cfg.kv_dim], axis=-1)
    return (q.reshape(B, S, cfg.num_heads, cfg.head_dim),
            k.reshape(B, S, cfg.num_kv_heads, cfg.head_dim),
            v.reshape(B, S, cfg.num_kv_heads, cfg.head_dim))


def _mlp(h, lp, cfg: LLMConfig, drop=None):
    gate_up = _dense(h, lp["gate_up_kernel"], lp, "gate_up", drop)
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return _dense(jax.nn.silu(gate) * up, lp["down_kernel"], lp, "down", drop)


def _layer_full(x, lp, cfg: LLMConfig, cos, sin, attn_mask, drop=None):
    """Full-sequence (train / prefill) layer. Returns (x, (k, v)) so prefill
    can collect the cache."""
    B, S, D = x.shape
    h = rms_norm(x, lp["input_norm_w"], cfg.rms_eps)
    q, k, v = _qkv(h, lp, cfg, drop)
    q, k = apply_rope(q, k, cos, sin)
    attn = mha(q, k, v, causal=True, mask=attn_mask,
               sliding_window=cfg.sliding_window).reshape(B, S, cfg.q_dim)
    x = x + _dense(attn, lp["o_kernel"], lp, "o", drop)
    h = rms_norm(x, lp["post_norm_w"], cfg.rms_eps)
    x = x + _mlp(h, lp, cfg, drop)
    return x, (k, v)


def forward_hidden(
    params,
    cfg: LLMConfig,
    inputs_embeds: jnp.ndarray,     # [B, S, D]
    attn_mask: Optional[jnp.ndarray] = None,  # [B, S] 1/0
    positions: Optional[jnp.ndarray] = None,  # [B, S]
    remat: bool = False,
    collect_kv: bool = False,
    kv_pad_to: Optional[int] = None,
    quantize_kv: bool = False,
    lora_dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    rope_hint: Optional[int] = None,
    remat_group: int = 1,
):
    """Run all decoder layers; returns (hidden [B,S,D], stacked (k,v) or None).

    kv_pad_to: with collect_kv, pad each layer's k/v to this length INSIDE the
    scan so the stacked ys buffer is allocated directly at cache size — padding
    afterwards would briefly hold prompt-length stacks AND the full cache
    (measured: the duplicate ~5.5GB pushed batch-4 serving out of HBM).

    LongRoPE factor selection is STATIC per program: plain forward (training)
    picks short/long from S — the reference's per-forward seq_len rule
    (modeling_phi3.py:381-386 with right-padded batches); prefill-into-cache
    picks from the cache capacity kv_pad_to, the same hint decode_step uses,
    so cached keys and later queries always share one factor set. The
    reference instead switches factors mid-generation and recomputes the whole
    cache at the 4096 boundary (modeling_phi3.py:1557-1562) — dynamic cache
    reallocation that has no static-shape TPU expression. The one divergence:
    a generation whose prompt fits in 4096 but whose token budget exceeds it
    runs long factors from the start instead of switching at the boundary;
    for this model family grounded prompts alone are >4096 (3420 video tokens
    + text), so the budget rule and the reference rule coincide in practice."""
    B, S, D = inputs_embeds.shape
    if positions is None:
        if attn_mask is not None:
            # left-padded prompts: position = cumsum of mask - 1, clamped
            positions = jnp.maximum(jnp.cumsum(attn_mask, axis=-1) - 1, 0)
        else:
            positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    if rope_hint is None:
        # LongRoPE factor selection (docstring above): default to the cache
        # capacity when prefilling into one, else the sequence length.
        # Callers that split one logical sequence across programs (prefix-KV
        # serving, models/llm.prefill_continue) pass the FINAL cache capacity
        # explicitly so every program picks the same factor set.
        rope_hint = kv_pad_to if (collect_kv and kv_pad_to is not None) else S
    cos, sin = llm_rope_tables(cfg, positions, seq_len_hint=rope_hint)
    x = inputs_embeds

    layer_fn = _layer_full
    if remat:
        layer_fn = jax.checkpoint(_layer_full, static_argnums=(2,))

    layer_keys = None
    if lora_dropout > 0.0 and dropout_rng is not None:
        layer_keys = jax.random.split(dropout_rng, params["layers"]
                                      ["input_norm_w"].shape[0])

    def body(h, xs):
        lp, key_l = xs
        drop = None if key_l is None else (lora_dropout, key_l)
        h2, kv = layer_fn(h, lp, cfg, cos, sin, attn_mask, drop)
        if not collect_kv:
            return h2, None
        k, v = kv
        if quantize_kv:
            from ..ops.decode_attention_int8 import quantize_kv as qkv_fn

            # head-major transposed int8 layout: [B, Hkv, D, S(pad)] +
            # scales [B, Hkv, 1, S(pad)]
            k, ks = qkv_fn(k)   # [B,S,Hkv,D] i8, [B,S,Hkv] f32
            v, vs = qkv_fn(v)
            k = k.transpose(0, 2, 3, 1)
            v = v.transpose(0, 2, 3, 1)
            ks = ks.transpose(0, 2, 1)[:, :, None, :]
            vs = vs.transpose(0, 2, 1)[:, :, None, :]
            if kv_pad_to is not None and kv_pad_to > S:
                pad = ((0, 0), (0, 0), (0, 0), (0, kv_pad_to - S))
                k, v = jnp.pad(k, pad), jnp.pad(v, pad)
                ks = jnp.pad(ks, pad, constant_values=1.0)
                vs = jnp.pad(vs, pad, constant_values=1.0)
            return h2, ((k, ks), (v, vs))
        if kv_pad_to is not None and kv_pad_to > S:
            pad = ((0, 0), (0, kv_pad_to - S), (0, 0), (0, 0))
            k, v = jnp.pad(k, pad), jnp.pad(v, pad)
        return h2, (k, v)

    if remat and remat_group > 1 and not collect_kv:
        # GROUPED remat: checkpoint every remat_group layers instead of every
        # layer — the saved boundary activations shrink by the group factor
        # ([B,S,D] x L/g instead of x L) while total recompute is UNCHANGED
        # (each group's backward replays its g layers once, exactly like g
        # per-layer checkpoints). The memory margin this buys (~0.75GB at the
        # grounded flagship with g=2) is what lets host-loop grad
        # accumulation fit beside 10.2GB params + Adam moments on one v5e
        # (BENCH_TRAIN_r05.json). Training-only: collect_kv paths never remat.
        g = remat_group
        L = params["layers"]["input_norm_w"].shape[0]
        if L % g:
            raise ValueError(f"remat_group {g} must divide num_layers {L}")
        glayers = jax.tree_util.tree_map(
            lambda a: a.reshape(L // g, g, *a.shape[1:]), params["layers"])
        gkeys = (layer_keys.reshape(L // g, g) if layer_keys is not None
                 else None)

        @jax.checkpoint
        def group_fn(h, xs):
            # inner layers UNROLLED (python loop), not a nested lax.scan:
            # the axon compile helper rejects the scan-in-checkpoint-in-scan
            # program shape outright (2026-08-20)
            lp_g, keys_g = xs
            for j in range(g):
                lp = jax.tree_util.tree_map(lambda a: a[j], lp_g)
                key_l = keys_g[j] if keys_g is not None else None
                drop = None if key_l is None else (lora_dropout, key_l)
                h, _ = _layer_full(h, lp, cfg, cos, sin, attn_mask, drop)
            return h, None

        x, kvs = jax.lax.scan(group_fn, x, (glayers, gkeys))
    else:
        x, kvs = jax.lax.scan(body, x, (params["layers"], layer_keys))
    x = rms_norm(x, params["final_norm_w"], cfg.rms_eps)
    return x, kvs


def logits_from_hidden(params, hidden: jnp.ndarray) -> jnp.ndarray:
    """fp32 logits (reference modeling_phi3.py:1524-1526). The fp32 island is
    realized as fp32 MXU *accumulation* over the stored-dtype weights rather
    than casting the [D, V] matrix up — a bf16 lm_head would otherwise be
    re-materialized as 2x the bytes every decode step."""
    lm_head = params["lm_head"]
    if isinstance(lm_head, dict):
        return _matmul_maybe_int8(hidden, lm_head).astype(jnp.float32)
    return jnp.dot(hidden, lm_head, preferred_element_type=jnp.float32)


def forward_logits(params, cfg, inputs_embeds, attn_mask=None, positions=None,
                   remat: bool = False, lora_dropout: float = 0.0,
                   dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    hidden, _ = forward_hidden(params, cfg, inputs_embeds, attn_mask, positions,
                               remat=remat, lora_dropout=lora_dropout,
                               dropout_rng=dropout_rng)
    return logits_from_hidden(params, hidden)


def causal_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                   ignore_index: int = -100) -> jnp.ndarray:
    """Shifted cross-entropy in fp32, mean over non-ignored targets
    (HF CausalLM loss semantics, reference modeling_phi3.py:1528-1540)."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != ignore_index
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    total = jnp.sum(jnp.where(valid, -token_ll, 0.0))
    count = jnp.maximum(jnp.sum(valid), 1)
    return total / count


def _chunk_logits_sharding(shape, mesh):
    """Explicit sharding for the [B, chunk, V] chunk logits under SPMD:
    batch over (data, fsdp), vocab over tensor (each axis only when it
    divides). Without this the partitioner sees a batch-sharded producer
    (the take_along_axis scatter in the CE backward) and a vocab-sharded
    consumer (log_softmax's add) and resolves the conflict by REPLICATING
    the logits-sized tensor — the 'Involuntary full rematerialization'
    SPMD warning; at the flagship vocab that is ~1GB of collective traffic
    per chunk per step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    bs = sizes.get("data", 1) * sizes.get("fsdp", 1)
    ts = sizes.get("tensor", 1)
    spec = [None] * len(shape)
    if bs > 1 and shape[0] % bs == 0:
        spec[0] = ("data", "fsdp")
    if ts > 1 and shape[-1] % ts == 0:
        spec[-1] = "tensor"
    return NamedSharding(mesh, P(*spec))


def causal_lm_loss_from_hidden(params, hidden: jnp.ndarray,
                               labels: jnp.ndarray,
                               ignore_index: int = -100,
                               chunk: int = 1024,
                               mesh=None) -> jnp.ndarray:
    """Sequence-chunked shifted CE: identical math to
    logits_from_hidden + causal_lm_loss, but the fp32 [S, V] logits never
    materialize — the grounded train step's full-size logits are
    2 x 930MB f32 at S=7.5k x V=32k, the allocation that pushed the step
    out of HBM. Each chunk projects [chunk, V] (≈130MB), takes its CE
    partial sums under jax.checkpoint (the backward recomputes the chunk's
    logits instead of storing them), and the scan carries only scalars.

    mesh: when training SPMD over a device mesh, pass it so the chunk
    logits get an explicit sharding (see _chunk_logits_sharding)."""
    B, S, D = hidden.shape
    h = hidden[:, :-1]
    lab = labels[:, 1:]
    n = S - 1
    pad = (-n) % chunk
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        lab = jnp.pad(lab, ((0, 0), (0, pad)), constant_values=ignore_index)
    n_chunks = (n + pad) // chunk
    h = h.reshape(B, n_chunks, chunk, D).transpose(1, 0, 2, 3)
    lab = lab.reshape(B, n_chunks, chunk).transpose(1, 0, 2)

    @jax.checkpoint
    def chunk_ce(carry, xs):
        total, count = carry
        h_c, lab_c = xs
        logits = logits_from_hidden(params, h_c)       # [B, chunk, V] f32
        if mesh is not None:
            logits = jax.lax.with_sharding_constraint(
                logits, _chunk_logits_sharding(logits.shape, mesh))
        valid = lab_c != ignore_index
        safe = jnp.where(valid, lab_c, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        total = total + jnp.sum(jnp.where(valid, -ll, 0.0))
        count = count + jnp.sum(valid)
        return (total, count), None

    (total, count), _ = jax.lax.scan(
        chunk_ce, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
        (h, lab))
    return total / jnp.maximum(count, 1)


# ---------------------------------------------------------------------------
# Prefill / decode with KV cache
# ---------------------------------------------------------------------------


def prefill(
    params, cfg: LLMConfig, inputs_embeds: jnp.ndarray,
    attn_mask: jnp.ndarray, cache: KVCache,
    quantize_cache: bool = False,
):
    """Run the prompt once, populate the cache, return last-position logits.

    Prompts are left-padded (reference llava_next_video.py:630-647), so the
    last position is always the newest token. The cache stores the full padded
    prefix; padded slots are masked by storing their validity in the attention
    length via the *padded* length and re-masking at decode with the original
    attn_mask prefix."""
    B, S, D = inputs_embeds.shape
    max_len = cache.k.shape[2]
    hidden, kvs = forward_hidden(params, cfg, inputs_embeds, attn_mask,
                                 collect_kv=True, kv_pad_to=max_len,
                                 quantize_kv=quantize_cache)
    length = jnp.full((B,), S, jnp.int32)
    logits = logits_from_hidden(params, hidden[:, -1:, :])
    if quantize_cache:
        (kq, ks), (vq, vs) = kvs
        return logits[:, 0], QuantKVCache(kq, ks, vq, vs, length)
    k_stack, v_stack = kvs  # [L, B, max_len, Hkv, Dh] — allocated AT cache size
    return logits[:, 0], KVCache(k_stack.astype(cache.k.dtype),
                                 v_stack.astype(cache.v.dtype), length)


def _rect_attention(q, pk, pv, k_c, v_c, keep, scale):
    """Rectangular chunk attention for prefill_continue: queries q [B,Sq,H,Dh]
    attend [prefix ; chunk] keys WITHOUT materializing a broadcast prefix —
    the prefix K/V stay at their stored batch dim (1 for a shared per-video
    prefix; ~0.7GB/side bf16 at flagship, x B if concatenated) and broadcast
    only inside the score/PV dot_generals. Same numerics as ops.attention
    .xla_mha: fp32 MXU score accumulation, fp32 softmax over the full row.

    pk/pv [Bp, Sp, Hkv, Dh] (Bp in {1, B}); k_c/v_c [B, Sq, Hkv, Dh];
    keep [B, Sq, Sp+Sq] bool."""
    B, Sq, H, Dh = q.shape
    Sp = pk.shape[1]
    Hkv = k_c.shape[2]
    groups = H // Hkv
    qg = q.reshape(B, Sq, Hkv, groups, Dh)
    if pk.shape[0] == 1:
        sp = jnp.einsum("bqhgd,khd->bhgqk", qg, pk[0],
                        preferred_element_type=jnp.float32)
    else:
        sp = jnp.einsum("bqhgd,bkhd->bhgqk", qg, pk,
                        preferred_element_type=jnp.float32)
    sc = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k_c,
                    preferred_element_type=jnp.float32)
    scores = jnp.concatenate([sp, sc], axis=-1) * scale  # [B,Hkv,g,Sq,Sp+Sq]
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(keep[:, None, None], scores, neg)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    pp, pc = probs[..., :Sp], probs[..., Sp:]
    if pv.shape[0] == 1:
        out = jnp.einsum("bhgqk,khd->bqhgd", pp.astype(pv.dtype), pv[0],
                         preferred_element_type=jnp.float32)
    else:
        out = jnp.einsum("bhgqk,bkhd->bqhgd", pp.astype(pv.dtype), pv,
                         preferred_element_type=jnp.float32)
    out = out + jnp.einsum("bhgqk,bkhd->bqhgd", pc.astype(v_c.dtype), v_c,
                           preferred_element_type=jnp.float32)
    return out.reshape(B, Sq, H, Dh).astype(q.dtype)


def prefill_continue(
    params, cfg: LLMConfig,
    chunk_embeds: jnp.ndarray,   # [B, Sq, D] left-padded continuation chunk
    chunk_mask: jnp.ndarray,     # [B, Sq] 1/0
    prefix_k: jnp.ndarray,       # [L, Bp, Sp, Hkv, Dh] bf16, Bp in {1, B}
    prefix_v: jnp.ndarray,
    prefix_mask: jnp.ndarray,    # [Bp, Sp] 1/0
    max_len: int,
    quantize_cache: bool = True,
    tail_len: Optional[int] = None,
):
    """Prefill a continuation chunk against a precomputed bf16 PREFIX KV —
    the prefix-cache serving path (serve/generate.generate_tokens_from_prefix):
    eval/serving workloads ask several queries per video, and the spliced
    prompt [system text | 3420 video tokens | question] shares everything up
    to the question. Building the prefix KV once per video and prefilling
    only the question chunk removes ~95% of per-query prefill FLOPs at
    flagship shapes (question ≤128 of ~3.6k tokens).

    Numerics match the one-shot path exactly where it matters: chunk queries
    attend the prefix K/V in bf16 (what full prefill does — the int8 cache
    roundtrip happens only for DECODE, same as prefill(quantize_cache=True)),
    and the cache assembled here quantizes the same bf16 K/V values full
    prefill would, so the decode phase sees an identical int8 cache. The
    analogue of HF/vLLM prompt-prefix caching (reference inherits none;
    beyond-parity serving axis).

    tail_len: return a SharedPrefixCache instead (requires quantize_cache
    and Bp == 1): the prefix stays at batch dim 1 (quantized once, never
    broadcast) and only the chunk lands in a per-row tail of tail_len slots
    — the decode_step_shared cascade layout. max_len still sets the RoPE
    hint so factor selection matches the single-cache layout. The returned
    valid_mask covers the TAIL only.

    Returns (last-position logits [B, V], cache, valid_mask [B, max_len]
    (or [B, tail_len]), next_positions [B])."""
    B, Sq, _ = chunk_embeds.shape
    L, Bp, Sp, Hkv, Dh = prefix_k.shape
    pm = jnp.broadcast_to(prefix_mask.astype(bool), (B, Sp))
    cmask = chunk_mask.astype(bool)
    plen = jnp.sum(pm, axis=-1).astype(jnp.int32)                  # [B]
    positions = plen[:, None] + jnp.maximum(
        jnp.cumsum(chunk_mask, axis=-1) - 1, 0)                    # [B, Sq]
    cos, sin = llm_rope_tables(cfg, positions, seq_len_hint=max_len)

    # keep-mask [B, Sq, Sp+Sq]: prefix slots by prefix validity, chunk slots
    # causal-and-valid; sliding window compares token POSITIONS (slot index
    # and position differ by the per-row pad count on both sides)
    causal = jnp.tril(jnp.ones((Sq, Sq), bool))
    keep = jnp.concatenate(
        [jnp.broadcast_to(pm[:, None, :], (B, Sq, Sp)),
         causal[None] & cmask[:, None, :]], axis=-1)
    if cfg.sliding_window is not None:
        kpos_p = jnp.cumsum(pm.astype(jnp.int32), axis=-1) - 1     # [B, Sp]
        kpos = jnp.concatenate([kpos_p, positions], axis=-1)       # [B,Sp+Sq]
        keep = keep & (positions[:, :, None] - kpos[:, None, :]
                       < cfg.sliding_window)

    scale = cfg.head_dim ** -0.5

    def body(x, xs):
        lp, pk, pv = xs
        h = rms_norm(x, lp["input_norm_w"], cfg.rms_eps)
        q, k, v = _qkv(h, lp, cfg)
        q, k = apply_rope(q, k, cos, sin)
        attn = _rect_attention(q, pk.astype(k.dtype), pv.astype(v.dtype),
                               k, v, keep, scale).reshape(B, Sq, cfg.q_dim)
        x = x + _dense(attn, lp["o_kernel"], lp, "o")
        h = rms_norm(x, lp["post_norm_w"], cfg.rms_eps)
        x = x + _mlp(h, lp, cfg)
        return x, (k, v)

    x, (new_ks, new_vs) = jax.lax.scan(
        body, chunk_embeds, (params["layers"], prefix_k, prefix_v))

    length = jnp.full((B,), Sp + Sq, jnp.int32)
    valid = jnp.zeros((B, max_len), bool)
    valid = valid.at[:, :Sp].set(pm)
    valid = valid.at[:, Sp:Sp + Sq].set(cmask)
    x_last = rms_norm(x[:, -1:], params["final_norm_w"], cfg.rms_eps)
    logits = logits_from_hidden(params, x_last)[:, 0]
    pos_next = plen + jnp.sum(chunk_mask, axis=-1).astype(jnp.int32)

    if tail_len is not None:
        # SharedPrefixCache layout (decode_step_shared): prefix quantized
        # once at Bp=1, chunk into a per-row tail at slots [0, Sq)
        from ..ops.decode_attention_int8 import quantize_kv as qkv_fn

        if not quantize_cache or Bp != 1:
            raise NotImplementedError(
                "shared-prefix caches require quantize_cache=True and a "
                "batch-1 prefix")

        pkq, pks = quantize_kv_head_major(prefix_k, Sp)
        pvq, pvs = quantize_kv_head_major(prefix_v, Sp)
        tkq, tks = quantize_kv_head_major(new_ks, tail_len)
        tvq, tvs = quantize_kv_head_major(new_vs, tail_len)
        tail = QuantKVCache(tkq, tks, tvq, tvs,
                            jnp.full((B,), Sq, jnp.int32))
        spc = SharedPrefixCache(pkq, pks, pvq, pvs,
                                prefix_mask.astype(jnp.int32), tail)
        tail_valid = jnp.zeros((B, tail_len), bool).at[:, :Sq].set(cmask)
        return logits, spc, tail_valid, pos_next

    if quantize_cache:
        from ..ops.decode_attention_int8 import quantize_kv as qkv_fn

        def assemble(pref, chunk_kv):
            # [L,Bp,Sp,Hkv,Dh] + [L,B,Sq,Hkv,Dh] → head-major transposed
            # int8 [L,B,Hkv,Dh,max_len] + scales [L,B,Hkv,1,max_len]
            # (QuantKVCache layout, matching forward_hidden's quantized
            # collect path)
            pq, ps = qkv_fn(pref)
            cq, cs = qkv_fn(chunk_kv)
            pq = jnp.broadcast_to(pq.transpose(0, 1, 3, 4, 2),
                                  (L, B, Hkv, Dh, Sp))
            cq = cq.transpose(0, 1, 3, 4, 2)
            q8 = jnp.concatenate([pq, cq], axis=-1)
            q8 = jnp.pad(q8, ((0, 0),) * 4 + ((0, max_len - Sp - Sq),))
            ps = jnp.broadcast_to(ps.transpose(0, 1, 3, 2)[:, :, :, None, :],
                                  (L, B, Hkv, 1, Sp))
            cs = cs.transpose(0, 1, 3, 2)[:, :, :, None, :]
            sc8 = jnp.concatenate([ps, cs], axis=-1)
            sc8 = jnp.pad(sc8, ((0, 0),) * 4 + ((0, max_len - Sp - Sq),),
                          constant_values=1.0)
            return q8, sc8

        kq, ksc = assemble(prefix_k, new_ks)
        vq, vsc = assemble(prefix_v, new_vs)
        return logits, QuantKVCache(kq, ksc, vq, vsc, length), valid, pos_next

    pk_b = jnp.broadcast_to(prefix_k, (L, B, Sp, Hkv, Dh))
    pv_b = jnp.broadcast_to(prefix_v, (L, B, Sp, Hkv, Dh))
    dt = chunk_embeds.dtype
    pad = ((0, 0), (0, 0), (0, max_len - Sp - Sq), (0, 0), (0, 0))
    k_full = jnp.pad(jnp.concatenate([pk_b.astype(dt), new_ks.astype(dt)],
                                     axis=2), pad)
    v_full = jnp.pad(jnp.concatenate([pv_b.astype(dt), new_vs.astype(dt)],
                                     axis=2), pad)
    return logits, KVCache(k_full, v_full, length), valid, pos_next


def quantize_kv_head_major(kv, pad_to: int):
    """Quantize a bf16 K or V stack [L, B, S, Hkv, Dh] into the head-major
    transposed int8 layout the quantized decode caches use ([L, B, Hkv, Dh,
    pad_to] int8 + [L, B, Hkv, 1, pad_to] f32 scales), zero/one-padding the
    sequence axis to pad_to. Shared by prefill_continue's SharedPrefixCache
    assembly and the continuous pool's one-time prefix pinning."""
    from ..ops.decode_attention_int8 import quantize_kv as qkv_fn

    q8, sc = qkv_fn(kv)                      # [L,b,S,Hkv,Dh]
    q8 = q8.transpose(0, 1, 3, 4, 2)         # [L,b,Hkv,Dh,S]
    sc = sc.transpose(0, 1, 3, 2)[:, :, :, None, :]
    if pad_to > q8.shape[-1]:
        extra = pad_to - q8.shape[-1]
        q8 = jnp.pad(q8, ((0, 0),) * 4 + ((0, extra),))
        sc = jnp.pad(sc, ((0, 0),) * 4 + ((0, extra),),
                     constant_values=1.0)
    return q8, sc


class SharedPrefixCache(NamedTuple):
    """Hydragen/cascade-style decode cache for prefix-cached serving: the
    shared per-video prefix is stored ONCE (batch dim 1, int8, head-major
    transposed like QuantKVCache) and attended as a batched GEMM that
    streams it once per token for ALL rows; each row keeps only a small
    per-row tail (question chunk + generated tokens) in a standard
    QuantKVCache. Decode-attention DMA drops from B x (Sp + tail) to
    Sp + B x tail bytes per token — decode is DMA-bound (CLAUDE.md: the
    ~515 GB/s plateau), so for repeated-video serving (all batch rows on
    one video) this is a ~B-fold cut of the dominant decode stream."""
    pk: jnp.ndarray        # [L, 1, Hkv, Dh, Sp] int8
    pk_scale: jnp.ndarray  # [L, 1, Hkv, 1, Sp] f32
    pv: jnp.ndarray        # int8
    pv_scale: jnp.ndarray  # f32
    prefix_mask: jnp.ndarray  # [1, Sp] — valid prefix slots
    tail: QuantKVCache     # [L, B, Hkv, Dh, Mt]


def _dequant_hd(q8, scale, dtype):
    """[.., Hkv, Dh, S] int8 x [.., Hkv, 1, S] f32 → dtype. XLA fuses the
    convert-multiply into the consuming dot's operand stream, so the int8
    bytes are what crosses HBM."""
    return (q8.astype(jnp.float32) * scale).astype(dtype)


def _shared_prefix_attention(q, pk, pks, pv, pvs, keep_p, tk, tks, tv, tvs,
                             keep_t, k_new, v_new, scale):
    """One-token cascade attention: q [B,1,H,Dh] over [shared prefix
    (batch-1 int8) ; per-row tail (int8) ; current-token rider]. fp32
    scores/softmax (the attention fp32 island), one softmax across all
    three segments — identical math to single-cache decode attention over
    the concatenated slots."""
    B, _, H, Dh = q.shape
    Hkv = tk.shape[1]
    groups = H // Hkv
    dt = q.dtype
    qg = q.reshape(B, Hkv, groups, Dh)
    kp = _dequant_hd(pk, pks, dt)[0]                   # [Hkv, Dh, Sp]
    sp = jnp.einsum("bhgd,hds->bhgs", qg, kp,
                    preferred_element_type=jnp.float32) * scale
    kt = _dequant_hd(tk, tks, dt)                      # [B, Hkv, Dh, Mt]
    st = jnp.einsum("bhgd,bhds->bhgs", qg, kt,
                    preferred_element_type=jnp.float32) * scale
    sn = jnp.einsum("bhgd,bkhd->bhgk", qg, k_new,
                    preferred_element_type=jnp.float32) * scale  # [B,h,g,1]
    neg = jnp.finfo(jnp.float32).min
    sp = jnp.where(keep_p[:, None, None], sp, neg)
    st = jnp.where(keep_t[:, None, None], st, neg)
    probs = jax.nn.softmax(
        jnp.concatenate([sp, st, sn], axis=-1).astype(jnp.float32), axis=-1)
    Sp = sp.shape[-1]
    Mt = st.shape[-1]
    pp = probs[..., :Sp].astype(dt)
    pt = probs[..., Sp:Sp + Mt].astype(dt)
    pn = probs[..., Sp + Mt:].astype(dt)
    vp = _dequant_hd(pv, pvs, dt)[0]                   # [Hkv, Dh, Sp]
    out = jnp.einsum("bhgs,hds->bhgd", pp, vp,
                     preferred_element_type=jnp.float32)
    vt = _dequant_hd(tv, tvs, dt)
    out = out + jnp.einsum("bhgs,bhds->bhgd", pt, vt,
                           preferred_element_type=jnp.float32)
    out = out + jnp.einsum("bhgk,bkhd->bhgd", pn, v_new,
                           preferred_element_type=jnp.float32)
    return out.reshape(B, 1, H, Dh).astype(dt)


def decode_step_shared(
    params, cfg: LLMConfig, token_embeds: jnp.ndarray,  # [B, 1, D]
    cache: SharedPrefixCache,
    tail_valid: jnp.ndarray,   # [B, Mt] — attendable TAIL slots
    positions: jnp.ndarray,    # [B] position ids of the new token
    rope_hint: Optional[int] = None,  # LongRoPE factor-selection hint; pass
    #                           the equivalent single-cache max_len so the
    #                           shared and non-shared paths pick identical
    #                           factor sets (default Sp + Mt)
    active: Optional[jnp.ndarray] = None,  # [B] bool — continuous-pool
    #                           support, same semantics as decode_step:
    #                           inactive rows clamp their tail write slot
    #                           and do NOT advance tail.length / tail_valid
):
    """decode_step over a SharedPrefixCache: same contract (append the new
    token's k/v — to the TAIL — and attend over prefix+tail+rider), but the
    shared prefix streams once per token for the whole batch. Pure-XLA
    attention: the prefix segment is a plain [B*H, Dh] x [Dh, Sp] batched
    GEMM (MXU, int8 dequant fused into the operand stream) and the tail is
    too small to merit the Pallas kernel. Replaces the HF decode hot loop
    for the prefix-cached serving path (reference modeling_phi3.py:
    1554-1615); the cascade split is the Hydragen/shared-prefix scheme."""
    B = token_embeds.shape[0]
    L, _, Hkv, Dh, Sp = cache.pk.shape
    Mt = cache.tail.max_len
    pm = cache.prefix_mask.astype(bool)                        # [1, Sp]
    plen = jnp.sum(pm, axis=-1).astype(jnp.int32)              # [1]
    cos, sin = llm_rope_tables(
        cfg, positions[:, None],
        seq_len_hint=rope_hint if rope_hint is not None else Sp + Mt)
    write_idx = jnp.minimum(cache.tail.length, Mt - 1)         # [B]

    keep_p = jnp.broadcast_to(pm, (B, Sp))
    keep_t = tail_valid.astype(bool)
    if cfg.sliding_window is not None:
        # positional windowing, same rationale as decode_step
        pkpos = jnp.cumsum(pm.astype(jnp.int32), axis=-1) - 1  # [1, Sp]
        tkpos = plen[:, None] + jnp.cumsum(
            tail_valid.astype(jnp.int32), axis=-1) - 1         # [B, Mt]
        keep_p = keep_p & (positions[:, None] - pkpos
                           < cfg.sliding_window)
        keep_t = keep_t & (positions[:, None] - tkpos
                           < cfg.sliding_window)

    lay = params["layers"]
    quant_indexed = isinstance(lay["qkv_kernel"], dict)
    scale = cfg.head_dim ** -0.5

    if quant_indexed:
        from ..ops.int8_matmul import int8_matmul_layer

        use_w8a8 = "w8a8" in lay["qkv_kernel"]

        def mm(x2d, kern, li):
            return int8_matmul_layer(x2d, kern["q"], kern["scale"], li,
                                     w8a8=use_w8a8)

        def body(x, xs_i):
            norm_in, norm_post, li = xs_i
            h = rms_norm(x, norm_in, cfg.rms_eps)
            qkv = mm(h[:, 0, :], lay["qkv_kernel"], li)[:, None, :]
            q, k, v = jnp.split(qkv, [cfg.q_dim, cfg.q_dim + cfg.kv_dim],
                                axis=-1)
            q = q.reshape(B, 1, cfg.num_heads, cfg.head_dim)
            k = k.reshape(B, 1, cfg.num_kv_heads, cfg.head_dim)
            v = v.reshape(B, 1, cfg.num_kv_heads, cfg.head_dim)
            q, k = apply_rope(q, k, cos, sin)
            attn = _shared_prefix_attention(
                q, cache.pk[li], cache.pk_scale[li], cache.pv[li],
                cache.pv_scale[li], keep_p, cache.tail.k[li],
                cache.tail.k_scale[li], cache.tail.v[li],
                cache.tail.v_scale[li], keep_t, k, v, scale)
            x = x + mm(attn.reshape(B, cfg.q_dim), lay["o_kernel"],
                       li)[:, None, :]
            h = rms_norm(x, norm_post, cfg.rms_eps)
            gate_up = mm(h[:, 0, :], lay["gate_up_kernel"], li)
            gate, up = jnp.split(gate_up, 2, axis=-1)
            x = x + mm(jax.nn.silu(gate) * up, lay["down_kernel"],
                       li)[:, None, :]
            return x, (k[:, 0], v[:, 0])

        n_layers = lay["input_norm_w"].shape[0]
        xs = (lay["input_norm_w"], lay["post_norm_w"],
              jnp.arange(n_layers, dtype=jnp.int32))
        x, (new_ks, new_vs) = jax.lax.scan(body, token_embeds, xs)
    else:
        def body(x, layer_inputs):
            (lp, pk_l, pks_l, pv_l, pvs_l,
             tk_l, tks_l, tv_l, tvs_l) = layer_inputs
            h = rms_norm(x, lp["input_norm_w"], cfg.rms_eps)
            q, k, v = _qkv(h, lp, cfg)
            q, k = apply_rope(q, k, cos, sin)
            attn = _shared_prefix_attention(
                q, pk_l, pks_l, pv_l, pvs_l, keep_p,
                tk_l, tks_l, tv_l, tvs_l, keep_t, k, v, scale)
            x = x + _dense(attn.reshape(B, 1, cfg.q_dim), lp["o_kernel"],
                           lp, "o")
            h = rms_norm(x, lp["post_norm_w"], cfg.rms_eps)
            x = x + _mlp(h, lp, cfg)
            return x, (k[:, 0], v[:, 0])

        xs = (params["layers"], cache.pk, cache.pk_scale, cache.pv,
              cache.pv_scale, cache.tail.k, cache.tail.k_scale,
              cache.tail.v, cache.tail.v_scale)
        x, (new_ks, new_vs) = jax.lax.scan(body, token_embeds, xs)

    # single deferred per-row tail write (same Pallas scatter as decode_step;
    # the tail is small, so the rewritten 128-lane tile is cheap)
    from ..ops.cache_write import scatter_write_kv, scatter_write_scale
    from ..ops.decode_attention_int8 import quantize_kv as qkv_fn

    kq, ksc = qkv_fn(new_ks)
    vq, vsc = qkv_fn(new_vs)
    adv = jnp.int32(1) if active is None else active.astype(jnp.int32)
    new_tail = QuantKVCache(
        scatter_write_kv(cache.tail.k, kq, write_idx),
        scatter_write_scale(cache.tail.k_scale, ksc, write_idx),
        scatter_write_kv(cache.tail.v, vq, write_idx),
        scatter_write_scale(cache.tail.v_scale, vsc, write_idx),
        cache.tail.length + adv)
    slot = jnp.arange(Mt)[None, :] == write_idx[:, None]
    if active is not None:
        slot = slot & active[:, None]
    tail_valid = tail_valid.astype(bool) | slot
    x = rms_norm(x, params["final_norm_w"], cfg.rms_eps)
    logits = logits_from_hidden(params, x)[:, 0]
    return logits, cache._replace(tail=new_tail), tail_valid


def decode_step(
    params, cfg: LLMConfig, token_embeds: jnp.ndarray,  # [B, 1, D]
    cache, valid_mask: jnp.ndarray,  # [B, max_len] — attendable slots
    positions: jnp.ndarray,  # [B] position ids of the new token
    active: Optional[jnp.ndarray] = None,  # [B] bool — rows still generating
):
    """One decode step: append k/v at slot cache.length, attend over valid
    slots (valid_mask covers left-padding holes from the prefill). Returns
    (logits [B, V], cache, updated valid_mask). cache: KVCache (bf16) or
    QuantKVCache (int8 + scales, via the Pallas dequant-in-VMEM kernel).

    active: continuous-batching pool support (quant path) — inactive rows
    (finished or free slots) clamp their write slot to its current value and
    do NOT advance cache.length, so a done row idles in place instead of
    growing past max_len. None → all rows active (batch serving)."""
    B = token_embeds.shape[0]
    quant = isinstance(cache, QuantKVCache)
    if active is not None and not quant:
        # the bf16 cache write below is a single shared-slot
        # dynamic_update_slice (uniform lengths, batch serving); ragged
        # per-row slots (continuous batching) are only supported by the
        # quantized scatter-write path — a shared-index write would silently
        # corrupt rows at other slots
        raise NotImplementedError(
            "decode_step(active=...) (continuous batching) requires a "
            "QuantKVCache; the bf16 KVCache path writes one shared slot")
    max_len = cache.max_len if quant else cache.k.shape[2]
    cos, sin = llm_rope_tables(cfg, positions[:, None], seq_len_hint=max_len)

    write_idx = jnp.minimum(cache.length, max_len - 1)  # [B]
    if cfg.sliding_window is not None:
        # sliding window (reference modeling_phi3.py:688-718): attend only
        # the most recent `window` TOKENS. Compare token positions, not slot
        # indices: each valid slot's position is its rank among valid slots
        # (for the standard all-pads-left layout this reduces to the old
        # slot-vs-write_idx comparison, but a prefix-built cache
        # (prefill_continue) has pad holes BETWEEN prefix and chunk, where
        # slot arithmetic would over-mask prefix keys by the chunk pad
        # count).
        kpos = jnp.cumsum(valid_mask.astype(jnp.int32), axis=-1) - 1
        window_keep = positions[:, None] - kpos < cfg.sliding_window
        attn_valid = valid_mask.astype(bool) & window_keep
    else:
        attn_valid = valid_mask

    # Caches are READ-ONLY inside the scan; the current token's k/v ride as an
    # extra attention slot and are emitted as tiny scan outputs. Writing the
    # caches inside the scan would stack two full-cache copies per layer as
    # scan ys (~8 ms/token of HBM copy traffic at a 3.6k cache).
    #
    # Quantized path: the big buffers (stacked int8 weights, stacked int8
    # cache) are NOT scanned-over xs — scan xs slicing materializes a copy of
    # every layer's slice per token because the consuming pallas_call is
    # opaque to XLA's slice fusion (measured: the copies tripled cache+weight
    # traffic and dominated the 31 ms/token batch-6 step). Instead the layer
    # index rides the scan and the Pallas kernels select their layer via
    # scalar prefetch, DMA'ing straight from the stacked buffers.
    lay = params["layers"]
    quant_indexed = quant and isinstance(lay["qkv_kernel"], dict)

    if quant_indexed:
        from ..ops.decode_attention_int8 import decode_attention_int8_layer
        from ..ops.int8_matmul import int8_matmul_layer

        attn_valid_i32 = attn_valid.astype(jnp.int32)
        # W8A8 GEMVs under the int8_full opt-in (the "w8a8" treedef marker):
        # skips the per-token bf16 conversion of 3.6GB of int8 weight tiles
        use_w8a8 = "w8a8" in lay["qkv_kernel"]

        def mm(x2d, kern, li):
            return int8_matmul_layer(x2d, kern["q"], kern["scale"], li,
                                     w8a8=use_w8a8)

        def body(x, xs_i):
            norm_in, norm_post, li = xs_i
            h = rms_norm(x, norm_in, cfg.rms_eps)
            qkv = mm(h[:, 0, :], lay["qkv_kernel"], li)[:, None, :]
            q, k, v = jnp.split(qkv, [cfg.q_dim, cfg.q_dim + cfg.kv_dim],
                                axis=-1)
            q = q.reshape(B, 1, cfg.num_heads, cfg.head_dim)
            k = k.reshape(B, 1, cfg.num_kv_heads, cfg.head_dim)
            v = v.reshape(B, 1, cfg.num_kv_heads, cfg.head_dim)
            q, k = apply_rope(q, k, cos, sin)
            attn = decode_attention_int8_layer(
                q, cache.k, cache.k_scale, cache.v, cache.v_scale,
                attn_valid_i32, k, v, li, scale=cfg.head_dim ** -0.5)
            x = x + mm(attn.reshape(B, cfg.q_dim), lay["o_kernel"],
                       li)[:, None, :]
            h = rms_norm(x, norm_post, cfg.rms_eps)
            gate_up = mm(h[:, 0, :], lay["gate_up_kernel"], li)
            gate, up = jnp.split(gate_up, 2, axis=-1)
            x = x + mm(jax.nn.silu(gate) * up, lay["down_kernel"],
                       li)[:, None, :]
            return x, (k[:, 0], v[:, 0])

        n_layers = lay["input_norm_w"].shape[0]
        xs = (lay["input_norm_w"], lay["post_norm_w"],
              jnp.arange(n_layers, dtype=jnp.int32))
        x, (new_ks, new_vs) = jax.lax.scan(body, token_embeds, xs)
    else:
        def body(x, layer_inputs):
            if quant:
                lp, k_cache, k_sc, v_cache, v_sc = layer_inputs
            else:
                lp, k_cache, v_cache = layer_inputs  # [B, max_len, Hkv, Dh]
            h = rms_norm(x, lp["input_norm_w"], cfg.rms_eps)
            q, k, v = _qkv(h, lp, cfg)
            q, k = apply_rope(q, k, cos, sin)
            if quant:
                from ..ops.decode_attention_int8 import decode_attention_int8

                attn = decode_attention_int8(
                    q, k_cache, k_sc, v_cache, v_sc,
                    attn_valid.astype(jnp.int32), k, v,
                    scale=cfg.head_dim ** -0.5)
            else:
                attn = decode_attention(q, k_cache, v_cache, attn_valid,
                                        k_new=k, v_new=v)
            x = x + _dense(attn.reshape(B, 1, cfg.q_dim), lp["o_kernel"],
                           lp, "o")
            h = rms_norm(x, lp["post_norm_w"], cfg.rms_eps)
            x = x + _mlp(h, lp, cfg)
            return x, (k[:, 0], v[:, 0])

        xs = ((params["layers"], cache.k, cache.k_scale, cache.v,
               cache.v_scale)
              if quant else (params["layers"], cache.k, cache.v))
        x, (new_ks, new_vs) = jax.lax.scan(body, token_embeds, xs)

    # Single deferred write per cache, at PER-ROW slot indices.
    #
    # Quantized path: a Pallas scatter-write kernel aliases the cache buffer
    # and rewrites only the 128-lane tile containing each row's slot (~75MB
    # r+w per side, independent of max_len, per-row indices supported — the
    # continuous-batching requirement). The per-row
    # vmap(dynamic_update_slice) it replaces lowered to a full-cache select
    # (~5.3GB r+w, measured +9.0 ms/token at batch 6,
    # scripts/ablate_decode.py).
    #
    # bf16 path: lengths are uniform in batch serving (left-padded prompts),
    # so a single shared-index dynamic_update_slice stays in place on the
    # loop-carried buffer.
    if quant:
        from ..ops.decode_attention_int8 import quantize_kv as qkv_fn

        kq, ksc = qkv_fn(new_ks)   # [L,B,Hkv,D] i8, [L,B,Hkv]
        vq, vsc = qkv_fn(new_vs)
        # Pallas scatter kernels for BOTH batch and continuous serving: they
        # rewrite only the 128-lane tile containing each row's slot (~75MB
        # r+w per side). The former batch-path shared-index
        # dynamic_update_slice wrote a single lane COLUMN of the int8 cache
        # — 590KB at stride max_len, a scattered byte-granularity store
        # XLA handles poorly; per-row indices also come for free here.
        from ..ops.cache_write import scatter_write_kv, scatter_write_scale

        adv = (jnp.int32(1) if active is None
               else active.astype(jnp.int32))
        new_cache = QuantKVCache(
            scatter_write_kv(cache.k, kq, write_idx),
            scatter_write_scale(cache.k_scale, ksc, write_idx),
            scatter_write_kv(cache.v, vq, write_idx),
            scatter_write_scale(cache.v_scale, vsc, write_idx),
            cache.length + adv)
    else:
        uni_idx = write_idx[0]

        def write(cache_arr, new_val):  # [L,B,max_len,Hkv,Dh], [L,B,Hkv,Dh]
            return jax.lax.dynamic_update_slice(
                cache_arr, new_val[:, :, None].astype(cache_arr.dtype),
                (0, 0, uni_idx, 0, 0))

        new_cache = KVCache(write(cache.k, new_ks), write(cache.v, new_vs),
                            cache.length + 1)
    slot = jnp.arange(max_len)[None, :] == write_idx[:, None]
    if active is not None:
        slot = slot & active[:, None]
    valid_mask = valid_mask.astype(bool) | slot
    x = rms_norm(x, params["final_norm_w"], cfg.rms_eps)
    logits = logits_from_hidden(params, x)[:, 0]
    return logits, new_cache, valid_mask


def verify_step(
    params, cfg: LLMConfig, token_embeds: jnp.ndarray,  # [B, S, D]
    cache, valid_mask: jnp.ndarray,  # [B, max_len] — committed slots
    positions: jnp.ndarray,          # [B, S] position ids of the S tokens
):
    """Speculative-verify step: score S candidate tokens (the last committed
    token + S-1 drafts) in ONE pass over the cache. logits[:, i] is the
    model's next-token distribution after candidate i — exactly what S
    sequential decode_steps would produce, but the int8 cache (the decode
    DMA bound, ops/decode_attention_int8.py) and the int8 weight stacks
    stream ONCE for all S queries instead of once per token.

    All S candidates' k/v are written at slots cache.length..+S-1, but
    cache.length and valid_mask are NOT advanced — call commit_verify with
    the accepted count; uncommitted slots stay invisible (valid_mask) and
    are overwritten by the next verify/decode write. Matches the HF
    assisted-generation candidate-verify contract
    (reference transformers GenerationMixin; SURVEY §3.5) without cache
    rollback — rollback is free here because validity lives in the mask.

    Requires a QuantKVCache (the serving path); S ≤ 128 (one write tile)."""
    B, S = token_embeds.shape[:2]
    quant = isinstance(cache, QuantKVCache)
    if not quant:
        raise NotImplementedError(
            "verify_step requires a QuantKVCache (int8 serving path)")
    max_len = cache.max_len
    cos, sin = llm_rope_tables(cfg, positions, seq_len_hint=max_len)
    base = jnp.minimum(cache.length, max_len - S)  # [B] write base slot

    # per-query attendable committed slots (sliding window per candidate
    # position; token-position comparison via valid-slot rank, same
    # rationale as decode_step — slot arithmetic breaks on prefix-built
    # caches)
    if cfg.sliding_window is not None:
        kpos = jnp.cumsum(valid_mask.astype(jnp.int32), axis=-1) - 1
        window_keep = (positions[:, :, None] - kpos[:, None, :]
                       < cfg.sliding_window)
        attn_valid = valid_mask.astype(bool)[:, None, :] & window_keep
    else:
        attn_valid = jnp.broadcast_to(valid_mask.astype(bool)[:, None, :],
                                      (B, S, max_len))
    attn_valid_i32 = attn_valid.astype(jnp.int32)

    lay = params["layers"]
    quant_indexed = isinstance(lay["qkv_kernel"], dict)

    if quant_indexed:
        from ..ops.decode_attention_int8 import verify_attention_int8_layer
        from ..ops.int8_matmul import int8_matmul_layer

        use_w8a8 = "w8a8" in lay["qkv_kernel"]

        def mm(x2d, kern, li):
            return int8_matmul_layer(x2d, kern["q"], kern["scale"], li,
                                     w8a8=use_w8a8)

        def body(x, xs_i):
            norm_in, norm_post, li = xs_i
            h = rms_norm(x, norm_in, cfg.rms_eps)
            qkv = mm(h.reshape(B * S, -1), lay["qkv_kernel"],
                     li).reshape(B, S, -1)
            q, k, v = jnp.split(qkv, [cfg.q_dim, cfg.q_dim + cfg.kv_dim],
                                axis=-1)
            q = q.reshape(B, S, cfg.num_heads, cfg.head_dim)
            k = k.reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
            v = v.reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
            q, k = apply_rope(q, k, cos, sin)
            attn = verify_attention_int8_layer(
                q, cache.k, cache.k_scale, cache.v, cache.v_scale,
                attn_valid_i32, k, v, li, scale=cfg.head_dim ** -0.5)
            x = x + mm(attn.reshape(B * S, cfg.q_dim), lay["o_kernel"],
                       li).reshape(B, S, -1)
            h = rms_norm(x, norm_post, cfg.rms_eps)
            gate_up = mm(h.reshape(B * S, -1), lay["gate_up_kernel"], li)
            gate, up = jnp.split(gate_up, 2, axis=-1)
            x = x + mm(jax.nn.silu(gate) * up, lay["down_kernel"],
                       li).reshape(B, S, -1)
            return x, (k, v)

        n_layers = lay["input_norm_w"].shape[0]
        xs = (lay["input_norm_w"], lay["post_norm_w"],
              jnp.arange(n_layers, dtype=jnp.int32))
        x, (new_ks, new_vs) = jax.lax.scan(body, token_embeds, xs)
    else:
        from ..ops.decode_attention_int8 import verify_attention_int8

        def body(x, layer_inputs):
            lp, k_cache, k_sc, v_cache, v_sc = layer_inputs
            h = rms_norm(x, lp["input_norm_w"], cfg.rms_eps)
            q, k, v = _qkv(h, lp, cfg)
            q, k = apply_rope(q, k, cos, sin)
            attn = verify_attention_int8(
                q, k_cache, k_sc, v_cache, v_sc, attn_valid_i32, k, v,
                scale=cfg.head_dim ** -0.5)
            x = x + _dense(attn.reshape(B, S, cfg.q_dim), lp["o_kernel"],
                           lp, "o")
            h = rms_norm(x, lp["post_norm_w"], cfg.rms_eps)
            x = x + _mlp(h, lp, cfg)
            return x, (k, v)

        xs = (params["layers"], cache.k, cache.k_scale, cache.v,
              cache.v_scale)
        x, (new_ks, new_vs) = jax.lax.scan(body, token_embeds, xs)

    # Write ALL S candidate slots (one multi-slot Pallas scatter per side);
    # length/valid_mask stay put — commit_verify decides how many count.
    from ..ops.cache_write import (scatter_write_kv_multi,
                                   scatter_write_scale_multi)
    from ..ops.decode_attention_int8 import quantize_kv as qkv_fn

    kq, ksc = qkv_fn(new_ks)   # [Lyr,B,S,Hkv,D] i8, [Lyr,B,S,Hkv]
    vq, vsc = qkv_fn(new_vs)
    new_cache = QuantKVCache(
        scatter_write_kv_multi(cache.k, kq, base),
        scatter_write_scale_multi(cache.k_scale, ksc, base),
        scatter_write_kv_multi(cache.v, vq, base),
        scatter_write_scale_multi(cache.v_scale, vsc, base),
        cache.length)
    x = rms_norm(x, params["final_norm_w"], cfg.rms_eps)
    logits = logits_from_hidden(params, x)     # [B, S, V]
    return logits, new_cache


def verify_step_shared(
    params, cfg: LLMConfig, token_embeds: jnp.ndarray,  # [B, S, D]
    cache: SharedPrefixCache,
    tail_valid: jnp.ndarray,   # [B, Mt] — committed TAIL slots
    positions: jnp.ndarray,    # [B, S]
    rope_hint: Optional[int] = None,
):
    """verify_step over a SharedPrefixCache: score S candidates in one pass
    where the shared prefix streams ONCE for the whole batch — compounding
    the two decode DMA levers (speculative verify amortizes the stream
    across S tokens; the cascade split amortizes it across B rows).
    Candidates' k/v land at tail slots tail.length..+S-1; lengths and
    tail_valid are NOT advanced — call commit_verify on the TAIL with the
    accepted count. Pure-XLA cascade attention like decode_step_shared,
    plus a causal intra-candidate block."""
    B, S = token_embeds.shape[:2]
    L, _, Hkv, Dh, Sp = cache.pk.shape
    Mt = cache.tail.max_len
    pm = cache.prefix_mask.astype(bool)                        # [1, Sp]
    plen = jnp.sum(pm, axis=-1).astype(jnp.int32)              # [1]
    cos, sin = llm_rope_tables(
        cfg, positions,
        seq_len_hint=rope_hint if rope_hint is not None else Sp + Mt)
    base = jnp.minimum(cache.tail.length, Mt - S)              # [B]

    keep_p = jnp.broadcast_to(pm[:, None, :], (B, S, Sp))
    keep_t = jnp.broadcast_to(tail_valid.astype(bool)[:, None, :],
                              (B, S, Mt))
    if cfg.sliding_window is not None:
        pkpos = jnp.cumsum(pm.astype(jnp.int32), axis=-1) - 1  # [1, Sp]
        tkpos = plen[:, None] + jnp.cumsum(
            tail_valid.astype(jnp.int32), axis=-1) - 1         # [B, Mt]
        keep_p = keep_p & (positions[:, :, None] - pkpos[:, None, :]
                           < cfg.sliding_window)
        keep_t = keep_t & (positions[:, :, None] - tkpos[:, None, :]
                           < cfg.sliding_window)
    causal = jnp.tril(jnp.ones((S, S), bool))[None]            # [1, S, S]
    scale = cfg.head_dim ** -0.5
    groups = cfg.num_heads // cfg.num_kv_heads
    neg = jnp.finfo(jnp.float32).min

    lay = params["layers"]
    quant_indexed = isinstance(lay["qkv_kernel"], dict)

    def cascade(q, k_c, v_c, pk_l, pks_l, pv_l, pvs_l, tk_l, tks_l, tv_l,
                tvs_l):
        dt = q.dtype
        qg = q.reshape(B, S, Hkv, groups, Dh)
        kp = _dequant_hd(pk_l, pks_l, dt)[0]
        sp = jnp.einsum("bqhgd,hds->bhgqs", qg, kp,
                        preferred_element_type=jnp.float32) * scale
        kt = _dequant_hd(tk_l, tks_l, dt)
        st = jnp.einsum("bqhgd,bhds->bhgqs", qg, kt,
                        preferred_element_type=jnp.float32) * scale
        sc = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k_c,
                        preferred_element_type=jnp.float32) * scale
        sp = jnp.where(keep_p[:, None, None], sp, neg)
        st = jnp.where(keep_t[:, None, None], st, neg)
        sc = jnp.where(causal[:, None, None], sc, neg)
        probs = jax.nn.softmax(
            jnp.concatenate([sp, st, sc], axis=-1).astype(jnp.float32),
            axis=-1)
        pp = probs[..., :Sp].astype(dt)
        pt = probs[..., Sp:Sp + Mt].astype(dt)
        pc = probs[..., Sp + Mt:].astype(dt)
        vp = _dequant_hd(pv_l, pvs_l, dt)[0]
        out = jnp.einsum("bhgqs,hds->bqhgd", pp, vp,
                         preferred_element_type=jnp.float32)
        vt = _dequant_hd(tv_l, tvs_l, dt)
        out = out + jnp.einsum("bhgqs,bhds->bqhgd", pt, vt,
                               preferred_element_type=jnp.float32)
        out = out + jnp.einsum("bhgqk,bkhd->bqhgd", pc, v_c,
                               preferred_element_type=jnp.float32)
        return out.reshape(B, S, cfg.num_heads, Dh).astype(dt)

    if quant_indexed:
        from ..ops.int8_matmul import int8_matmul_layer

        use_w8a8 = "w8a8" in lay["qkv_kernel"]

        def mm(x2d, kern, li):
            return int8_matmul_layer(x2d, kern["q"], kern["scale"], li,
                                     w8a8=use_w8a8)

        def body(x, xs_i):
            norm_in, norm_post, li = xs_i
            h = rms_norm(x, norm_in, cfg.rms_eps)
            qkv = mm(h.reshape(B * S, -1), lay["qkv_kernel"],
                     li).reshape(B, S, -1)
            q, k, v = jnp.split(qkv, [cfg.q_dim, cfg.q_dim + cfg.kv_dim],
                                axis=-1)
            q = q.reshape(B, S, cfg.num_heads, cfg.head_dim)
            k = k.reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
            v = v.reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
            q, k = apply_rope(q, k, cos, sin)
            attn = cascade(q, k, v, cache.pk[li], cache.pk_scale[li],
                           cache.pv[li], cache.pv_scale[li],
                           cache.tail.k[li], cache.tail.k_scale[li],
                           cache.tail.v[li], cache.tail.v_scale[li])
            x = x + mm(attn.reshape(B * S, cfg.q_dim), lay["o_kernel"],
                       li).reshape(B, S, -1)
            h = rms_norm(x, norm_post, cfg.rms_eps)
            gate_up = mm(h.reshape(B * S, -1), lay["gate_up_kernel"], li)
            gate, up = jnp.split(gate_up, 2, axis=-1)
            x = x + mm(jax.nn.silu(gate) * up, lay["down_kernel"],
                       li).reshape(B, S, -1)
            return x, (k, v)

        n_layers = lay["input_norm_w"].shape[0]
        xs = (lay["input_norm_w"], lay["post_norm_w"],
              jnp.arange(n_layers, dtype=jnp.int32))
        x, (new_ks, new_vs) = jax.lax.scan(body, token_embeds, xs)
    else:
        def body(x, layer_inputs):
            (lp, pk_l, pks_l, pv_l, pvs_l,
             tk_l, tks_l, tv_l, tvs_l) = layer_inputs
            h = rms_norm(x, lp["input_norm_w"], cfg.rms_eps)
            q, k, v = _qkv(h, lp, cfg)
            q, k = apply_rope(q, k, cos, sin)
            attn = cascade(q, k, v, pk_l, pks_l, pv_l, pvs_l,
                           tk_l, tks_l, tv_l, tvs_l)
            x = x + _dense(attn.reshape(B, S, cfg.q_dim), lp["o_kernel"],
                           lp, "o")
            h = rms_norm(x, lp["post_norm_w"], cfg.rms_eps)
            x = x + _mlp(h, lp, cfg)
            return x, (k, v)

        xs = (params["layers"], cache.pk, cache.pk_scale, cache.pv,
              cache.pv_scale, cache.tail.k, cache.tail.k_scale,
              cache.tail.v, cache.tail.v_scale)
        x, (new_ks, new_vs) = jax.lax.scan(body, token_embeds, xs)

    from ..ops.cache_write import (scatter_write_kv_multi,
                                   scatter_write_scale_multi)
    from ..ops.decode_attention_int8 import quantize_kv as qkv_fn

    kq, ksc = qkv_fn(new_ks)   # [L,B,S,Hkv,D] i8, [L,B,S,Hkv]
    vq, vsc = qkv_fn(new_vs)
    new_tail = QuantKVCache(
        scatter_write_kv_multi(cache.tail.k, kq, base),
        scatter_write_scale_multi(cache.tail.k_scale, ksc, base),
        scatter_write_kv_multi(cache.tail.v, vq, base),
        scatter_write_scale_multi(cache.tail.v_scale, vsc, base),
        cache.tail.length)
    x = rms_norm(x, params["final_norm_w"], cfg.rms_eps)
    logits = logits_from_hidden(params, x)     # [B, S, V]
    return logits, cache._replace(tail=new_tail)


def commit_verify(cache, valid_mask: jnp.ndarray, n_accept: jnp.ndarray,
                  draft_len: int):
    """Commit the first n_accept[b] of the draft_len candidate slots written
    by verify_step: advance cache.length and reveal the slots in valid_mask.
    Rejected slots stay invalid and are rewritten by the next verify_step."""
    max_len = cache.max_len
    base = jnp.minimum(cache.length, max_len - draft_len)
    slots = jnp.arange(max_len)[None, :]
    newly = ((slots >= base[:, None])
             & (slots < (base + n_accept)[:, None]))
    return (cache._replace(length=cache.length + n_accept.astype(jnp.int32)),
            valid_mask.astype(bool) | newly)
