"""Int8 serving accuracy bar: bf16-vs-quantized A/B through the FULL pipeline.

Every headline serving number was produced under int8 weights + int8 KV +
W8A8 encoders; its accuracy-neutrality evidence was previously cosine>0.995
on random per-module outputs only. This module pre-wires the pass/fail bar
for the day real checkpoints land (the reference's published metric rows,
/root/reference/README.md:31-34, are the ultimate gate — eval.py runs them):

- per-position logit KL(bf16 || quant) over the real pipeline
  (pixels -> encoders -> projector -> splice -> LLM logits), valid
  positions only
- per-position greedy top-1 agreement over those logits
- greedy DECODE token agreement through the serving path
  (serve.generate.generate_tokens, do_sample=False), exact-match and
  prefix-agreement rates

Thresholds (DEFAULT_*) are committed here and enforced by
`eval.py --quantize_ab`; they were calibrated on the micro model
(tests/test_quant_ab.py measures KL ~1e-3 nats and 100% agreement at tiny
dims) with a wide margin for real-scale depth/vocab. Override per-run with
--ab_max_kl / --ab_min_top1 / --ab_min_greedy if real weights need a
recalibrated bar — the point is that a bar EXISTS and fails loudly.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import VLMConfig
from ..models import llm as llm_mod
from ..models import vlm
from .generate import generate_tokens

# Committed pass/fail bar for `eval.py --quantize_ab` (see module docstring).
DEFAULT_MAX_KL = 0.05          # mean nats/position, bf16 || quant
DEFAULT_MIN_TOP1 = 0.98        # per-position greedy agreement on prompt logits
DEFAULT_MIN_GREEDY = 0.90      # mean greedy-decode prefix agreement


@functools.partial(jax.jit, static_argnames=("cfg",))
def pipeline_logits(params, cfg: VLMConfig, input_ids, attn_mask,
                    spatial_pixels, temporal_pixels):
    """Full-pipeline per-position logits [B, S_full, V] (fp32) + spliced
    validity mask [B, S_full]. Runs the same encode/splice stack the serving
    path uses, then the dense forward for all-position logits."""
    feats = vlm.encode_video(params, cfg, spatial_pixels, temporal_pixels)
    embeds, _, mask = vlm.splice_multimodal(
        input_ids, None, attn_mask, feats, params["llm"]["embed"])
    logits = llm_mod.forward_logits(params["llm"], cfg.llm, embeds, mask)
    return logits.astype(jnp.float32), mask


def _valid_positions(mask: np.ndarray) -> np.ndarray:
    return mask.astype(bool)


def compare_logits(logits_a: np.ndarray, logits_b: np.ndarray,
                   mask: np.ndarray) -> Dict[str, float]:
    """KL(a || b) in nats and top-1 agreement over valid positions (host,
    fp64 log-softmax for numerical headroom)."""
    valid = _valid_positions(mask)
    a = logits_a[valid].astype(np.float64)
    b = logits_b[valid].astype(np.float64)
    a = a - a.max(-1, keepdims=True)
    b = b - b.max(-1, keepdims=True)
    logp_a = a - np.log(np.exp(a).sum(-1, keepdims=True))
    logp_b = b - np.log(np.exp(b).sum(-1, keepdims=True))
    kl = float((np.exp(logp_a) * (logp_a - logp_b)).sum(-1).mean())
    top1 = float((logp_a.argmax(-1) == logp_b.argmax(-1)).mean())
    return {"mean_kl_nats": kl, "top1_agreement": top1}


def compare_greedy(tokens_a: np.ndarray, lengths_a: np.ndarray,
                   tokens_b: np.ndarray, lengths_b: np.ndarray
                   ) -> Dict[str, float]:
    """Greedy-decode agreement: exact-sequence match rate and mean prefix
    agreement (matched tokens before first divergence / bf16 length)."""
    B = tokens_a.shape[0]
    exact = 0
    prefix_fracs = []
    for i in range(B):
        la = int(lengths_a[i])
        lb = int(lengths_b[i])
        a, b = tokens_a[i, :la], tokens_b[i, :lb]
        if la == lb and np.array_equal(a, b):
            exact += 1
        n = min(la, lb)
        same = a[:n] == b[:n]
        div = int(np.argmin(same)) if not same.all() else n
        prefix_fracs.append(div / max(la, 1))
    return {"greedy_exact_rate": exact / max(B, 1),
            "greedy_prefix_agreement": float(np.mean(prefix_fracs))}


def prepare_ab_inputs(engine, items, video_root: str = "",
                      mode: str = "grounding"):
    """Eval annotations → identical pipeline inputs for both legs, via the
    SAME engine helpers the benchmark run uses (prompt template, dual-stream
    preprocess, left-pad batching)."""
    import os

    from ..text.tokenizer import pad_batch_generate, tokenize_with_image

    prompts, temporal, spatial = [], [], []
    for it in items:
        path = os.path.join(video_root, it["video"]) if video_root \
            else it["video"]
        t, s, duration = engine.preprocess_video(path)
        q = it.get("query") or it.get("question") or ""
        prompts.append(engine.build_prompt(q, mode, duration))
        temporal.append(t)
        spatial.append(s)
    seqs = [tokenize_with_image(p, engine.tokenizer) for p in prompts]
    ids, mask = pad_batch_generate(seqs, engine.tokenizer.pad_token_id,
                                   engine.cfg.max_txt_len)
    return (np.asarray(ids), np.asarray(mask),
            np.stack(spatial), np.stack(temporal))


def run_quant_ab(params_bf16, params_quant, cfg: VLMConfig,
                 input_ids, attn_mask, spatial_pixels, temporal_pixels,
                 *, max_new_tokens: int = 32, eos_token_id: int = -1,
                 pad_token_id: int = 0,
                 quantize_cache_quant: bool = True,
                 max_kl: float = DEFAULT_MAX_KL,
                 min_top1: float = DEFAULT_MIN_TOP1,
                 min_greedy: float = DEFAULT_MIN_GREEDY,
                 free_bf16: Optional[callable] = None) -> Dict[str, object]:
    """The A/B: identical pipeline inputs through both trees; returns the
    metric dict with a 'pass' verdict against the committed thresholds.

    Memory protocol for flagships: the bf16 leg runs FIRST and all its
    outputs are fetched to host; pass `free_bf16` to drop the bf16 tree
    before the quant leg runs, and pass a zero-arg CALLABLE as params_quant
    to defer building the quantized tree until after that free (llama3-8B
    bf16 alone is 16.1GB — for that family the bf16 anchor cannot fit one
    v5e at all and the A/B must run on a smaller family or multi-chip)."""
    ids = jnp.asarray(input_ids)
    am = jnp.asarray(attn_mask)
    sp = jnp.asarray(spatial_pixels)
    tp = jnp.asarray(temporal_pixels)
    rng = jax.random.key(0)
    gen_kw = dict(max_new_tokens=max_new_tokens, do_sample=False,
                  temperature=0.0, eos_token_id=eos_token_id,
                  pad_token_id=pad_token_id)

    logits_a, mask = pipeline_logits(params_bf16, cfg, ids, am, sp, tp)
    toks_a, len_a = generate_tokens(params_bf16, cfg, ids, am, sp, tp, rng,
                                    quantize_cache=False, **gen_kw)
    logits_a = np.asarray(logits_a)
    mask = np.asarray(mask)
    toks_a, len_a = np.asarray(toks_a), np.asarray(len_a)
    params_bf16 = None  # drop the last live reference before free_bf16's gc
    if free_bf16 is not None:
        free_bf16()
    if callable(params_quant):
        params_quant = params_quant()

    logits_b, _ = pipeline_logits(params_quant, cfg, ids, am, sp, tp)
    toks_b, len_b = generate_tokens(params_quant, cfg, ids, am, sp, tp, rng,
                                    quantize_cache=quantize_cache_quant,
                                    **gen_kw)
    logits_b = np.asarray(logits_b)
    toks_b, len_b = np.asarray(toks_b), np.asarray(len_b)

    metrics: Dict[str, object] = {}
    metrics.update(compare_logits(logits_a, logits_b, mask))
    metrics.update(compare_greedy(toks_a, len_a, toks_b, len_b))
    metrics["thresholds"] = {"max_kl": max_kl, "min_top1": min_top1,
                             "min_greedy": min_greedy}
    metrics["pass"] = bool(
        metrics["mean_kl_nats"] <= max_kl
        and metrics["top1_agreement"] >= min_top1
        and metrics["greedy_prefix_agreement"] >= min_greedy)
    return metrics
