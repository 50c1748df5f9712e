"""Per-group AdamW with warmup-cosine schedules and stage-based freezing.

Mirrors reference training/fsdp.py:184-256: param groups selected by name
(multi_modal_projector / video_projecter / lm_head+embed / lora), each with its
own peak LR (stage matrix SURVEY §2.4), AdamW weight_decay=0, warmup ratio
0.03, cosine decay, LRs ramping from 0 (reference zeroes the LRs after
construction so the scheduler starts at 0, fsdp.py:253-254). Global grad-norm
clipping at 1.0 happens across *all* trainable params jointly (the FSDP
clip_grad_norm_ equivalent, reference fsdp.py:278-280). Freezing
(reference llava_next_video.py:155-210) is optax.set_to_zero on the 'frozen'
group — no torch requires_grad needed.
"""

from __future__ import annotations

import jax
import optax

from ..core.config import StageConfig


def label_params(params) -> dict:
    """Label tree: path → group name."""

    def label_for(path_str: str) -> str:
        if "video_projector" in path_str:
            return "video_projector"
        if "mm_projector" in path_str:
            return "mm_projector"
        if "/lora/" in path_str and path_str.endswith(("/a", "/b")):
            return "lora"
        if path_str.startswith("llm/") and (
                "lm_head" in path_str or "embed" in path_str):
            return "llm"
        return "frozen"

    def _path_str(path):
        parts = []
        for p in path:
            parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
        return "/".join(parts)

    return jax.tree_util.tree_map_with_path(
        lambda path, _: label_for(_path_str(path)), params)


def make_optimizer(stage: StageConfig, total_steps: int, params):
    """→ (optax.GradientTransformation, labels tree)."""
    warmup = max(int(total_steps * stage.warmup_ratio), 1)

    def sched(peak: float):
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=peak, warmup_steps=warmup,
            decay_steps=max(total_steps, warmup + 1), end_value=0.0)

    def adamw(peak: float):
        if peak <= 0.0:
            return optax.set_to_zero()
        return optax.adamw(sched(peak), b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=stage.weight_decay)

    groups = {
        "video_projector": adamw(stage.lr_video_projector),
        "mm_projector": adamw(stage.lr_mm_projector),
        "llm": adamw(stage.lr_llm),
        "lora": adamw(stage.lr_lora),
        "frozen": optax.set_to_zero(),
    }
    labels = label_params(params)
    tx = optax.chain(
        optax.clip_by_global_norm(stage.grad_clip),
        optax.multi_transform(groups, labels),
    )
    return tx, labels


def trainable_mask(labels) -> object:
    """Boolean tree: True where the param belongs to a trainable group."""
    return jax.tree_util.tree_map(lambda l: l != "frozen", labels)
