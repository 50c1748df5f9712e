"""Collation: dataset samples → device-ready vlm.Batch.

Tokenization + label masking + right-pad/truncate (reference
llava_next_video.py:428-452 semantics via text/tokenizer.py), pixel stacking,
and the text-only flag (video_ids == 'text', reference :583-586). Sequence
lengths are bucketed (pad_to) so jit sees a small set of static shapes."""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..models.vlm import Batch
from ..text.templates import ChatTemplate
from ..text.tokenizer import (make_labels, pad_batch_train,
                              tokenize_with_image)


def collate(
    samples: List[Dict],
    tokenizer,
    template: ChatTemplate,
    max_txt_len: int = 2048,
    pad_to: Optional[int] = 64,
) -> Batch:
    seq_ids, seq_labels = [], []
    for s in samples:
        ids = tokenize_with_image(s["text_inputs"], tokenizer)
        labels = make_labels(ids, s["text_inputs"], tokenizer, template)
        seq_ids.append(ids)
        seq_labels.append(labels)
    input_ids, labels, mask = pad_batch_train(
        seq_ids, seq_labels, tokenizer.pad_token_id, tokenizer.eos_token_id,
        max_txt_len, pad_to=pad_to)
    temporal = np.stack([s["temporal_pixel_values"] for s in samples])
    spatial = np.stack([s["spatial_pixel_values"] for s in samples])
    is_text = np.asarray([s["video_ids"] == "text" for s in samples])
    return Batch(input_ids=input_ids, labels=labels, attn_mask=mask,
                 spatial_pixels=spatial, temporal_pixels=temporal,
                 is_text=is_text)
