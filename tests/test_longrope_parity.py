"""LongRoPE parity at FULL regime vs the reference's own torch module.

Round-1 parity ran tiny dims only; this executes the reference's
Phi3LongRoPEScaledRotaryEmbedding (modeling_phi3.py:371-409) at the real
Phi-3.5-mini head_dim (96) with the real vendored factor tables, across the
4096 short/long boundary and out to the grounded serving length (~7.6k),
and checks our fp32 cos/sin tables match.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from grounded_video_llm_tpu.core.config import phi35_mini_config
from grounded_video_llm_tpu.ops.rope import llm_rope_tables


def _reference_tables(cfg, positions, seq_len):
    """The reference's formula (modeling_phi3.py:380-409), executed in torch
    fp32 with the config's factor tables."""
    factors = (cfg.rope_scaling_long
               if seq_len > cfg.original_max_position_embeddings
               else cfg.rope_scaling_short)
    ext = torch.tensor(factors, dtype=torch.float32)
    inv_freq_shape = torch.arange(0, cfg.head_dim, 2,
                                  dtype=torch.int64).float() / cfg.head_dim
    inv_freq = 1.0 / (ext * torch.tensor(cfg.rope_theta) ** inv_freq_shape)
    pos = torch.tensor(positions, dtype=torch.float32)
    freqs = pos[..., None] * inv_freq            # [B, S, dim/2]
    emb = torch.cat((freqs, freqs), dim=-1)
    scale = cfg.max_position_embeddings / cfg.original_max_position_embeddings
    scaling = (1.0 if scale <= 1.0 else
               math.sqrt(1 + math.log(scale)
                         / math.log(cfg.original_max_position_embeddings)))
    return (emb.cos() * scaling).numpy(), (emb.sin() * scaling).numpy()


@pytest.mark.parametrize("seq_len", [512, 4096, 4097, 7680])
def test_longrope_tables_match_reference(seq_len):
    cfg = phi35_mini_config()
    assert cfg.rope_scaling_short and cfg.rope_scaling_long
    # sample positions across the range incl. the extremes
    positions = np.unique(np.concatenate([
        np.linspace(0, seq_len - 1, 64).astype(np.int64),
        [0, 1, seq_len - 1]]))[None, :]
    cos, sin = llm_rope_tables(cfg, positions, seq_len_hint=seq_len)
    ref_cos, ref_sin = _reference_tables(cfg, positions, seq_len)
    # our inv_freq rounds ONCE from float64 — strictly tighter than the
    # reference's fp32 divide chain. The angle divergence (ref's fp32
    # rounding x position) reaches ~6e-4 in cos at position 7679; the
    # tolerance bounds that known reference-side error.
    np.testing.assert_allclose(np.asarray(cos), ref_cos, rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sin), ref_sin, rtol=0, atol=1e-3)


def test_short_long_switch_at_boundary():
    """Factor set flips exactly past original_max_position_embeddings, and
    the two regimes genuinely differ (the tables are distinct)."""
    cfg = phi35_mini_config()
    pos = np.arange(16)[None, :]
    cos_short, _ = llm_rope_tables(cfg, pos, seq_len_hint=4096)
    cos_long, _ = llm_rope_tables(cfg, pos, seq_len_hint=4097)
    # same positions, different factor tables → different angles at the
    # scaled dims
    assert not np.allclose(np.asarray(cos_short), np.asarray(cos_long),
                           atol=1e-5)
    ref_s, _ = _reference_tables(cfg, pos, 4096)
    ref_l, _ = _reference_tables(cfg, pos, 4097)
    np.testing.assert_allclose(np.asarray(cos_short), ref_s, rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(cos_long), ref_l, rtol=0, atol=1e-3)
