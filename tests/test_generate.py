"""Generation engine tests: sampling, decode loop, end-to-end engine on the
demo video with the micro model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grounded_video_llm_tpu.core.config import (GenerateConfig,
                                                micro_vlm_config)
from grounded_video_llm_tpu.models import vlm
from grounded_video_llm_tpu.serve.engine import InferenceEngine
from grounded_video_llm_tpu.serve.generate import (generate_tokens,
                                                   sample_logits)
from grounded_video_llm_tpu.text.templates import IMAGE_TOKEN_INDEX
from grounded_video_llm_tpu.text.tokenizer import build_test_tokenizer


def test_sample_greedy():
    logits = jnp.asarray([[0.0, 5.0, 1.0]])
    out = sample_logits(logits, jax.random.key(0), 1.0, None, do_sample=False)
    assert out.tolist() == [1]


def test_sample_top_p_filters_tail():
    logits = jnp.log(jnp.asarray([[0.6, 0.3, 0.05, 0.05]]))
    counts = set()
    for i in range(40):
        t = sample_logits(logits, jax.random.key(i), 1.0, 0.7, do_sample=True)
        counts.add(int(t[0]))
    assert counts <= {0, 1}  # tail tokens filtered


def test_sample_temperature_zero_is_greedy():
    logits = jnp.asarray([[0.0, 1.0, 3.0]])
    out = sample_logits(logits, jax.random.key(0), 0.0, None, do_sample=True)
    assert out.tolist() == [2]


@pytest.fixture(scope="module")
def micro_model():
    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)
    tok = build_test_tokenizer("phi3.5")
    return cfg, params, tok


def test_generate_tokens_shapes_and_determinism(micro_model):
    cfg, params, tok = micro_model
    B, S = 1, 10
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 50, size=(B, S)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    mask = np.ones((B, S), np.int32)
    spatial = np.zeros((B, cfg.num_segs, 336, 336, 3), np.float32)
    temporal = np.zeros((B, cfg.num_frames, 224, 224, 3), np.float32)

    kwargs = dict(max_new_tokens=4, temperature=0.2, do_sample=True,
                  eos_token_id=tok.eos_token_id, pad_token_id=tok.pad_token_id)
    t1, l1 = generate_tokens(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                             jnp.asarray(spatial), jnp.asarray(temporal),
                             jax.random.key(7), **kwargs)
    t2, l2 = generate_tokens(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                             jnp.asarray(spatial), jnp.asarray(temporal),
                             jax.random.key(7), **kwargs)
    assert t1.shape == (B, 4)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert int(l1[0]) <= 4


def test_engine_end_to_end_demo_video(micro_model, demo_video):
    cfg, params, tok = micro_model
    engine = InferenceEngine(params, cfg, tok,
                             GenerateConfig(max_new_tokens=3, do_sample=False))
    res = engine.run(demo_video, "What is happening in this video?", mode="qa")
    assert isinstance(res.text, str)
    assert res.duration > 0
    # grounding mode builds the control-token prompt
    p = engine.build_prompt("When does X happen?", "grounding", res.duration)
    assert "<timestamp_grounding>" in p
    assert p.endswith("<|assistant|>\n")
    # referring mode quantizes "N seconds"
    p = engine.build_prompt("What happens at 5 seconds?", "referring", 10.0)
    assert "<150>" in p
