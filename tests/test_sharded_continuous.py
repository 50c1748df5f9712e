"""Multi-chip continuous batching: ContinuousServer over FSDP/TP-sharded
params on the 8-device CPU mesh must produce the same tokens as the
single-device server (and hence the lockstep reference — the serving path
for Llama-3-8B class models that exceed one chip's HBM). Complements
tests/test_sharded_inference.py, which covers the lockstep engine."""

import jax
import numpy as np
import pytest

from grounded_video_llm_tpu.core.config import micro_vlm_config
from grounded_video_llm_tpu.models import vlm
from grounded_video_llm_tpu.parallel.mesh import build_mesh
from grounded_video_llm_tpu.parallel.partitioning import shard_params
from grounded_video_llm_tpu.serve.continuous import ContinuousServer, Request
from grounded_video_llm_tpu.text.templates import IMAGE_TOKEN_INDEX

EOS, PAD = 2, 0


@pytest.fixture(scope="module")
def micro_model():
    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)
    return cfg, params


def _make_requests(cfg, n, S=10):
    rng = np.random.default_rng(7)
    reqs = []
    for i in range(n):
        ids = rng.integers(3, 50, size=(S,)).astype(np.int32)
        ids[2] = IMAGE_TOKEN_INDEX
        reqs.append(Request(
            input_ids=ids,
            attn_mask=np.ones((S,), np.int32),
            spatial_pixels=rng.normal(size=(cfg.num_segs, 336, 336, 3)
                                      ).astype(np.float32) * 0.1,
            temporal_pixels=rng.normal(size=(cfg.num_frames, 224, 224, 3)
                                       ).astype(np.float32) * 0.1,
        ))
    return reqs


def _serve(params, cfg, reqs, max_new, **kw):
    server = ContinuousServer(params, cfg, pool_size=2, prompt_len=10,
                              max_new_tokens=max_new, chunk=2,
                              temperature=0.0, do_sample=False,
                              eos_token_id=EOS, pad_token_id=PAD, **kw)
    return server.serve(reqs)


def test_sharded_continuous_matches_single_device(micro_model):
    """Admission prefill + chunked decode + scatter cache writes under
    fsdp=4 x tensor=2 shardings == unsharded pool outputs."""
    assert len(jax.devices()) == 8
    cfg, params = micro_model
    reqs = _make_requests(cfg, 3)
    ref = _serve(params, cfg, reqs, max_new=5)

    mesh = build_mesh(data=1, fsdp=4, tensor=2)
    sharded = shard_params(params, mesh)
    assert not (sharded["llm"]["layers"]["qkv_kernel"]
                .sharding.is_fully_replicated)
    got = _serve(sharded, cfg, reqs, max_new=5)
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(a, b), i


def test_sharded_continuous_spec_matches_single_device(micro_model):
    """Speculative continuous batching (verify_step, multi-slot commits,
    in-jit n-gram drafting over the pool) stays bit-exact under the same
    multi-chip shardings."""
    assert len(jax.devices()) == 8
    cfg, params = micro_model
    reqs = _make_requests(cfg, 3)
    ref = _serve(params, cfg, reqs, max_new=4, spec_draft_len=2)

    mesh = build_mesh(data=1, fsdp=4, tensor=2)
    sharded = shard_params(params, mesh)
    got = _serve(sharded, cfg, reqs, max_new=4, spec_draft_len=2)
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(a, b), i
