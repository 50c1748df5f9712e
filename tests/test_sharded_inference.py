"""Multi-chip serving: generate over FSDP/TP-sharded params on the 8-device
CPU mesh must produce the same tokens as single-device execution (the
deployment path for Llama-3-8B, which exceeds one v5e chip's HBM)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grounded_video_llm_tpu.core.config import micro_vlm_config
from grounded_video_llm_tpu.models import vlm
from grounded_video_llm_tpu.parallel.mesh import build_mesh
from grounded_video_llm_tpu.parallel.partitioning import shard_params
from grounded_video_llm_tpu.serve.generate import generate_tokens
from grounded_video_llm_tpu.text.templates import IMAGE_TOKEN_INDEX


@pytest.mark.parametrize("mesh_shape", [(1, 4, 2), (1, 8, 1)])
def test_sharded_generate_matches_single_device(mesh_shape):
    assert len(jax.devices()) == 8
    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)

    B, S = 1, 10
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 50, size=(B, S)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    mask = np.ones((B, S), np.int32)
    spatial = np.zeros((B, cfg.num_segs, 336, 336, 3), np.float32)
    temporal = np.zeros((B, cfg.num_frames, 224, 224, 3), np.float32)
    kwargs = dict(max_new_tokens=3, do_sample=False, temperature=0.0,
                  eos_token_id=-2, pad_token_id=0)

    ref, _ = generate_tokens(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                             jnp.asarray(spatial), jnp.asarray(temporal),
                             jax.random.key(0), **kwargs)

    data, fsdp, tensor = mesh_shape
    mesh = build_mesh(data=data, fsdp=fsdp, tensor=tensor)
    sharded = shard_params(params, mesh)
    # qkv kernel [L, 64, 192] divides on every tested mesh; the vocab dim of
    # the micro embed (814) doesn't divide 8 and correctly falls back
    qkv_sharding = sharded["llm"]["layers"]["qkv_kernel"].sharding
    assert not qkv_sharding.is_fully_replicated

    out, _ = generate_tokens(sharded, cfg, jnp.asarray(ids), jnp.asarray(mask),
                             jnp.asarray(spatial), jnp.asarray(temporal),
                             jax.random.key(0), **kwargs)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


@pytest.mark.parametrize("shared", [False, True])
def test_sharded_prefix_generate_matches_single_device(shared):
    """Prefix-KV serving (build_prefix_kv + prefill_continue's rectangular
    split-PV attention + quantize-on-assemble cache; shared=True adds the
    cascade decode over SharedPrefixCache) over FSDP/TP-sharded params ==
    single-device tokens — the multi-chip path for prefix-cached eval
    workloads."""
    assert len(jax.devices()) == 8
    from grounded_video_llm_tpu.serve.generate import (
        build_prefix_kv, generate_tokens_from_prefix)

    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(2)
    pre_ids = rng.integers(3, 50, size=(1, 3)).astype(np.int32)
    post_ids = rng.integers(3, 50, size=(2, 5)).astype(np.int32)
    post_mask = np.ones_like(post_ids)
    feats = (rng.normal(size=(1, cfg.num_video_tokens, cfg.llm.hidden_size))
             * 0.05).astype(np.float32)
    Sp = pre_ids.shape[1] + cfg.num_video_tokens
    hint = -(-(Sp + post_ids.shape[1] + 4) // 128) * 128
    kw = dict(max_new_tokens=4, temperature=0.0, do_sample=False,
              eos_token_id=-2, pad_token_id=0, quantize_cache=True,
              shared_prefix=shared)

    def run(p):
        k, v, pm = build_prefix_kv(p, cfg, jnp.asarray(pre_ids),
                                   jnp.ones_like(jnp.asarray(pre_ids)),
                                   jnp.asarray(feats), hint)
        toks, _ = generate_tokens_from_prefix(
            p, cfg, jnp.asarray(post_ids), jnp.asarray(post_mask),
            k, v, pm, jax.random.key(0), **kw)
        return np.asarray(toks)

    ref = run(params)
    mesh = build_mesh(data=1, fsdp=4, tensor=2)
    np.testing.assert_array_equal(ref, run(shard_params(params, mesh)))


def test_sharded_spec_generate_matches_single_device():
    """Speculative generation (verify kernels, multi-slot commits, in-jit
    drafting) over FSDP/TP-sharded params == single-device greedy — the
    spec path stays correct under the multi-chip serving shardings."""
    assert len(jax.devices()) == 8
    from grounded_video_llm_tpu.serve.speculative import generate_tokens_spec

    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)

    B, S = 1, 10
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 50, size=(B, S)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    mask = np.ones((B, S), np.int32)
    spatial = np.zeros((B, cfg.num_segs, 336, 336, 3), np.float32)
    temporal = np.zeros((B, cfg.num_frames, 224, 224, 3), np.float32)
    kwargs = dict(max_new_tokens=4, draft_len=2, do_sample=False,
                  temperature=0.0, eos_token_id=-2, pad_token_id=0)

    ref, _ = generate_tokens_spec(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(spatial), jnp.asarray(temporal), jax.random.key(0),
        **kwargs)
    mesh = build_mesh(data=1, fsdp=4, tensor=2)
    sharded = shard_params(params, mesh)
    out, _ = generate_tokens_spec(
        sharded, cfg, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(spatial), jnp.asarray(temporal), jax.random.key(0),
        **kwargs)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
