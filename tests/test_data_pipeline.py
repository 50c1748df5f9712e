"""Data pipeline: dataset __getitem__, collation, loader resume semantics,
and an end-to-end micro training run over the demo video."""

import json
import os

import numpy as np
import pytest

from grounded_video_llm_tpu.core.config import micro_vlm_config
from grounded_video_llm_tpu.data.collate import collate
from grounded_video_llm_tpu.data.datasets import MixGrounded, MixPretrain
from grounded_video_llm_tpu.data.loader import DataLoader, ShardedSampler
from grounded_video_llm_tpu.text.templates import (IGNORE_INDEX,
                                                   IMAGE_TOKEN_INDEX,
                                                   get_template)
from grounded_video_llm_tpu.text.tokenizer import build_test_tokenizer


@pytest.fixture()
def anno_file(tmp_path, demo_video):
    items = [
        {"question_id": f"q{i}", "video_id": f"v{i}",
         "video_file": os.path.basename(demo_video),
         "conversation": [
             {"from": "human", "value": "<image>\nWhen does the car appear?"},
             {"from": "gpt", "value": "From <2.0> to <8.5>."},
         ],
         "dataset_name": "unit"}
        for i in range(4)
    ]
    path = tmp_path / "anno.json"
    path.write_text(json.dumps(items))
    return str(path), os.path.dirname(demo_video)


def test_grounded_dataset_item(anno_file):
    anno, root = anno_file
    ds = MixGrounded(anno_path=anno, video_path=root, num_frames=8, num_segs=2,
                     sample="middle")
    item = ds[0]
    assert item["temporal_pixel_values"].shape == (8, 224, 224, 3)
    assert item["spatial_pixel_values"].shape == (2, 336, 336, 3)
    # grounding mark prepended, timestamps quantized against real duration
    assert "<timestamp_grounding>" in item["text_inputs"]
    assert "<2.0>" not in item["text_inputs"]
    d = item["durations"]
    import re

    ns = [int(m) for m in re.findall(r"<(\d+)>", item["text_inputs"])]
    assert ns[0] == min(int(300 * 2.0 / d), 300)


def test_pretrain_dataset_no_grounding_mark(anno_file):
    anno, root = anno_file
    ds = MixPretrain(anno_path=anno, video_path=root, num_frames=8, num_segs=2,
                     sample="middle")
    item = ds[0]
    assert "<timestamp_grounding>" not in item["text_inputs"]
    assert "<2.0>" in item["text_inputs"]  # left unquantized


def test_collate_batch(anno_file):
    anno, root = anno_file
    ds = MixGrounded(anno_path=anno, video_path=root, num_frames=8, num_segs=2,
                     sample="middle")
    tok = build_test_tokenizer("phi3.5")
    batch = collate([ds[0], ds[1]], tok, get_template("phi3.5"),
                    max_txt_len=2048, pad_to=64)
    assert batch.input_ids.shape[0] == 2
    assert batch.input_ids.shape[1] % 64 == 0
    assert (batch.input_ids == IMAGE_TOKEN_INDEX).sum() == 2
    assert (batch.labels != IGNORE_INDEX).any()
    assert batch.spatial_pixels.shape == (2, 2, 336, 336, 3)
    assert not batch.is_text.any()


def test_sampler_determinism_and_sharding():
    s0 = ShardedSampler(100, 4, seed=7, num_shards=2, shard_id=0)
    s1 = ShardedSampler(100, 4, seed=7, num_shards=2, shard_id=1)
    a = s0.epoch_indices(0)
    b = s1.epoch_indices(0)
    assert a.shape == (12, 4)
    assert set(a.ravel()).isdisjoint(set(b.ravel()))
    np.testing.assert_array_equal(a, s0.epoch_indices(0))  # deterministic
    assert not np.array_equal(a, s0.epoch_indices(1))      # reshuffles


def test_loader_resume_mid_epoch(anno_file):
    anno, root = anno_file
    ds = MixGrounded(anno_path=anno, video_path=root, num_frames=8, num_segs=2,
                     sample="middle")
    tok = build_test_tokenizer("phi3.5")
    make = lambda: DataLoader(
        ds, lambda s: collate(s, tok, get_template("phi3.5")), batch_size=1,
        seed=3)
    l1 = make()
    it = l1.epoch_iterator()
    first = next(it)
    state = l1.state_dict()
    assert state["batch_in_epoch"] == 1
    rest1 = [b.input_ids for b in it]

    l2 = make()
    l2.load_state_dict(state)
    rest2 = [b.input_ids for b in l2.epoch_iterator()]
    assert len(rest1) == len(rest2)
    for a, b in zip(rest1, rest2):
        np.testing.assert_array_equal(a, b)


def test_training_strategy_end_to_end(anno_file, tmp_path):
    """Full glue: dataset → loader → sharded step → metrics → checkpoint."""
    import dataclasses

    import jax

    from grounded_video_llm_tpu.core.config import STAGE_PRESETS
    from grounded_video_llm_tpu.models import vlm
    from grounded_video_llm_tpu.parallel.mesh import build_mesh
    from grounded_video_llm_tpu.train.strategy import TrainingStrategy

    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)
    tok = build_test_tokenizer("phi3.5")
    anno, root = anno_file
    ds = MixGrounded(anno_path=anno, video_path=root, num_frames=cfg.num_frames,
                     num_segs=cfg.num_segs, sample="middle")

    # shrink the grounded preset to a 2-sample global batch on a 1-dev mesh
    orig = STAGE_PRESETS["grounded"]
    STAGE_PRESETS["grounded"] = dataclasses.replace(
        orig, global_batch_size=2, per_device_batch_size=1, epochs=1)
    try:
        mesh = build_mesh(devices=jax.devices()[:1], data=1, fsdp=1)
        strat = TrainingStrategy(cfg, "grounded", params, tok,
                                 run_dir=str(tmp_path / "run"), mesh=mesh,
                                 n_train_examples=len(ds))
        assert strat.grad_accum == 2
        strat.run_training(ds)
        assert strat.metrics.global_step == 2  # 4 samples / global batch 2
        path = strat.save_checkpoint("final")
        assert os.path.exists(path)
        # vocab expanded + lora attached by the grounded stage
        assert ("lora" in strat.state.params["llm"]["layers"])
        # micro config pre-pads the vocab (num_extra_tokens in LLMConfig), so
        # the strategy must NOT have double-expanded
        assert strat.state.params["llm"]["embed"].shape[0] == \
            cfg.llm.padded_vocab_size
    finally:
        STAGE_PRESETS["grounded"] = orig


def test_strategy_checkpoint_resume_roundtrip(anno_file, tmp_path):
    """save_checkpoint → load_resume restores params, step, and loader state."""
    import dataclasses

    import jax
    import numpy as np

    from grounded_video_llm_tpu.core.config import STAGE_PRESETS
    from grounded_video_llm_tpu.models import vlm
    from grounded_video_llm_tpu.parallel.mesh import build_mesh
    from grounded_video_llm_tpu.train.strategy import TrainingStrategy

    cfg = micro_vlm_config("phi3.5")
    tok = build_test_tokenizer("phi3.5")
    anno, root = anno_file
    ds = MixGrounded(anno_path=anno, video_path=root, num_frames=cfg.num_frames,
                     num_segs=cfg.num_segs, sample="middle")
    orig = STAGE_PRESETS["pretrain"]
    STAGE_PRESETS["pretrain"] = dataclasses.replace(
        orig, global_batch_size=2, per_device_batch_size=2, epochs=1)
    try:
        mesh = build_mesh(devices=jax.devices()[:1], data=1, fsdp=1)

        def make():
            params = vlm.init_params(jax.random.key(0), cfg)
            return TrainingStrategy(cfg, "pretrain", params, tok,
                                    run_dir=str(tmp_path / "run"), mesh=mesh,
                                    n_train_examples=len(ds))

        s1 = make()
        s1.run_training(ds)
        want_vp = np.asarray(s1.state.params["video_projector"]["fc1"]["kernel"])
        want_step = int(s1.state.step)
        path = s1.save_checkpoint("latest", s1.make_loader(ds))

        s2 = make()
        loader = s2.make_loader(ds)
        s2.load_resume(path, loader)
        np.testing.assert_array_equal(
            np.asarray(s2.state.params["video_projector"]["fc1"]["kernel"]),
            want_vp)
        assert int(s2.state.step) == want_step
    finally:
        STAGE_PRESETS["pretrain"] = orig


def test_async_checkpoint_roundtrip(tmp_path):
    """save_pytree_async + wait_for_saves must commit an identical tree
    (the train loop's in-interval saves run on orbax's background writer)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grounded_video_llm_tpu.core import checkpoint as ckpt

    tree = {"a": jnp.arange(12.0).reshape(3, 4),
            "b": {"c": jnp.ones((5,), jnp.bfloat16), "step": jnp.int32(7)}}
    path = str(tmp_path / "async_state")
    ckpt.save_pytree_async(path, tree)
    ckpt.wait_for_saves()
    got = ckpt.load_pytree(path, template=tree)
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(tree)):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_sharded_checkpoint_restores_onto_mesh(tmp_path):
    """Mesh-sharded save → restore must land shards DIRECTLY on the mesh
    (multi-host resume path: each host reads only its own byte ranges —
    vs the reference's FULL_STATE_DICT rank-0 gather, fsdp.py:94-127).
    The restore template carries NamedShardings via load_pytree's abstract
    leaves; values and placement must both round-trip."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from grounded_video_llm_tpu.core import checkpoint as ckpt
    from grounded_video_llm_tpu.parallel.mesh import build_mesh

    assert len(jax.devices()) == 8
    mesh = build_mesh(data=1, fsdp=4, tensor=2)
    shardings = {
        "w": NamedSharding(mesh, P("fsdp", "tensor")),
        "opt": {"mu": NamedSharding(mesh, P("fsdp", None)),
                "step": NamedSharding(mesh, P())},
    }
    tree = {
        "w": jnp.arange(8 * 6, dtype=jnp.float32).reshape(8, 6),
        "opt": {"mu": jnp.ones((16, 3), jnp.bfloat16),
                "step": jnp.int32(11)},
    }
    sharded = jax.tree_util.tree_map(jax.device_put, tree, shardings)
    path = str(tmp_path / "sharded_state")
    ckpt.save_pytree(path, sharded)

    got = ckpt.load_pytree(path, template=sharded)
    for g, want, s in zip(jax.tree_util.tree_leaves(got),
                          jax.tree_util.tree_leaves(tree),
                          jax.tree_util.tree_leaves(
                              shardings, is_leaf=lambda x: isinstance(
                                  x, NamedSharding))):
        assert g.sharding == s, (g.sharding, s)
        np.testing.assert_array_equal(np.asarray(g, np.float32),
                                      np.asarray(want, np.float32))
