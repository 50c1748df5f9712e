"""Parameter partition-spec rules: FSDP + optional TP over the device mesh.

The reference shards with FSDP wrap policies per backbone module
(reference training/fsdp.py:133-162, llava_next_video.py:270-306). The
TPU-native equivalent is declarative: every parameter gets a NamedSharding and
XLA inserts the all-gathers/reduce-scatters (SURVEY §2.5 row FSDP).

Rules (path-pattern → PartitionSpec over ('data','fsdp','tensor')):
  * big matmul weights: input dim sharded over 'fsdp' (ZeRO-3-style param
    sharding), output dim over 'tensor' (Megatron-style TP, cols for up/qkv,
    rows for down/o so the pair needs only one psum);
  * embeddings/lm_head: vocab over 'fsdp', hidden over 'tensor';
  * norms / biases / scalars: replicated;
  * stacked-layer leading axes are never sharded (scan iterates them).
A spec axis is dropped when the dim isn't divisible by the mesh axis size, so
the same rules serve the 8-way test mesh and tiny-dim configs.
"""

from __future__ import annotations

import re
from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import FSDP_AXIS, TENSOR_AXIS

# (regex over '/'-joined path, spec builder given ndim)
# Specs are written for the *trailing* dims; leading stacked-layer axes get None.
_RULES: Tuple[Tuple[str, Tuple], ...] = (
    # LLM
    (r"llm/embed$", (FSDP_AXIS, TENSOR_AXIS)),
    (r"llm/lm_head$", (TENSOR_AXIS, FSDP_AXIS)),
    (r"llm/layers/qkv_kernel$", (FSDP_AXIS, TENSOR_AXIS)),
    (r"llm/layers/o_kernel$", (TENSOR_AXIS, FSDP_AXIS)),
    (r"llm/layers/gate_up_kernel$", (FSDP_AXIS, TENSOR_AXIS)),
    (r"llm/layers/down_kernel$", (TENSOR_AXIS, FSDP_AXIS)),
    # InternVideo2
    (r"video_encoder/blocks/qkv_kernel$", (FSDP_AXIS, TENSOR_AXIS)),
    (r"video_encoder/blocks/proj/kernel$", (TENSOR_AXIS, FSDP_AXIS)),
    (r"video_encoder/blocks/fc1/kernel$", (FSDP_AXIS, TENSOR_AXIS)),
    (r"video_encoder/blocks/fc2/kernel$", (TENSOR_AXIS, FSDP_AXIS)),
    # CLIP
    (r"clip/layers/(q|k|v)/kernel$", (FSDP_AXIS, TENSOR_AXIS)),
    (r"clip/layers/o/kernel$", (TENSOR_AXIS, FSDP_AXIS)),
    (r"clip/layers/fc1/kernel$", (FSDP_AXIS, TENSOR_AXIS)),
    (r"clip/layers/fc2/kernel$", (TENSOR_AXIS, FSDP_AXIS)),
    # Projectors
    (r"(mm_projector|video_projector)/fc[12]/kernel$", (FSDP_AXIS, None)),
    # LoRA overlays: shard the big dim like their base kernels
    (r"lora/.*/a$", (FSDP_AXIS, None)),
    (r"lora/.*/b$", (None, FSDP_AXIS)),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for(path_str: str, shape: Tuple[int, ...], mesh: Mesh) -> P:
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    for pattern, trailing in _RULES:
        if re.search(pattern, path_str):
            nd = len(shape)
            nt = len(trailing)
            if nd < nt:
                return P()
            spec = [None] * (nd - nt) + list(trailing)
            # drop axes that don't divide evenly
            for i, ax in enumerate(spec):
                if ax is not None and shape[i] % axis_sizes.get(ax, 1) != 0:
                    spec[i] = None
                if ax is not None and axis_sizes.get(ax, 1) == 1:
                    spec[i] = None
            return P(*spec)
    return P()


def param_specs(params, mesh: Mesh):
    """pytree of PartitionSpec matching params."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: spec_for(_path_str(path), x.shape, mesh), params)


def param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), param_specs(params, mesh))


def shard_params(params, mesh: Mesh):
    """Place a (host-resident) param tree onto the mesh with FSDP shardings."""
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
