"""Checkpoint store: orbax sharded save/restore + reference-format interop.

Two formats:
  * native — orbax PyTree checkpoints (sharded, async-capable); used for
    train state + resume bundles. Unlike the reference (FULL_STATE_DICT
    gather to rank-0 CPU, sharded save explicitly unimplemented —
    reference training/fsdp.py:94-127), every host writes its own shards.
  * interop — the reference's split-by-module trainable-only .pth layout
    ({stage}_{model}_{llm}_{dataset}_{keys}.pth with a {"model": {module:
    state_dict}} payload, reference fsdp.py:116-127) for weight exchange
    with the original codebase, via torch-CPU.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_pytree(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


# One long-lived async checkpointer: orbax serializes and writes on its own
# background thread after `save` returns, so the train loop's in-interval
# saves overlap the next steps instead of stalling them (grounded-stage
# state is multi-GB). Each new save first waits out the previous one (orbax
# requires it, and it bounds in-flight host memory to one checkpoint).
_ASYNC_CKPTR = {"c": None}


def save_pytree_async(path: str, tree: Any) -> None:
    """Dispatch an orbax save and return once serialization is handed to the
    background writer. Call wait_for_saves() before reading the checkpoint,
    exiting, or letting the process die."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if _ASYNC_CKPTR["c"] is None:
        _ASYNC_CKPTR["c"] = ocp.StandardCheckpointer()
    c = _ASYNC_CKPTR["c"]
    c.wait_until_finished()
    c.save(path, tree, force=True)


def wait_for_saves() -> None:
    """Block until every save_pytree_async has fully committed to disk."""
    c = _ASYNC_CKPTR["c"]
    if c is not None:
        c.wait_until_finished()


def load_pytree(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree. `template` leaves may be concrete arrays OR
    jax.ShapeDtypeStruct; when a leaf carries a `.sharding`
    (jax.sharding.NamedSharding etc.), orbax restores its shards DIRECTLY
    onto those devices — each host/device reads only its own byte ranges, so
    a mesh-sharded train state never materializes unsharded on one host
    (the reference's resume path gathers FULL_STATE_DICT to rank-0 CPU,
    training/fsdp.py:94-127)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)

    def _abstract(x):
        if not hasattr(x, "shape"):
            return x
        sharding = getattr(x, "sharding", None)
        if sharding is not None and not isinstance(
                sharding, jax.sharding.SingleDeviceSharding):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        return jax.ShapeDtypeStruct(x.shape, x.dtype)

    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path,
                                 jax.tree_util.tree_map(_abstract, template))
        return ckptr.restore(path)


def save_json(path: str, obj: Dict) -> None:
    with open(path, "w") as f:
        json.dump(obj, f)


def load_json(path: str) -> Dict:
    with open(path) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# Reference-format interop (torch .pth)
# ---------------------------------------------------------------------------

#: module-key names used by the reference's split checkpoints
#: (reference llava_next_video.py:153 all_module_keys)
REF_MODULE_KEYS = ("vision_tower", "language_model", "video_encoder",
                   "multi_modal_projector", "video_projecter")


def export_reference_pth(path: str, module_dicts: Dict[str, Dict[str, np.ndarray]]):
    """Write {"model": {module: {param_name: tensor}}} the way the reference
    saves (fsdp.py:122-127). module_dicts values are flat name→numpy arrays
    in the reference's torch naming."""
    import torch

    payload = {"model": {
        k: {name: torch.from_numpy(np.array(v, copy=True))
            for name, v in d.items()}
        for k, d in module_dicts.items()}}
    torch.save(payload, path)


def import_reference_pth(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Read a reference checkpoint into {module: {name: numpy}}."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=True)
    model = payload.get("model", payload)
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for k, d in model.items():
        if isinstance(d, dict):
            out[k] = {name: t.to(torch.float32).numpy() for name, t in d.items()}
    return out
