"""Device mesh construction for DP / FSDP / TP over ICI (+ DCN for multi-slice).

The reference scales with torchrun + NCCL + FSDP hybrid sharding — shard within a
node, replicate across nodes (reference training/fsdp.py:87-92, SURVEY §2.6). The
TPU-native equivalent is a jax.sharding.Mesh whose axes ride the right fabric:
  data   — batch / replica axis; maps to DCN across slices, ICI within
  fsdp   — parameter/optimizer sharding axis (ZeRO-3 style), always ICI
  tensor — optional tensor parallelism within a replica (reference has none)
XLA inserts all-gather / reduce-scatter / psum along these axes exactly where the
shardings demand, replacing NCCL calls and FSDP wrap policies.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
MESH_AXES = (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS)


def build_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: int = 1,
    fsdp: int = -1,
    tensor: int = 1,
) -> Mesh:
    """Build a (data, fsdp, tensor) mesh. fsdp=-1 absorbs remaining devices.

    Uses jax.experimental.mesh_utils when available so axes map contiguously
    onto the ICI topology (adjacent devices share the fastest links).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if fsdp == -1:
        assert n % (data * tensor) == 0, (n, data, tensor)
        fsdp = n // (data * tensor)
    assert data * fsdp * tensor == n, f"mesh {data}x{fsdp}x{tensor} != {n} devices"
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh((data, fsdp, tensor),
                                                  devices=list(devices))
    except Exception:
        dev_array = np.asarray(list(devices)).reshape(data, fsdp, tensor)
    return Mesh(dev_array, MESH_AXES)


def single_device_mesh() -> Mesh:
    return build_mesh(devices=jax.devices()[:1], data=1, fsdp=1, tensor=1)


def initialize_distributed(strict: Optional[bool] = None) -> bool:
    """Multi-host init (the torchrun/NCCL-process-group equivalent, SURVEY
    §2.6): on TPU pods jax.distributed picks coordinator/rank from the
    environment (reference overwatch/overwatch.py:54-57 PartialState init).

    Returns True when the distributed runtime is up. strict=None infers
    intent: if a coordinator address is configured in the environment the
    run MEANT to be multi-host, so failure raises instead of silently
    degrading to a single-process run that would train on 1/N of the data;
    without one, failure logs at INFO and returns False (plain single-host)."""
    import logging
    import os

    log = logging.getLogger(__name__)
    if strict is None:
        strict = any(os.environ.get(v) for v in (
            "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS"))
    try:
        jax.distributed.initialize()
        log.info("jax.distributed up: process %d/%d",
                 jax.process_index(), jax.process_count())
        return True
    except RuntimeError as e:
        if "already initialized" in str(e):
            return True
        if strict:
            raise
        log.info("single-process run (jax.distributed: %s)", e)
        return False
    except Exception as e:
        if strict:
            raise
        log.info("single-process run (jax.distributed: %s)", e)
        return False


def process_info():
    return jax.process_index(), jax.process_count()


def batch_spec() -> P:
    """Batch dim sharded over data+fsdp jointly (pure-DP data layout: every
    device gets a distinct micro-batch shard; params replicated over data and
    sharded over fsdp)."""
    return P((DATA_AXIS, FSDP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
