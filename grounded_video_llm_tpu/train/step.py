"""The pjit train step: donated state, bf16 compute, grad-accum via lax.scan,
remat on decoder layers, FSDP/TP shardings from parallel/partitioning.

Replaces the reference's FSDP wrap + autocast + manual accumulation loop
(reference training/base_strategy.py:246-317, training/fsdp.py:129-182):
  * parameter sharding   → NamedSharding on every param (ZeRO-3 equivalent);
                           XLA inserts the all-gathers/reduce-scatters FSDP
                           does by hand
  * optimizer-state shard→ tx.init under jit propagates param shardings onto
                           the Adam moments (ZeRO-2 for free)
  * grad accumulation    → lax.scan over a leading microbatch axis with fp32
                           accumulators (reference divides loss by accum
                           steps, :302 — the scan mean is identical)
  * activation ckpt      → jax.checkpoint inside the decoder scan
  * NaN guard            → loss returned per step; host aborts on NaN
                           (reference :284-286)

Placement model: inputs are committed sharded arrays (shard_state/shard_batch),
so jit runs the step SPMD across the mesh with no in_shardings plumbing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import VLMConfig
from ..models import vlm
from ..parallel.mesh import batch_spec
from ..parallel.partitioning import shard_params


class TrainState(NamedTuple):
    params: dict
    opt_state: object
    step: jnp.ndarray


def create_train_state(params, tx, mesh: Mesh | None = None) -> TrainState:
    """Init state; with a mesh, params are FSDP-sharded first and the optimizer
    state inherits their shardings through jit propagation."""
    if mesh is not None:
        params = shard_params(params, mesh)
        opt_state = jax.jit(tx.init)(params)
        step = jax.device_put(jnp.zeros((), jnp.int32),
                              NamedSharding(mesh, P()))
    else:
        opt_state = tx.init(params)
        step = jnp.zeros((), jnp.int32)
    return TrainState(params, opt_state, step)


def make_train_step(cfg: VLMConfig, tx, grad_accum: int = 1,
                    remat: bool = True):
    """Build the jitted train step.

    batch: vlm.Batch with leaves [B, ...] (grad_accum=1) or [A, B_micro, ...]
    (grad_accum>1; the leading axis is scanned on-device; weights update once —
    exact parity with the reference's normalized accumulation loop)."""

    def loss_fn(params, mb: vlm.Batch):
        return vlm.forward_loss(params, cfg, mb, remat=remat)

    def step_fn(state: TrainState, batch: vlm.Batch):
        if grad_accum == 1:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        else:
            def accum_body(carry, mb):
                loss_sum, grad_sum = carry
                loss, grads = jax.value_and_grad(loss_fn)(state.params, mb)
                grad_sum = jax.tree_util.tree_map(
                    lambda a, g: a + g.astype(a.dtype), grad_sum, grads)
                return (loss_sum + loss, grad_sum), None

            zero_grads = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            (loss_sum, grad_sum), _ = jax.lax.scan(
                accum_body, (jnp.zeros((), jnp.float32), zero_grads), batch)
            loss = loss_sum / grad_accum
            grads = jax.tree_util.tree_map(
                lambda g, p: (g / grad_accum).astype(p.dtype),
                grad_sum, state.params)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return (TrainState(params, opt_state, state.step + 1),
                {"loss": loss.astype(jnp.float32),
                 "grad_norm": gnorm.astype(jnp.float32)})

    return jax.jit(step_fn, donate_argnums=0)


def shard_batch(batch: vlm.Batch, mesh: Mesh, grad_accum: int = 1) -> vlm.Batch:
    """Place a host batch on the mesh: batch dim sharded over (data, fsdp)
    (pure-DP data layout; with grad_accum the microbatch axis leads and the
    per-microbatch batch dim is axis 1)."""
    axis = 1 if grad_accum > 1 else 0

    def put(x):
        spec = [None] * x.ndim
        if x.ndim > axis:
            spec[axis] = batch_spec()[0]
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, batch)
