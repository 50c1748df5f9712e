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

import functools
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


_IS_NONE = lambda x: x is None


def partition_params(params, mask):
    """Split a param tree by a matching bool tree into (trainable, frozen),
    each with None at the other side's leaves."""
    trainable = jax.tree_util.tree_map(lambda p, m: p if m else None,
                                       params, mask)
    frozen = jax.tree_util.tree_map(lambda p, m: None if m else p,
                                    params, mask)
    return trainable, frozen


def merge_params(a, b):
    return jax.tree_util.tree_map(lambda x, y: y if x is None else x, a, b,
                                  is_leaf=_IS_NONE)


def make_train_step(cfg: VLMConfig, tx, grad_accum: int = 1,
                    remat: bool = True, trainable_mask=None,
                    lora_dropout: float = 0.0, dropout_seed: int = 0,
                    mesh: Mesh | None = None):
    """Build the jitted train step.

    batch: vlm.Batch with leaves [B, ...] (grad_accum=1) or [A, B_micro, ...]
    (grad_accum>1; the leading axis is scanned on-device; weights update once —
    exact parity with the reference's normalized accumulation loop).

    trainable_mask: bool tree marking trainable params. When given, autodiff
    runs w.r.t. the trainable partition only — without it jax.grad
    materializes a full-size gradient tree (10.2GB for the bf16 flagship:
    measured HBM OOM on one v5e). Frozen leaves get symbolic zeros that the
    optimizer's set_to_zero group and XLA's add-zero simplification erase.

    lora_dropout: rate for the LoRA-branch dropout (reference peft
    lora_dropout=0.05); keys derive deterministically from dropout_seed +
    state.step (+ microbatch index under grad_accum), so resume reproduces
    the same masks."""

    def loss_fn(trainable, frozen, mb: vlm.Batch, drop_rng):
        params = merge_params(trainable, frozen)
        return vlm.forward_loss(params, cfg, mb, remat=remat,
                                lora_dropout=lora_dropout,
                                dropout_rng=drop_rng, mesh=mesh)

    def step_fn(state: TrainState, batch: vlm.Batch):
        step_rng = None
        if lora_dropout > 0.0:
            step_rng = jax.random.fold_in(jax.random.key(dropout_seed),
                                          state.step)
        if trainable_mask is None:
            trainable, frozen = state.params, None

            def lf(t, mb, r):
                return vlm.forward_loss(t, cfg, mb, remat=remat,
                                        lora_dropout=lora_dropout,
                                        dropout_rng=r, mesh=mesh)
        else:
            trainable, frozen = partition_params(state.params, trainable_mask)

            def lf(t, mb, r):
                return loss_fn(t, frozen, mb, r)

        # (None leaves are empty pytree nodes — plain tree_map skips them)
        if grad_accum == 1:
            loss, g_train = jax.value_and_grad(lf)(trainable, batch, step_rng)
        else:
            mb_rngs = (jax.random.split(step_rng, grad_accum)
                       if step_rng is not None else None)

            def accum_body(carry, xs):
                mb, r = xs
                loss_sum, grad_sum = carry
                loss, grads = jax.value_and_grad(lf)(trainable, mb, r)
                grad_sum = jax.tree_util.tree_map(
                    lambda a, g: a + g.astype(a.dtype), grad_sum, grads)
                return (loss_sum + loss, grad_sum), None

            zero_grads = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), trainable)
            (loss_sum, grad_sum), _ = jax.lax.scan(
                accum_body, (jnp.zeros((), jnp.float32), zero_grads),
                (batch, mb_rngs))
            loss = loss_sum / grad_accum
            g_train = jax.tree_util.tree_map(
                lambda g, p: (g / grad_accum).astype(p.dtype),
                grad_sum, trainable)

        if trainable_mask is None:
            grads = g_train
        else:
            # frozen side: symbolic zeros (set_to_zero group discards them and
            # p + 0 folds away — no frozen-size gradient buffers materialize)
            zeros_frozen = jax.tree_util.tree_map(jnp.zeros_like, frozen)
            grads = merge_params(g_train, zeros_frozen)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(jax.tree_util.tree_leaves(g_train))
        return (TrainState(params, opt_state, state.step + 1),
                {"loss": loss.astype(jnp.float32),
                 "grad_norm": gnorm.astype(jnp.float32)})

    return jax.jit(step_fn, donate_argnums=0)


def make_host_accum_step(cfg: VLMConfig, tx, grad_accum: int,
                         remat: bool = True, trainable_mask=None,
                         lora_dropout: float = 0.0, dropout_seed: int = 0,
                         mesh: Mesh | None = None, accum_dtype=jnp.float32,
                         remat_group: int = 1):
    """Gradient accumulation as a HOST loop: one jitted value_and_grad
    program per microbatch + a fp32 on-device accumulator + one donating
    optimizer-apply program.

    Semantically identical to make_train_step(grad_accum=N) — same
    normalized mean, same per-microbatch dropout key derivation
    (fold_in(dropout_seed, step) then split) — but the fwd+bwd never wraps
    in lax.scan: the scanned grounded-step program trips the axon
    compile-helper at accum>=2 (BENCH_TRAIN_r05.json / PROBE_TRAIN_B2_r05)
    while each constituent program compiles fine. Costs one materialized
    trainable-grad tree (~0.4GB for lm_head+embed+LoRA) and ~25ms dispatch
    per microbatch — noise against the multi-second microbatch step.
    tests/test_train.py asserts parity with the scan path on CPU."""
    if trainable_mask is None:
        raise ValueError("make_host_accum_step requires trainable_mask "
                         "(full-tree grads OOM the flagship)")

    def lf(t, f, mb, r):
        return vlm.forward_loss(merge_params(t, f), cfg, mb, remat=remat,
                                lora_dropout=lora_dropout, dropout_rng=r,
                                mesh=mesh, remat_group=remat_group)

    # accumulation FUSED into the grad program (donating the carry): a
    # separate accumulate program materializes the microbatch grads as
    # program outputs plus a second copy in the add — measured OOM at the
    # flagship (params+opt ~10GB leave no room for two extra grad trees).
    # This is exactly the scan body's footprint, one microbatch per dispatch.
    @functools.partial(jax.jit, donate_argnums=(4,))
    def grad_accum_fn(trainable, frozen, mb, r, carry):
        loss, grads = jax.value_and_grad(lf)(trainable, frozen, mb, r)
        loss_sum, grad_sum = carry
        return (loss_sum + loss,
                jax.tree_util.tree_map(lambda a, g: a + g.astype(a.dtype),
                                       grad_sum, grads))

    @functools.partial(jax.jit, donate_argnums=(0, 2))
    def apply(state: TrainState, loss_sum, grad_sum):
        # re-partition INSIDE the program: passing the loop's trainable/
        # frozen views alongside the donated state would hand the same
        # buffers in twice (they alias state.params)
        trainable, frozen = partition_params(state.params, trainable_mask)
        loss = loss_sum / grad_accum
        g_train = jax.tree_util.tree_map(
            lambda g, p: (g / grad_accum).astype(p.dtype),
            grad_sum, trainable)
        zeros_frozen = jax.tree_util.tree_map(jnp.zeros_like, frozen)
        grads = merge_params(g_train, zeros_frozen)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(jax.tree_util.tree_leaves(g_train))
        return (TrainState(params, opt_state, state.step + 1),
                {"loss": loss.astype(jnp.float32),
                 "grad_norm": gnorm.astype(jnp.float32)})

    # accum_dtype: fp32 matches the lax.scan path exactly; bf16 halves the
    # held accumulator (~0.4GB at the flagship — the margin that OOMed the
    # fp32 version on one v5e next to 10.2GB params + 2.3GB moments) and
    # matches the reference's FSDP bf16 reduce dtype
    # (training/fsdp.py MixedPrecision reduce_buffer_dtype).
    @jax.jit
    def zeros_like_trainable(t):
        return jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, accum_dtype), t)

    def step_fn(state: TrainState, batch: vlm.Batch):
        trainable, frozen = partition_params(state.params, trainable_mask)
        mb_rngs = None
        if lora_dropout > 0.0:
            step_rng = jax.random.fold_in(jax.random.key(dropout_seed),
                                          state.step)
            mb_rngs = jax.random.split(step_rng, grad_accum)
        carry = (jnp.zeros((), jnp.float32), zeros_like_trainable(trainable))
        for i in range(grad_accum):
            mb = jax.tree_util.tree_map(lambda x: x[i], batch)
            r = mb_rngs[i] if mb_rngs is not None else None
            carry = grad_accum_fn(trainable, frozen, mb, r, carry)
        del trainable, frozen  # alias state.params, which apply donates
        return apply(state, *carry)

    return step_fn


def shard_batch(batch: vlm.Batch, mesh: Mesh, grad_accum: int = 1) -> vlm.Batch:
    """Place a host batch on the mesh: batch dim sharded over (data, fsdp)
    (pure-DP data layout; with grad_accum the microbatch axis leads and the
    per-microbatch batch dim is axis 1).

    Single-process: a plain device_put scatter. Multi-process (TPU pod —
    jax.distributed initialized, process_count > 1): each host holds only
    ITS loader shard (data/loader.py shards the sampler by process), so the
    global array assembles via jax.make_array_from_process_local_data — the
    per-host-sharded-batch plan of SURVEY §2.5's DP row (the reference's
    DistributedSampler + torchrun equivalent)."""
    axis = 1 if grad_accum > 1 else 0
    multiprocess = jax.process_count() > 1

    def put(x):
        spec = [None] * x.ndim
        if x.ndim > axis:
            spec[axis] = batch_spec()[0]
        sharding = NamedSharding(mesh, P(*spec))
        if multiprocess:
            import numpy as np

            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
