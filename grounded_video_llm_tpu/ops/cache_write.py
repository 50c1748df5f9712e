"""Per-row KV-cache slot writes (Pallas, in-place via input_output_aliases).

The decode cache write must land one token's k/v at a per-row slot index.
XLA's options are both wrong for big caches:
  * vmap(dynamic_update_slice) over per-row indices lowers to a full-cache
    select (measured +9.0 ms/token at batch 6 — ~5.3GB r+w);
  * a single dynamic_update_slice is in-place but forces one SHARED slot
    index across the batch — fine for left-padded batch serving (uniform
    lengths), fatal for continuous batching where rows decode at different
    positions.

This kernel aliases the cache buffer and rewrites ONLY the 128-lane tile
containing each row's slot: grid (L, B), per-program DMA is [hkv, D, 128]
(~400KB int8), total ~75MB r+w per cache side per token — microseconds, and
independent of max_len.

Layout contract matches QuantKVCache: values [L, B, Hkv, D, max_len]
(transposed head-major), scales [L, B, Hkv, 1, max_len].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _write_kernel(idx_ref, cache_ref, new_ref, out_ref):
    b = pl.program_id(1)
    lane = idx_ref[b] % LANE
    # int32 throughout: Mosaic only supports minor-dim insertion (the
    # [..., None] broadcast) for 32-bit types
    tile = cache_ref[0, 0].astype(jnp.int32)    # [Hkv, D, 128]
    newv = new_ref[0, 0].astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 2)
    out_ref[0, 0] = jnp.where(pos == lane, newv[..., None], tile).astype(
        out_ref.dtype)


def _write_scale_kernel(idx_ref, cache_ref, new_ref, out_ref):
    b = pl.program_id(1)
    lane = idx_ref[b] % LANE
    tile = cache_ref[0, 0]                      # [Hkv, 1, 128]
    pos = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 2)
    out_ref[0, 0] = jnp.where(pos == lane, new_ref[0, 0][..., None], tile)


def scatter_write_kv(cache: jnp.ndarray,     # [L, B, Hkv, D, max_len] int8
                     new_vals: jnp.ndarray,  # [L, B, Hkv, D] (any dtype)
                     idx: jnp.ndarray,       # [B] int32 slot per row
                     ) -> jnp.ndarray:
    """cache[l, b, :, :, idx[b]] = new_vals[l, b] for all l, b — in place."""
    L, B, Hkv, D, max_len = cache.shape
    idx = idx.astype(jnp.int32)
    out = pl.pallas_call(
        _write_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, B),
            in_specs=[
                pl.BlockSpec((1, 1, Hkv, D, LANE),
                             lambda l, b, idx: (l, b, 0, 0, idx[b] // LANE)),
                pl.BlockSpec((1, 1, Hkv, D), lambda l, b, idx: (l, b, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, Hkv, D, LANE),
                lambda l, b, idx: (l, b, 0, 0, idx[b] // LANE)),
        ),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={1: 0},   # alias the cache operand (post-scalar)
        interpret=jax.default_backend() != "tpu",
    )(idx, cache, new_vals.astype(cache.dtype))
    return out


def _write_multi_kernel(idx_ref, cache_ref, new_ref, out_ref, *, n_new,
                        n_tiles, scale_mode):
    """Write S=n_new CONTIGUOUS slots starting at idx[b]. Grid axis t ∈ {0,1}
    covers the (at most) two 128-lane tiles that S ≤ 128 contiguous slots can
    span; at the array edge the t=1 tile index clamps to t=0's tile and the
    duplicate write is idempotent (the grid is sequential and the revisited
    block stays resident in VMEM, so the second program reads the first's
    writes)."""
    b = pl.program_id(1)
    t = pl.program_id(2)
    tile = jnp.minimum(idx_ref[b] // LANE + t, n_tiles - 1)
    base = idx_ref[b] - tile * LANE           # slot s lands at lane base+s
    if scale_mode:
        tile_v = cache_ref[0, 0]              # [Hkv, 1, 128] f32
        pos = jax.lax.broadcasted_iota(jnp.int32, tile_v.shape, 2)
        for s in range(n_new):
            tile_v = jnp.where(pos == base + s, new_ref[0, 0, s][..., None],
                               tile_v)
        out_ref[0, 0] = tile_v
        return
    # int32 throughout: Mosaic only supports minor-dim insertion (the
    # [..., None] broadcast) for 32-bit types
    tile_v = cache_ref[0, 0].astype(jnp.int32)     # [Hkv, D, 128]
    pos = jax.lax.broadcasted_iota(jnp.int32, tile_v.shape, 2)
    for s in range(n_new):
        newv = new_ref[0, 0, s].astype(jnp.int32)  # [Hkv, D]
        tile_v = jnp.where(pos == base + s, newv[..., None], tile_v)
    out_ref[0, 0] = tile_v.astype(out_ref.dtype)


def scatter_write_kv_multi(cache: jnp.ndarray,   # [L, B, Hkv, D, max_len] int8
                           new_vals: jnp.ndarray,  # [L, B, S, Hkv, D]
                           idx: jnp.ndarray,     # [B] int32 base slot per row
                           ) -> jnp.ndarray:
    """cache[l, b, :, :, idx[b]+s] = new_vals[l, b, s] — in place, one kernel
    for all S ≤ 128 contiguous slots (the speculative-verify commit). The
    caller guarantees idx[b]+S ≤ max_len."""
    L, B, S, Hkv, D = new_vals.shape
    max_len = cache.shape[-1]
    assert S <= LANE
    idx = idx.astype(jnp.int32)
    out = pl.pallas_call(
        functools.partial(_write_multi_kernel, n_new=S,
                          n_tiles=max_len // LANE, scale_mode=False),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, B, 2),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, Hkv, D, LANE),
                    lambda l, b, t, idx: (
                        l, b, 0, 0,
                        jnp.minimum(idx[b] // LANE + t,
                                    max_len // LANE - 1))),
                pl.BlockSpec((1, 1, S, Hkv, D),
                             lambda l, b, t, idx: (l, b, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, Hkv, D, LANE),
                lambda l, b, t, idx: (
                    l, b, 0, 0,
                    jnp.minimum(idx[b] // LANE + t, max_len // LANE - 1))),
        ),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={1: 0},
        interpret=jax.default_backend() != "tpu",
    )(idx, cache, new_vals.astype(cache.dtype))
    return out


def scatter_write_scale_multi(scales: jnp.ndarray,  # [L, B, Hkv, 1, max_len]
                              new_scales: jnp.ndarray,  # [L, B, S, Hkv]
                              idx: jnp.ndarray,         # [B]
                              ) -> jnp.ndarray:
    L, B, S, Hkv = new_scales.shape
    max_len = scales.shape[-1]
    assert S <= LANE
    idx = idx.astype(jnp.int32)
    out = pl.pallas_call(
        functools.partial(_write_multi_kernel, n_new=S,
                          n_tiles=max_len // LANE, scale_mode=True),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, B, 2),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, Hkv, 1, LANE),
                    lambda l, b, t, idx: (
                        l, b, 0, 0,
                        jnp.minimum(idx[b] // LANE + t,
                                    max_len // LANE - 1))),
                pl.BlockSpec((1, 1, S, Hkv, 1),
                             lambda l, b, t, idx: (l, b, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, Hkv, 1, LANE),
                lambda l, b, t, idx: (
                    l, b, 0, 0,
                    jnp.minimum(idx[b] // LANE + t, max_len // LANE - 1))),
        ),
        out_shape=jax.ShapeDtypeStruct(scales.shape, scales.dtype),
        input_output_aliases={1: 0},
        interpret=jax.default_backend() != "tpu",
    )(idx, scales, new_scales[..., None].astype(scales.dtype))
    return out


def scatter_write_scale(scales: jnp.ndarray,     # [L, B, Hkv, 1, max_len] f32
                        new_scales: jnp.ndarray,  # [L, B, Hkv]
                        idx: jnp.ndarray,         # [B]
                        ) -> jnp.ndarray:
    L, B, Hkv, _, max_len = scales.shape
    idx = idx.astype(jnp.int32)
    out = pl.pallas_call(
        _write_scale_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, B),
            in_specs=[
                pl.BlockSpec((1, 1, Hkv, 1, LANE),
                             lambda l, b, idx: (l, b, 0, 0, idx[b] // LANE)),
                pl.BlockSpec((1, 1, Hkv, 1), lambda l, b, idx: (l, b, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, Hkv, 1, LANE),
                lambda l, b, idx: (l, b, 0, 0, idx[b] // LANE)),
        ),
        out_shape=jax.ShapeDtypeStruct(scales.shape, scales.dtype),
        input_output_aliases={1: 0},
        interpret=jax.default_backend() != "tpu",
    )(idx, scales, new_scales[..., None].astype(scales.dtype))
    return out
