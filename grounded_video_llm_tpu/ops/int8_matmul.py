"""Weight-only int8 matmul (Pallas) for the decode path.

Decode on a single chip is weight-streaming bound (~7.6GB of bf16 per token
for Phi-3.5). Storing the projection matrices int8 with per-output-channel
scales halves the bytes; the kernel dequantizes tile-by-tile in VMEM (XLA's
convert-then-dot materializes the full bf16 matrix in HBM and wins nothing —
measured). Quantization is symmetric per-out-channel absmax, the standard
weight-only serving scheme.

Served accuracy: weight-only int8 with per-channel scales is generally within
noise for LLM generation quality; it is opt-in (`serve/quantize.py`) and off
by default.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def quantize_weights_int8(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """w [.., D, O] → (int8 values, fp32 scales [.., O]); symmetric absmax per
    output channel."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale[..., None, :]),
                 -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _mm_kernel(x_ref, w_ref, s_ref, o_ref, *, out_dtype):
    x = x_ref[:, :]                    # [block_m, D] bf16
    w = w_ref[:, :].astype(jnp.bfloat16)   # [D, block_o]
    s = s_ref[0, :]                    # [block_o]
    y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[:, :] = (y * s[None, :]).astype(out_dtype)


def dynamic_int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray,
                        w_scale: jnp.ndarray) -> jnp.ndarray:
    """W8A8 matmul: per-row dynamic activation quantization + int8xint8 MXU
    dot + fp32 rescale. x [..., D], w_q [D, O] int8, w_scale [O] f32.

    The int8 MXU runs the encoder/prefill GEMM shapes at ~180 TF/s vs ~118
    bf16 (scripts/microbench_int8_gemm.py, clean chained harness) — a 1.5x
    compute win for the compute-bound large-GEMM paths. The dynamic per-row
    absmax quant is ~4 VPU passes over x (tens of µs against a multi-ms
    matmul) and needs no calibration. Plain XLA — int8xint8→int32 dot_general
    lowers natively to the MXU; no Pallas needed."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(absmax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, w_q, (((xq.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * xs * w_scale).astype(x.dtype)


def static_int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray,
                       w_scale: jnp.ndarray,
                       x_scale: jnp.ndarray) -> jnp.ndarray:
    """W8A8 matmul with a CALIBRATED static activation scale (scalar, from
    serve/calibrate.py): skips dynamic_int8_matmul's per-row absmax pass.

    Why it matters: the dynamic path reads the full activation tensor twice
    (rowmax, then scale+round) before the dot. For the encoder's fc2 the
    input is the ~1.8GB gelu output — those two passes measured ~7 ms/block
    (MICROBENCH_IV2_r04.txt). With a static scale the quantize is a pure
    elementwise chain that XLA fuses into the PRODUCER's epilogue (fc1's
    dot → bias → gelu → round-to-int8 in one fusion), so the bf16 gelu
    output never round-trips HBM at all. Accuracy is coarser than per-row
    dynamic (one scale per tensor per block) — gated by serve/quant_ab.py's
    committed bar; clipping saturates at ±127 like the reference's int8
    serving schemes."""
    xs = jnp.maximum(x_scale.astype(jnp.float32), 1e-8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs),
                  -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, w_q, (((xq.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * xs * w_scale).astype(x.dtype)


def matmul_any(x: jnp.ndarray, kernel) -> jnp.ndarray:
    """x @ kernel where kernel is a dense array or a {"q","scale"} W8A8 pair
    (encoder serving quantization, serve/quantize.py). An "x_scale" entry
    (serve/calibrate.apply_static_scales) selects the static-activation-scale
    path — no per-row absmax passes."""
    if isinstance(kernel, dict):
        if "x_scale" in kernel:
            return static_int8_matmul(x, kernel["q"], kernel["scale"],
                                      kernel["x_scale"])
        return dynamic_int8_matmul(x, kernel["q"], kernel["scale"])
    return x @ kernel


def int8_matmul_layer(x: jnp.ndarray, w_q: jnp.ndarray, scales: jnp.ndarray,
                      layer_idx: jnp.ndarray, block_o: int = 512,
                      w8a8: bool = False) -> jnp.ndarray:
    """x [M, D] @ w_q[layer_idx] for STACKED int8 weights [Lyr, D, O] with
    scales [Lyr, O] — the decode-scan path. The layer is selected inside the
    kernel via scalar prefetch so the DMA reads the big stacked buffer
    directly. Slicing the layer out first (lax.scan xs slicing) materializes
    a copy of every layer's weights per token — the pallas consumer is opaque
    to XLA's slice fusion (measured: the copies, not the kernel, dominated
    the 31 ms/token batch-6 decode step).

    w8a8: quantize the (tiny) activation rows in-kernel and run the int8x
    int8 MXU dot — the weight-only path converts every int8 weight tile to
    bf16 on the VPU (~3.6GB of converts per token across the decoder, the
    non-DMA half of the GEMV time); the int8 dot consumes the tiles
    directly. Decode-accuracy opt-in (the engine's int8_full mode)."""
    from jax.experimental.pallas import tpu as pltpu

    M, D = x.shape
    Lyr, Dw, O = w_q.shape
    assert D == Dw
    if D % 32 != 0 or O % block_o != 0:
        w = (w_q[layer_idx].astype(x.dtype)
             * scales[layer_idx][None, :].astype(x.dtype))
        return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    Mp = -(-M // 8) * 8
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))

    out_dtype = x.dtype

    def kernel(lidx_ref, x_ref, w_ref, s_ref, o_ref):
        del lidx_ref
        xv = x_ref[:, :]                        # [Mp, D] bf16
        s = s_ref[0, 0, :]                      # [block_o]
        if w8a8:
            xf = xv.astype(jnp.float32)
            am = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            xs = jnp.maximum(am / 127.0, 1e-8)
            x8 = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(x8, w_ref[0], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            o_ref[:, :] = (y.astype(jnp.float32) * xs * s[None, :]).astype(
                out_dtype)
            return
        w = w_ref[0].astype(jnp.bfloat16)       # [D, block_o]
        y = jax.lax.dot_general(xv, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[:, :] = (y * s[None, :]).astype(out_dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(O // block_o,),
            in_specs=[
                pl.BlockSpec((Mp, D), lambda j, lidx: (0, 0)),
                pl.BlockSpec((1, D, block_o), lambda j, lidx: (lidx[0], 0, j)),
                pl.BlockSpec((1, 1, block_o), lambda j, lidx: (lidx[0], 0, j)),
            ],
            out_specs=pl.BlockSpec((Mp, block_o), lambda j, lidx: (0, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, O), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), x, w_q,
      scales[:, None, :])
    return out[:M]


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, scales: jnp.ndarray,
                block_o: int = 512, block_m: int = 512) -> jnp.ndarray:
    """x [M, D] (bf16) @ int8 w_q [D, O] * scales [O] → [M, O] in x.dtype.

    Grid blocks over (M, O); the weight tile dequantizes in VMEM. For decode
    (M ≤ 8) this streams int8 bytes — half the bf16 traffic; for prefill-sized
    M it behaves like a plain blocked matmul. Falls back to XLA dequant-matmul
    when the int8 tiling constraints don't hold."""
    M, D = x.shape
    Dw, O = w_q.shape
    assert D == Dw
    if D % 32 != 0 or O % block_o != 0:
        return (jnp.dot(x, w_q.astype(x.dtype),
                        preferred_element_type=jnp.float32)
                * scales[None, :]).astype(x.dtype)
    # VMEM: the [bm, D] bf16 x block is double-buffered — keep it ≤ ~2MB so it
    # coexists with the [D, block_o] int8 weight tile (+ its bf16 dequant)
    bm_budget = max(8, (2 * 1024 * 1024) // (D * 2) // 8 * 8)
    bm = min(block_m, bm_budget, -(-M // 8) * 8)
    Mp = -(-M // bm) * bm
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_mm_kernel, out_dtype=x.dtype),
        grid=(Mp // bm, O // block_o),
        in_specs=[
            pl.BlockSpec((bm, D), lambda i, j: (i, 0)),
            pl.BlockSpec((D, block_o), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_o), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, block_o), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, O), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x, w_q, scales[None, :])
    return out[:M]
