"""Fused InternVideo2-block GEMM kernels (Pallas, W8A8 serving path).

The IV2 trunk is 58% of serving device time, and W8A8 measured only 1.08x
in-situ vs 1.52x on clean GEMMs (CLAUDE.md): the gap is per-block PASS
overhead — every norm / dynamic-quant / epilogue is a separate XLA pass that
round-trips the [72*2049, 1408] activation tensor (415MB bf16) through HBM.
These kernels fuse the whole pre/post-GEMM chain into the GEMM program so
each activation is read ONCE per projection:

  fused_norm_quant_gemm      x →(RMSNorm → per-row int8 quant → int8xint8
                             MXU dot → fp32 rescale → epilogue)→ y
    epilogues: "qk_norm" (the qkv projection: out width 3D splits into
    exactly q|k|v blocks of width D, so the reference's
    RMSNorm-over-flattened-heads (internvideo2.py:590-597) applies in-tile),
    "gelu" (fc1, exact GELU), "none".
  fused_quant_gemm_ls_residual  y →(quant → dot → +bias → fp32 LayerScale →
                             +residual)→ x' — the proj and fc2 tails,
    keeping the fp32 LayerScale island (reference internvideo2.py:458-463).

Replaces, per block: rms_norm pass, dynamic-quant absmax+write passes, the
separate q/k RMSNorm passes, the GELU pass over the [M, 6144] fc1 output
(1.8GB r+w), the LayerScale multiplies and residual adds — ~10-15 GB of
HBM traffic per block at the serving batch.

Serving-only (weights arrive int8 from serve/quantize.py); no backward.
Accuracy semantics identical to the unfused W8A8 path: same per-row dynamic
activation quantization, same per-out-channel weight scales.

Grid order (M-row outer, O-block inner) + a scratch keyed on the O index
lets the norm+quant run once per M row (pl.when(j == 0)) while the x block
DMA is reused across O blocks (same index map → Mosaic skips the re-fetch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block_o(O: int, D: int, cap: int,
                  budget: int = 3 * 1024 * 1024) -> int:
    """Largest 128-multiple divisor of O, ≤ cap, whose int8 weight tile
    [D, block_o] fits the VMEM budget (double-buffered by the pipeline)."""
    best = 128
    cand = 128
    while cand <= O:
        if O % cand == 0 and D * cand <= budget and cand <= cap:
            best = cand
        cand += 128
    return best


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf, |error| ≤ 1.5e-7 — fp32-exact
    for GELU purposes. Mosaic has no erf/erfc lowering; XLA's own erf is a
    rational approximation of the same accuracy class, so this preserves the
    exact-GELU parity contract."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _norm_quant(x, norm_w, eps):
    """fp32 RMSNorm (matching ops/normalization.rms_norm's fp32 variance
    island) followed by per-row symmetric int8 quantization. Returns
    (int8 values, f32 per-row scales [bm, 1])."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    h = xf * jax.lax.rsqrt(var + eps) * norm_w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    s = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(h / s), -127, 127).astype(jnp.int8)
    return q, s


def _quant_rows(x):
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _nqg_kernel(x_ref, nw_ref, w_ref, ws_ref, qn_ref, b_ref, o_ref,
                xq_s, xs_s, *, eps, epilogue, out_dtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        q, s = _norm_quant(x_ref[:, :], nw_ref[0, :], eps)
        xq_s[:, :] = q
        xs_s[:, :] = s

    y = jax.lax.dot_general(
        xq_s[:, :], w_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * xs_s[:, :] * ws_ref[0, :][None, :]
    y = y + b_ref[0, :][None, :].astype(jnp.float32)
    if epilogue == "gelu":
        # exact GELU via _erf — jax.nn.gelu(approximate=False) lowers
        # through erf/erfc, which Mosaic does not implement. fp32: a bf16
        # variant hit an unsupported packed-bf16 cmpf lowering (jnp.sign)
        # and the poly cost is one reason this path stays opt-in.
        y = 0.5 * y * (1.0 + _erf(y * 0.7071067811865476))
    elif epilogue == "qk_norm":
        # output blocks are exactly q | k | v (O == 3D, block_o == D):
        # RMSNorm q and k over the flattened head dim, v passes through.
        # Static row reads + select — a dynamically-indexed sublane load
        # from the [2, D] weight ref has no Mosaic lowering.
        var = jnp.mean(y * y, axis=-1, keepdims=True)
        qn_w = jnp.where(j == 0, qn_ref[0, :], qn_ref[1, :]).astype(
            jnp.float32)
        normed = y * jax.lax.rsqrt(var + eps) * qn_w[None, :]
        y = jnp.where(j == 2, y, normed)
    o_ref[:, :] = y.astype(out_dtype)


def fused_norm_quant_gemm(x, norm_w, w_q, w_scale, *, eps: float,
                          epilogue: str = "none", bias=None, qk_norm_w=None,
                          block_m: int = 256, block_o: int = 512):
    """y = epilogue(rmsnorm(x, norm_w) @ dequant(w_q, w_scale) [+ bias]).

    x [..., D] bf16; w_q [D, O] int8; w_scale [O] f32.
    epilogue "qk_norm" requires O == 3D, qk_norm_w [2, D] and forces
    block_o = D. Returns [..., O] in x.dtype."""
    lead = x.shape[:-1]
    D = x.shape[-1]
    O = w_q.shape[-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, D)

    if epilogue == "qk_norm":
        assert O == 3 * D and qk_norm_w is not None
        block_o = D
    else:
        block_o = _pick_block_o(O, D, cap=max(block_o, 2048))
    assert O % block_o == 0, (O, block_o)
    # VMEM: x block (bf16, double-buffered) + int8 scratch + w tile (int8,
    # double-buffered) + fp32 epilogue tile; shrink block_m for wide D (fc2)
    if D >= 4096:
        block_m = min(block_m, 128)
    bm = min(block_m, -(-M // 8) * 8)
    Mp = -(-M // bm) * bm
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))

    qn = qk_norm_w if qk_norm_w is not None else jnp.zeros((2, D), x.dtype)
    b = bias if bias is not None else jnp.zeros((O,), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_nqg_kernel, eps=eps, epilogue=epilogue,
                          out_dtype=x.dtype),
        grid=(Mp // bm, O // block_o),
        in_specs=[
            pl.BlockSpec((bm, D), lambda i, j: (i, 0)),
            pl.BlockSpec((1, D), lambda i, j: (0, 0)),
            pl.BlockSpec((D, block_o), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_o), lambda i, j: (0, j)),
            pl.BlockSpec((2, D), lambda i, j: (0, 0)),
            pl.BlockSpec((1, block_o), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, block_o), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, O), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, D), jnp.int8),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x2, norm_w[None, :], w_q, w_scale[None, :], qn, b[None, :])
    return out[:M].reshape(*lead, O)


def _qglr_kernel(x_ref, w_ref, ws_ref, b_ref, ls_ref, r_ref, o_ref,
                 xq_s, xs_s, *, out_dtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        q, s = _quant_rows(x_ref[:, :])
        xq_s[:, :] = q
        xs_s[:, :] = s

    y = jax.lax.dot_general(
        xq_s[:, :], w_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * xs_s[:, :] * ws_ref[0, :][None, :]
    y = y + b_ref[0, :][None, :].astype(jnp.float32)
    # fp32 LayerScale island (reference internvideo2.py:458-463) + residual
    y = y * ls_ref[0, :][None, :].astype(jnp.float32)
    y = y + r_ref[:, :].astype(jnp.float32)
    o_ref[:, :] = y.astype(out_dtype)


def fused_quant_gemm_ls_residual(x, w_q, w_scale, bias, ls, residual, *,
                                 block_m: int = 256, block_o: int = 512):
    """out = residual + ls * (quant(x) @ dequant(w_q) + bias), LayerScale in
    fp32. x [..., D]; w_q [D, O] int8; residual [..., O]; returns x.dtype."""
    lead = x.shape[:-1]
    D = x.shape[-1]
    O = w_q.shape[-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, D)
    r2 = residual.reshape(M, O)
    block_o = _pick_block_o(O, D, cap=max(block_o, 2048))
    assert O % block_o == 0, (O, block_o)
    if D >= 4096:
        block_m = min(block_m, 128)
    bm = min(block_m, -(-M // 8) * 8)
    Mp = -(-M // bm) * bm
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
        r2 = jnp.pad(r2, ((0, Mp - M), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_qglr_kernel, out_dtype=x.dtype),
        grid=(Mp // bm, O // block_o),
        in_specs=[
            pl.BlockSpec((bm, D), lambda i, j: (i, 0)),
            pl.BlockSpec((D, block_o), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_o), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_o), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_o), lambda i, j: (0, j)),
            pl.BlockSpec((bm, block_o), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((bm, block_o), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, O), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, D), jnp.int8),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x2, w_q, w_scale[None, :], bias[None, :], ls[None, :], r2)
    return out[:M].reshape(*lead, O)
