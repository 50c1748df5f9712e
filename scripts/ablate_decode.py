"""Ablation attribution for the decode step on the real chip.

NOTE (post-fix): the product decode_step no longer scans over the cache/weight
buffers — it scans layer INDICES and the Pallas kernels select their layer via
scalar prefetch (models/llm.py). This script's local step copy keeps the old
scan-over-xs structure deliberately: it reproduces the slicing-copy regime the
fix removed (31.5 → 17.9 ms/token measured). Use phase_profile.py's decode
stage to time the current product step.

decode_step measures 31.4 ms/token at batch 6 (phase_profile) against a ~10 ms
streaming floor (3.7GB int8 weights + ~4.3GB int8 cache at 819GB/s). Each
variant removes ONE component from a faithful copy of models/llm.decode_step
(same shapes: 32 stacked layers, int8 weights, int8 transposed KV cache,
L=3584); the delta attributes the cost:

  full         — as shipped
  no_attn      — attention replaced by a broadcast of q (keeps GEMVs + writes)
  attn_bf16    — bf16 cache + XLA decode_attention (2x cache bytes, no dequant)
  mlp_bf16     — all projections bf16 XLA matmuls (2x weight bytes, no kernel)
  no_write     — skip the cache writes
  no_lmhead    — skip the final logits GEMV

Chained 32 steps inside one jit (per CLAUDE.md timing), cache carried through
the fori_loop, scalar fetch.

Usage: python scripts/ablate_decode.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 6
STEPS = 32

L, D, QKV_OUT, I2, V = 32, 3072, 9216, 8192, 32064
HKV, DH, MAXLEN = 32, 96, 3584
H = 32
S0 = 3483


def build_params(key):
    """On-device random int8 params — host numpy + jnp.asarray would ship
    ~4GB through the axon tunnel (measured: stalls >20min)."""
    ks = list(jax.random.split(key, 12))

    def qw(shape):
        q = jax.random.randint(ks.pop(), shape, -127, 128, jnp.int8)
        sshape = (shape[0], shape[-1]) if len(shape) == 3 else (shape[-1],)
        s = jax.random.uniform(ks.pop(), sshape, jnp.float32, 1e-4, 1e-3)
        return {"q": q, "scale": s}

    return {
        "layers": {
            "input_norm_w": jnp.ones((L, D), jnp.bfloat16),
            "qkv_kernel": qw((L, D, QKV_OUT)),
            "o_kernel": qw((L, H * DH, D)),
            "post_norm_w": jnp.ones((L, D), jnp.bfloat16),
            "gate_up_kernel": qw((L, D, 2 * I2)),
            "down_kernel": qw((L, I2, D)),
        },
        "final_norm_w": jnp.ones((D,), jnp.bfloat16),
        "lm_head": qw((D, V)),
    }


def bf16_params(p):
    """Dequantize ON DEVICE (jitted by the caller)."""
    def dq(k):
        q = k["q"].astype(jnp.float32)
        s = k["scale"]
        return (q * (s[:, None, :] if q.ndim == 3 else s[None, :])).astype(
            jnp.bfloat16)

    lay = p["layers"]
    return {
        "layers": {
            "input_norm_w": lay["input_norm_w"],
            "qkv_kernel": dq(lay["qkv_kernel"]),
            "o_kernel": dq(lay["o_kernel"]),
            "post_norm_w": lay["post_norm_w"],
            "gate_up_kernel": dq(lay["gate_up_kernel"]),
            "down_kernel": dq(lay["down_kernel"]),
        },
        "final_norm_w": p["final_norm_w"],
        "lm_head": dq(p["lm_head"]),
    }


def main():
    from grounded_video_llm_tpu.core.config import vlm_config
    from grounded_video_llm_tpu.models import llm
    from grounded_video_llm_tpu.ops.attention import decode_attention
    from grounded_video_llm_tpu.ops.decode_attention_int8 import (
        decode_attention_int8, quantize_kv)
    from grounded_video_llm_tpu.ops.normalization import rms_norm
    from grounded_video_llm_tpu.ops.rope import apply_rope, llm_rope_tables

    cfg = vlm_config("phi3.5", stage="inference").llm
    print(f"devices: {jax.devices()}  batch={B} steps={STEPS}")
    params = jax.jit(build_params)(jax.random.key(0))

    @jax.jit
    def build_cache(key):
        k1, k2, k3 = jax.random.split(key, 3)
        kq = jax.random.randint(k1, (L, B, HKV, DH, MAXLEN), -127, 128,
                                jnp.int8)
        vq = jax.random.randint(k2, (L, B, HKV, DH, MAXLEN), -127, 128,
                                jnp.int8)
        sc = jax.random.uniform(k3, (L, B, HKV, 1, MAXLEN), jnp.float32,
                                1e-3, 1e-2)
        return llm.QuantKVCache(kq, sc, vq, sc,
                                jnp.full((B,), S0, jnp.int32))

    cache_q = build_cache(jax.random.key(1))
    valid0 = jnp.zeros((B, MAXLEN), bool).at[:, :S0].set(True)
    tok = (jax.random.normal(jax.random.key(2), (B, 1, D), jnp.float32)
           * 0.05).astype(jnp.bfloat16)

    def make_step(variant, use_quant=True):
        def step(p, x, cache, valid, pos):
            cos, sin = llm_rope_tables(cfg, pos[:, None], seq_len_hint=MAXLEN)
            write_idx = cache.length

            def body(h_carry, layer_inputs):
                if use_quant:
                    lp, k_cache, k_sc, v_cache, v_sc = layer_inputs
                else:
                    lp, k_cache, v_cache = layer_inputs
                h = rms_norm(h_carry, lp["input_norm_w"], cfg.rms_eps)
                q, k, v = llm._qkv(h, lp, cfg)
                q, k = apply_rope(q, k, cos, sin)
                if variant == "no_attn":
                    attn = q[:, :, :H] * 0.1
                elif use_quant:
                    attn = decode_attention_int8(
                        q, k_cache, k_sc, v_cache, v_sc,
                        valid.astype(jnp.int32), k, v,
                        scale=cfg.head_dim ** -0.5)
                else:
                    attn = decode_attention(q, k_cache, v_cache, valid,
                                            k_new=k, v_new=v)
                x2 = h_carry + llm._dense(attn.reshape(B, 1, H * DH),
                                          lp["o_kernel"], lp, "o")
                h = rms_norm(x2, lp["post_norm_w"], cfg.rms_eps)
                x2 = x2 + llm._mlp(h, lp, cfg)
                return x2, (k[:, 0], v[:, 0])

            xs = ((p["layers"], cache.k, cache.k_scale, cache.v,
                   cache.v_scale) if use_quant
                  else (p["layers"], cache.k, cache.v))
            x2, (new_ks, new_vs) = jax.lax.scan(body, x, xs)

            if variant != "no_write":
                # scalar-index writes, matching models/llm.decode_step — the
                # per-row vmap(dynamic_update_slice) form lowered to a
                # full-cache select (measured +9.0 ms/token here)
                uni = write_idx[0]
                if use_quant:
                    kq, ksc = quantize_kv(new_ks)
                    vq, vsc = quantize_kv(new_vs)
                    cache = llm.QuantKVCache(
                        jax.lax.dynamic_update_slice(
                            cache.k, kq[..., None].astype(cache.k.dtype),
                            (0, 0, 0, 0, uni)),
                        jax.lax.dynamic_update_slice(
                            cache.k_scale, ksc[:, :, :, None, None],
                            (0, 0, 0, 0, uni)),
                        jax.lax.dynamic_update_slice(
                            cache.v, vq[..., None].astype(cache.v.dtype),
                            (0, 0, 0, 0, uni)),
                        jax.lax.dynamic_update_slice(
                            cache.v_scale, vsc[:, :, :, None, None],
                            (0, 0, 0, 0, uni)),
                        cache.length + 1)
                else:
                    cache = llm.KVCache(
                        jax.lax.dynamic_update_slice(
                            cache.k,
                            new_ks[:, :, None].astype(cache.k.dtype),
                            (0, 0, uni, 0, 0)),
                        jax.lax.dynamic_update_slice(
                            cache.v,
                            new_vs[:, :, None].astype(cache.v.dtype),
                            (0, 0, uni, 0, 0)),
                        cache.length + 1)
            slot = jnp.arange(MAXLEN)[None, :] == write_idx[:, None]
            valid = valid | slot
            x2 = rms_norm(x2, p["final_norm_w"], cfg.rms_eps)
            if variant == "no_lmhead":
                logits = jnp.sum(x2.astype(jnp.float32), axis=-1)
            else:
                logits = llm.logits_from_hidden(p, x2)[:, 0]
            return logits, cache, valid
        return step

    def timed(name, step, p, cache, valid):
        def run(p, t, cache, valid):
            def body(i, carry):
                c, v, acc = carry
                lg, c, v = step(p, t * (1.0 + acc * 0).astype(t.dtype), c, v,
                                jnp.full((B,), S0, jnp.int32) + i)
                return (c, v, acc + jnp.sum(lg.astype(jnp.float32)))
            _, _, acc = jax.lax.fori_loop(
                0, STEPS, body, (cache, valid, jnp.zeros((), jnp.float32)))
            return acc

        f = jax.jit(run)
        t0 = time.time()
        np.asarray(f(p, tok, cache, valid))
        ct = time.time() - t0
        t0 = time.time()
        np.asarray(f(p, tok, cache, valid))
        dt = (time.time() - t0) / STEPS
        print(f"{name:12s} compile {ct:6.1f}s  {dt*1000:8.2f} ms/token")
        return dt

    base = timed("full", make_step("full"), params, cache_q, valid0)
    for variant in ("no_attn", "no_write", "no_lmhead"):
        dt = timed(variant, make_step(variant), params, cache_q, valid0)
        print(f"    -> {variant} delta: {(base-dt)*1000:+.2f} ms")

    # bf16 everything (XLA matmuls + bf16 cache): 2x bytes, no Pallas.
    # Free the int8 cache first — bf16 weights (7.4GB) + bf16 cache (8.4GB)
    # + the int8 cache (5.3GB) would exceed HBM.
    p16 = jax.jit(bf16_params, donate_argnums=0)(params)
    del params, cache_q

    @jax.jit
    def build_cache16(key):
        k1, k2 = jax.random.split(key)
        mk = lambda kk: (jax.random.normal(
            kk, (L, B, MAXLEN, HKV, DH), jnp.float32) * 0.1).astype(
                jnp.bfloat16)
        return llm.KVCache(mk(k1), mk(k2), jnp.full((B,), S0, jnp.int32))

    cache16 = build_cache16(jax.random.key(3))
    dt = timed("all_bf16", make_step("full", use_quant=False), p16, cache16,
               valid0)
    print(f"    -> all_bf16 delta: {(base-dt)*1000:+.2f} ms")


if __name__ == "__main__":
    main()
