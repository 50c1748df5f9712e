"""Phase attribution on the real chip: where do the 7.7s/batch go?

Times each stage of the serving pipeline as its own jit (R chained in-jit
iterations, scalar fetch — CLAUDE.md timing protocol):
  internvideo2   — temporal encoder trunk alone (72 clips)
  clip           — spatial encoder alone (72 frames @336)
  encode_video   — full dual-stream encode + fusion
  prefill        — LLM prefill alone at the spliced length (int8 weights)
  decode_step    — one decode step (int8 weights + int8 cache)

Compare against: e2e encode+prefill ≈ 5.97s, decode 27.5 ms/tok (BENCH r2).
Usage: python scripts/phase_profile.py [batch] [stage,stage,...]
  stages: internvideo2, clip, encode, prefill, decode (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 6
STAGES = (set(sys.argv[2].split(",")) if len(sys.argv) > 2
          else {"internvideo2", "clip", "encode", "prefill", "decode"})
R = 3


def timed(name, make_fn, *args, per=1.0):
    f = jax.jit(make_fn)
    t0 = time.time()
    np.asarray(f(*args))
    print(f"{name:14s} compile {time.time()-t0:6.1f}s", end="  ", flush=True)
    t0 = time.time()
    np.asarray(f(*args))
    dt = (time.time() - t0) / R
    print(f"{dt*1000:9.1f} ms/iter ({dt/per*1000:.1f} ms/unit)")
    return dt


def main():
    from grounded_video_llm_tpu.core.config import vlm_config
    from grounded_video_llm_tpu.models import internvideo2, clip_vit, llm, vlm
    from grounded_video_llm_tpu.serve.quantize import quantize_llm_for_serving

    print(f"devices: {jax.devices()} batch={B}")
    cfg = vlm_config(os.environ.get("BENCH_MODEL", "phi3.5"),
                     stage="inference")
    params = jax.jit(lambda k: vlm.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0))
    params = dict(params)
    import functools as _ft

    # w8a8 matches bench.py's full-int8 serving mode (W8A8 prefill GEMMs +
    # W8A8 decode GEMVs)
    params["llm"] = jax.jit(
        _ft.partial(quantize_llm_for_serving,
                    w8a8=os.environ.get("PHASE_QUANT_ENC", "1") == "1"),
        donate_argnums=0)(params["llm"])
    if os.environ.get("PHASE_QUANT_ENC", "1") == "1":  # match bench serving
        from grounded_video_llm_tpu.serve.quantize import (
            quantize_clip_for_serving, quantize_video_encoder_for_serving)

        params["video_encoder"] = jax.jit(quantize_video_encoder_for_serving,
                                          donate_argnums=0)(
                                              params["video_encoder"])
        params["clip"] = jax.jit(quantize_clip_for_serving,
                                 donate_argnums=0)(params["clip"])
        print("encoders: W8A8 int8", flush=True)
    jax.block_until_ready(params)

    clips = B * cfg.num_segs
    tp = jnp.zeros((clips, cfg.num_frames_per_seg, 224, 224, 3), jnp.bfloat16)
    sp = jnp.zeros((clips, 336, 336, 3), jnp.bfloat16)

    def chain(fn, x):
        def run(p, x):
            def body(i, acc):
                return fn(p, x + acc[..., :1, :1, :1] * 0)[0].astype(
                    jnp.float32)
            z = jnp.zeros((), jnp.float32)
            out = 0.0
            for i in range(R):
                out = out + jnp.sum(fn(p, x * (1.0 + out * 0))[0])
            return out + z
        return run

    # internvideo2 trunk (72 clips)
    def iv2(p, x):
        out = 0.0
        for i in range(R):
            out = out + jnp.sum(internvideo2.features(
                p, cfg.video,
                (x * (1.0 + out * 0)).astype(x.dtype)).astype(jnp.float32))
        return out

    if "internvideo2" in STAGES:
        timed("internvideo2", iv2, params["video_encoder"], tp)

    def clip_fn(p, x):
        out = 0.0
        for i in range(R):
            out = out + jnp.sum(clip_vit.features(
                p, cfg.clip,
                (x * (1.0 + out * 0)).astype(x.dtype)).astype(jnp.float32))
        return out

    if "clip" in STAGES:
        timed("clip", clip_fn, params["clip"], sp)

    sp_b = jnp.zeros((B, cfg.num_segs, 336, 336, 3), jnp.bfloat16)
    tp_b = jnp.zeros((B, cfg.num_frames, 224, 224, 3), jnp.bfloat16)

    def enc(p, xs):
        spx, tpx = xs
        out = 0.0
        for i in range(R):
            # perturb BOTH streams: an unperturbed tpx lets XLA CSE the
            # InternVideo2 trunk across iterations (measured: 1/3 the cost)
            d = (1.0 + out * 0)
            out = out + jnp.sum(vlm.encode_video(
                p, cfg, (spx * d).astype(spx.dtype),
                (tpx * d).astype(tpx.dtype)).astype(jnp.float32))
        return out

    if "encode" in STAGES:
        timed("encode_video", enc, params, (sp_b, tp_b))

    # prefill at spliced length
    S_full = 64 - 1 + cfg.num_video_tokens
    max_len = S_full + 64
    embeds = jnp.zeros((B, S_full, cfg.llm.hidden_size), jnp.bfloat16)
    mask = jnp.ones((B, S_full), jnp.int32)
    # quantized prefill reads only cache.k.shape[2] (max_len); a real bf16
    # cache here wastes 5GB of HBM (OOMs batch 6 alongside the int8 cache)
    cache0 = llm.KVCache(jnp.zeros((1, 1, max_len, 1, 1), jnp.bfloat16),
                         jnp.zeros((1, 1, max_len, 1, 1), jnp.bfloat16),
                         jnp.zeros((1,), jnp.int32))

    def pre(p, e):
        # R=1: chaining R prefills keeps R full int8 caches live (HBM OOM at
        # batch 6); the ~2.2s signal dwarfs the 25-30ms dispatch anyway.
        # cast the perturbation back: bf16 * f32-scalar promotes the whole
        # embed buffer to f32, doubling the flash kernel's VMEM (OOMs)
        logits, _ = llm.prefill(p, cfg.llm, e, mask, cache0,
                                quantize_cache=True)
        return jnp.sum(logits.astype(jnp.float32))

    if "prefill" in STAGES:
        f = jax.jit(pre)
        t0 = time.time()
        np.asarray(f(params["llm"], embeds))
        print(f"{'prefill':14s} compile {time.time()-t0:6.1f}s", end="  ",
              flush=True)
        t0 = time.time()
        for _ in range(R):
            np.asarray(f(params["llm"], embeds))
        print(f"{(time.time()-t0)/R*1000:9.1f} ms/iter (R=1 per call)")

    # decode: reuse generate's while_loop cost from bench (27.5 ms/tok);
    # here time one raw decode_step chained 32x
    if "decode" not in STAGES:
        return
    logits, cache = jax.jit(
        lambda p, e: llm.prefill(p, cfg.llm, e, mask, cache0,
                                 quantize_cache=True))(params["llm"], embeds)
    valid = jnp.zeros((B, max_len), bool).at[:, :S_full].set(True)
    tok = jnp.zeros((B, 1, cfg.llm.hidden_size), jnp.bfloat16)

    def dec(p, t):
        def body(i, carry):
            c, v, acc = carry
            lg, c, v = llm.decode_step(p, cfg.llm, t * (1.0 + acc * 0), c, v,
                                       jnp.full((B,), S_full, jnp.int32) + i)
            return (c, v, acc + jnp.sum(lg.astype(jnp.float32)))
        _, _, acc = jax.lax.fori_loop(0, 32, body, (cache, valid,
                                                    jnp.zeros((), jnp.float32)))
        return acc

    f = jax.jit(dec)
    t0 = time.time()
    np.asarray(f(params["llm"], tok))
    print(f"{'decode_step':14s} compile {time.time()-t0:6.1f}s",
          end="  ", flush=True)
    t0 = time.time()
    np.asarray(f(params["llm"], tok))
    dt = (time.time() - t0) / 32
    print(f"{dt*1000:9.2f} ms/token")


if __name__ == "__main__":
    main()
