"""Bisect which grounded-train-step component the axon remote-compile helper
rejects (observed 2026-08-19: `tpu_compile_helper subprocess exit code 1`
HTTP 500 on the full grounded step AND on forward_loss at spliced S=7516,
while encode_fwd compiles in 30s — the same step compiled in ~760s in round
3, so the failure is service-side and new).

Each probe jits ONE suspect program at grounded shapes and reports
compile-ok / compile-fail + time. Ordered smallest-first so the first
failure localizes the trigger. Run on the real chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def probe(name, fn):
    t0 = time.time()
    try:
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # host fetch barrier
        print(f"{name:28s} OK    {time.time()-t0:7.1f}s", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:120]
        print(f"{name:28s} FAIL  {time.time()-t0:7.1f}s  {type(e).__name__}: "
              f"{msg}", flush=True)
        return False


def main():
    from grounded_video_llm_tpu.core.config import vlm_config
    from grounded_video_llm_tpu.models import llm as llm_mod
    from grounded_video_llm_tpu.ops.flash_attention import flash_mha

    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = vlm_config("phi3.5", stage="grounded")
    lm = cfg.llm
    S = 4096 - 1 + cfg.num_video_tokens  # 7515 spliced
    H, KV, Dh = lm.num_heads, lm.num_kv_heads, lm.head_dim
    key = jax.random.key(0)

    # 1. flash fwd at spliced length (the Sq>6144 block_q=128 branch)
    q = jax.random.normal(key, (1, S, H, Dh), jnp.bfloat16)
    k = jax.random.normal(key, (1, S, KV, Dh), jnp.bfloat16)
    f1 = jax.jit(lambda q, k: flash_mha(q, k, k, causal=True))
    probe("flash_fwd_S7515", lambda: f1(q, k))

    # 2. flash fwd+bwd at spliced length (two-kernel bwd, saved-LSE path)
    def loss(q, k):
        return jnp.sum(flash_mha(q, k, k, causal=True)
                       .astype(jnp.float32))
    f2 = jax.jit(jax.grad(loss, argnums=(0, 1)))
    probe("flash_fwd_bwd_S7515", lambda: f2(q, k))

    # 3. chunked CE from hidden at full vocab (lax.scan over 1024-chunks)
    params = None

    def make_llm_params():
        return jax.jit(
            lambda key: llm_mod.init_params(key, lm, dtype=jnp.bfloat16)
        )(key)

    params = make_llm_params()
    h = jax.random.normal(key, (1, S, lm.hidden_size), jnp.bfloat16)
    lab = jnp.ones((1, S), jnp.int32)
    f3 = jax.jit(lambda p, h, lab: llm_mod.causal_lm_loss_from_hidden(
        p, h, lab))
    probe("chunked_ce_S7515", lambda: f3(params, h, lab))

    # 4. LLM forward_hidden at spliced length (32-layer scan + flash)
    emb = jax.random.normal(key, (1, S, lm.hidden_size), jnp.bfloat16)
    mask = jnp.ones((1, S), jnp.int32)
    f4 = jax.jit(lambda p, e, m: llm_mod.forward_hidden(
        p, lm, e, attn_mask=m))
    probe("llm_fwd_S7515", lambda: f4(params, emb, mask))

    # 5. LLM forward + chunked CE (≈ forward_loss minus encoders)
    def fwd_ce(p, e, m, lab):
        hid = llm_mod.forward_hidden(p, lm, e, attn_mask=m)
        if isinstance(hid, tuple):
            hid = hid[0]
        return llm_mod.causal_lm_loss_from_hidden(p, hid, lab)
    f5 = jax.jit(fwd_ce)
    probe("llm_fwd_ce_S7515", lambda: f5(params, emb, mask, lab))


if __name__ == "__main__":
    main()
