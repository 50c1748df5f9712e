"""Shape sweep for the flash-kernel compile-helper crash (2026-08-19).

probe_compile.py localized the failure to the CAUSAL flash kernel at
Sq=7515 (fails in 0.7s = Mosaic crash in the helper, not a limit; the
non-causal encoder kernels and the chunked-CE scan compile fine, and the
identical kernel compiled in round 3). This sweeps causal flash over
lengths to find the break point — especially whether SERVING lengths
(~3548, what bench.py prefills) still compile under the updated helper.
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
        np.asarray(fn())
        print(f"{name:32s} OK    {time.time()-t0:7.1f}s", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:100]
        print(f"{name:32s} FAIL  {time.time()-t0:7.1f}s  {msg}", flush=True)
        return False


def main():
    from grounded_video_llm_tpu.ops.flash_attention import flash_mha

    print(f"devices: {jax.devices()}", file=sys.stderr)
    H, KV, Dh = 32, 32, 96  # phi3.5 head geometry
    key = jax.random.key(0)

    for S in (2048, 3548, 4096, 6144, 6272, 7515):
        q = jax.random.normal(key, (1, S, H, Dh), jnp.bfloat16)
        k = jax.random.normal(key, (1, S, KV, Dh), jnp.bfloat16)
        f = jax.jit(lambda q, k: flash_mha(q, k, k, causal=True))
        probe(f"causal_S{S}", lambda: f(q, k)[0, 0, 0])

    # non-causal at the failing length (encoder kernel proved OK at 2049)
    S = 7515
    q = jax.random.normal(key, (1, S, H, Dh), jnp.bfloat16)
    k = jax.random.normal(key, (1, S, KV, Dh), jnp.bfloat16)
    f = jax.jit(lambda q, k: flash_mha(q, k, k, causal=False))
    probe(f"noncausal_S{S}", lambda: f(q, k)[0, 0, 0])


if __name__ == "__main__":
    main()
