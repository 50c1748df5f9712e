"""Round-5 re-probe of the 2026-08-19 compile-helper regression.

probe_compile2 on 2026-08-19 (round 5) showed causal S=7515 compiling in
1.7s — but that shape compiled successfully in round 3, so a SERVER-SIDE
compile cache can't be ruled out. This probes shapes never compiled in any
round (fresh squares above and below the r4 break point S=6912) to
determine whether the helper itself recovered:

  * fresh causal squares 7040/7296/7424 — fresh-compile health above 6912
  * fresh NON-causal square 7296 — the probe2 run showed noncausal 7515
    still failing, which contradicts "recovered" unless causality matters
  * fresh causal 6800 — control below the break point
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

    cases = [(6800, True), (7040, True), (7296, True), (7424, True),
             (7296, False)]
    for S, causal in cases:
        q = jax.random.normal(key, (1, S, H, Dh), jnp.bfloat16)
        k = jax.random.normal(key, (1, S, KV, Dh), jnp.bfloat16)
        f = jax.jit(lambda q, k, c=causal: flash_mha(q, k, k, causal=c))
        tag = "causal" if causal else "noncausal"
        probe(f"{tag}_S{S}", lambda: f(q, k)[0, 0, 0])


if __name__ == "__main__":
    main()
