"""Third compile-regression probe (2026-08-19): RECTANGULAR flash shapes.

probe_compile2 showed square S=7515 fails while S<=6272 compiles. The
chunked-flash workaround needs to know WHICH dimension triggers the helper
crash: if only Sq matters, q-chunking alone suffices (no lse merge); if Sk
also triggers it, both dims must be chunked with the online (o, lse) merge.
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
    B = int(os.environ.get("PROBE_BATCH", "1"))

    # bottom-aligned rectangles: Sq small, Sk at the failing length
    for sq, sk in ((3758, 7515), (1024, 7515), (7515, 3758)):
        q = jax.random.normal(key, (B, sq, H, Dh), jnp.bfloat16)
        k = jax.random.normal(key, (B, sk, KV, Dh), jnp.bfloat16)
        f = jax.jit(lambda q, k: flash_mha(q, k, k, causal=True))
        probe(f"B{B}_causal_Sq{sq}_Sk{sk}", lambda: f(q, k)[0, 0, 0])


if __name__ == "__main__":
    main()
