"""Dtype policy: bf16 params/compute with explicit fp32 islands.

The reference runs bf16 autocast with scattered fp32-forced regions (SURVEY §2.5):
LayerScale (internvideo2.py:458-463), RMSNorm variance (internvideo2.py:443-448,
modeling_phi3.py:310-326), RoPE tables (modeling_phi3.py:359-367), attention softmax
(modeling_phi3.py:591), and the LM logits / CE loss (modeling_phi3.py:1524-1526).
On TPU we reproduce those islands explicitly; everything else is bf16 so matmuls
hit the MXU at full rate.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.bfloat16
    compute_dtype: jnp.dtype = jnp.bfloat16
    # fp32 islands — always fp32 regardless of compute dtype
    norm_accum_dtype: jnp.dtype = jnp.float32
    softmax_dtype: jnp.dtype = jnp.float32
    logits_dtype: jnp.dtype = jnp.float32
    rope_dtype: jnp.dtype = jnp.float32


BF16 = DTypePolicy()
FP32 = DTypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


def cast_pytree(tree, dtype):
    """Cast all floating-point leaves of a pytree to dtype."""
    import jax

    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)
