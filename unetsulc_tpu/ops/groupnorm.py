"""GroupNorm with float32 statistics (+ optional fused Pallas kernel).

torch semantics (``nn.GroupNorm(num_groups, C, eps=1e-5, affine=True)``):
per-sample, per-group mean/var over (spatial x channels-in-group), biased
variance, then per-channel affine.  The reference's 'crg' blocks normalize
the *full dense volume including zero padding* — padding must NOT be masked
out of the statistics to match reference numerics (SURVEY.md §7 hard
part #2), so this op is intentionally mask-free.

The pure-JAX path computes statistics in float32 regardless of the input
dtype (bfloat16 activations keep fp32-accurate normalization).  The Pallas
path (:mod:`unetsulc_tpu.ops.groupnorm_pallas`) fuses the two passes with
the ReLU that precedes GN in 'crg' order; selection is automatic by size
with an escape hatch via ``use_pallas``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def group_norm(
    x: jnp.ndarray,
    num_groups: int,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Channels-last GroupNorm. x: (N, ..., C); scale/bias: (C,)."""
    c = x.shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    if use_pallas is None:
        from unetsulc_tpu.ops.groupnorm_pallas import use_pallas_for

        use_pallas = use_pallas_for(x.shape, x.dtype)
    if use_pallas:
        from unetsulc_tpu.ops.groupnorm_pallas import group_norm_pallas

        return group_norm_pallas(x, num_groups, scale, bias, eps)

    orig_dtype = x.dtype
    n = x.shape[0]
    xf = x.astype(jnp.float32).reshape(n, -1, num_groups, c // num_groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(x.shape)
    out = xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)
