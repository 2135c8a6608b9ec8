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

        # NOTE: the chunked pallas GN (ops/attic/groupnorm_pallas_chunked)
        # is NOT auto-dispatched: measured 2.8x slower than XLA's fused
        # lowering at full resolution (the sequential chunk grid + an
        # extra HBM pass lose to XLA's overlap; BASELINE.md).  It is
        # archived under ops/attic as a kept negative result.
        use_pallas = use_pallas_for(x.shape, x.dtype)
    if use_pallas:
        from unetsulc_tpu.ops.groupnorm_pallas import group_norm_pallas

        return group_norm_pallas(x, num_groups, scale, bias, eps)

    # Group statistics via per-channel reductions + a static (C, G)
    # indicator contraction: channels stay on the lane dimension end to
    # end (reshaping C -> (G, C/G) would relayout the lanes), and XLA gets
    # one fused pass for sums and one for normalize.
    orig_dtype = x.dtype
    n = x.shape[0]
    cg = c // num_groups
    xf = x.astype(jnp.float32).reshape(n, -1, c)
    s = xf.shape[1]
    indicator = (
        jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cg
        == jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    ).astype(jnp.float32)
    ch_sum = jnp.sum(xf, axis=1)  # (n, C)
    ch_sq = jnp.sum(xf * xf, axis=1)  # (n, C)
    denom = float(s * cg)
    mean_g = (ch_sum @ indicator) / denom  # (n, G)
    var_g = (ch_sq @ indicator) / denom - mean_g**2
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = (mean_g @ indicator.T)[:, None, :]  # (n, 1, C)
    inv_c = (inv_g @ indicator.T)[:, None, :]
    out = (xf - mean_c) * (
        inv_c * scale.astype(jnp.float32)
    ) + bias.astype(jnp.float32)
    return out.reshape(x.shape).astype(orig_dtype)
