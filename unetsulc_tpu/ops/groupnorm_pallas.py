"""Pallas fused GroupNorm kernel for TPU.

The 'crg' block order means every conv output passes through ReLU then
GroupNorm (SURVEY.md §2.3).  XLA lowers GroupNorm to two HBM passes (stats,
normalize) plus the affine; this kernel fuses everything into a single
pallas_call per sample: the activation slab streams through VMEM once and
the normalized+affine result is written straight back — one read + one
write of HBM.

Layout: the channels-last activation (N, X, Y, Z, C) is viewed as (N, S, C)
with S = X*Y*Z, so channels stay on the lane dimension (C = 64..512 in the
flagship model — lane-friendly) and spatial voxels ride the sublanes.
Per-group statistics are computed WITHOUT reshuffling lanes by contracting
with a static (C, G) group-indicator matrix on the MXU:

    ch_sum  = 1_S^T  x          (1, C)   VPU reduction over sublanes
    g_sum   = ch_sum M          (1, G)   tiny MXU matmul
    mean_c  = (g_sum / (S*Cg)) M^T       broadcast back to channels
    (same for sum of squares; var = E[x^2] - E[x]^2 in fp32)

Applicability: one sample's (S, C) slab must fit in VMEM, which covers the
deeper U-Net levels (e.g. 25^3 x 256, 13^3 x 512); larger slabs fall back
to the pure-JAX path (ops.group_norm), where XLA's fusion is already
bandwidth-decent.  Selection is automatic via :func:`use_pallas_for`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for one sample slab (bytes): input + fp32 working copy.
_VMEM_SLAB_LIMIT = 10 * 1024 * 1024


def _gn_kernel(
    x_ref, m_ref, scale_ref, bias_ref, out_ref, mean_ref, inv_ref, *, eps, denom
):
    x = x_ref[0].astype(jnp.float32)  # (S, C)
    m = m_ref[...]  # (C, G) fp32 indicator
    ch_sum = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    ch_sq = jnp.sum(x * x, axis=0, keepdims=True)  # (1, C)
    g_sum = jnp.dot(ch_sum, m, preferred_element_type=jnp.float32)  # (1, G)
    g_sq = jnp.dot(ch_sq, m, preferred_element_type=jnp.float32)  # (1, G)
    mean_g = g_sum / denom
    var_g = g_sq / denom - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast back to channels: (1, G) @ (G, C)
    mean_c = jnp.dot(mean_g, m.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, m.T, preferred_element_type=jnp.float32)
    scale = scale_ref[...].astype(jnp.float32)  # (1, C)
    bias = bias_ref[...].astype(jnp.float32)  # (1, C)
    out = (x - mean_c) * (inv_c * scale) + bias
    out_ref[0] = out.astype(out_ref.dtype)
    mean_ref[0] = mean_g
    inv_ref[0] = inv_g


def _gn_forward_pallas(x3, indicator, scale, bias, *, num_groups, eps):
    n, s, c = x3.shape
    cg = c // num_groups
    out, mean_g, inv_g = pl.pallas_call(
        functools.partial(_gn_kernel, eps=eps, denom=float(s * cg)),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (c, num_groups), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, num_groups), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, num_groups), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x3.shape, x3.dtype),
            jax.ShapeDtypeStruct((n, 1, num_groups), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, num_groups), jnp.float32),
        ),
    )(x3, indicator, scale, bias)
    return out, mean_g, inv_g


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _gn3(x3, indicator, scale, bias, num_groups, eps):
    out, _, _ = _gn_forward_pallas(
        x3, indicator, scale, bias, num_groups=num_groups, eps=eps
    )
    return out


def _gn3_fwd(x3, indicator, scale, bias, num_groups, eps):
    out, mean_g, inv_g = _gn_forward_pallas(
        x3, indicator, scale, bias, num_groups=num_groups, eps=eps
    )
    return out, (x3, indicator, scale, mean_g, inv_g)


def _gn3_bwd(num_groups, eps, res, g):
    """Pure-JAX backward (bandwidth-bound; XLA fuses it fine).

    Standard normalization gradient per (sample, group) with D = S*Cg:
      dx = inv/D * (D*dxhat - sum(dxhat) - xhat * sum(dxhat*xhat))
    """
    x3, indicator, scale, mean_g, inv_g = res
    n, s, c = x3.shape
    xf = x3.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mean_c = jnp.einsum("ng,cg->nc", mean_g[:, 0], indicator)[:, None, :]
    inv_c = jnp.einsum("ng,cg->nc", inv_g[:, 0], indicator)[:, None, :]
    xhat = (xf - mean_c) * inv_c  # (n, s, c)
    dscale = jnp.sum(gf * xhat, axis=(0, 1)).reshape(scale.shape)
    dbias = jnp.sum(gf, axis=(0, 1)).reshape(scale.shape)
    dxhat = gf * scale.astype(jnp.float32).reshape(1, 1, c)
    # per-group reductions over (s, channels-in-group)
    sum_dxhat = jnp.einsum("nsc,cg->ng", dxhat, indicator)
    sum_dxhat_xhat = jnp.einsum("nsc,cg->ng", dxhat * xhat, indicator)
    cg = c // num_groups
    d = float(s * cg)
    sum_dxhat_c = jnp.einsum("ng,cg->nc", sum_dxhat, indicator)[:, None, :]
    sum_dx_xh_c = jnp.einsum("ng,cg->nc", sum_dxhat_xhat, indicator)[:, None, :]
    dx = inv_c / d * (d * dxhat - sum_dxhat_c - xhat * sum_dx_xh_c)
    return (
        dx.astype(x3.dtype),
        jnp.zeros_like(indicator),
        dscale.astype(scale.dtype),
        dbias.astype(scale.dtype),
    )


_gn3.defvjp(_gn3_fwd, _gn3_bwd)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps"))
def group_norm_pallas(
    x: jnp.ndarray,
    num_groups: int,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Fused GroupNorm. x: (N, ..., C) channels-last; torch semantics."""
    orig_shape = x.shape
    c = orig_shape[-1]
    cg = c // num_groups
    n = orig_shape[0]
    s = int(np.prod(orig_shape[1:-1]))

    x3 = x.reshape(n, s, c)
    indicator = np.zeros((c, num_groups), np.float32)
    indicator[np.arange(c), np.arange(c) // cg] = 1.0
    out = _gn3(
        x3,
        jnp.asarray(indicator),
        scale.reshape(1, c),
        bias.reshape(1, c),
        num_groups,
        eps,
    )
    return out.reshape(orig_shape)


def use_pallas_for(x_shape, dtype) -> bool:
    """True when one sample's (S, C) slab fits the VMEM budget."""
    c = x_shape[-1]
    s = int(np.prod(x_shape[1:-1]))
    itemsize = jnp.dtype(dtype).itemsize
    return jax.default_backend() == "tpu" and s * c * (itemsize + 4) <= _VMEM_SLAB_LIMIT
