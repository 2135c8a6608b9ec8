"""Chunked two-pass Pallas GroupNorm for slabs too large for VMEM.

The whole-slab kernel (groupnorm_pallas.py) requires one sample's (S, C)
activation in VMEM — fine for the U-Net's deep levels but not the
full-resolution ones (96^3 x 64 = 113 MB bf16).  XLA's own lowering of the
full-res GroupNorm measured ~8.7 ms per stats fusion in the train step
(BASELINE.md profile) — far off the ~0.2 ms HBM roofline for a 113 MB
read.  This module streams the slab through VMEM in X-slices instead:

* stats pass: grid (N, X); per-chunk fp32 channel sums accumulate in VMEM
  scratch (the TPU grid is sequential, so scratch carries across chunks);
  the final chunk contracts with the static (C, G) group indicator on the
  MXU and emits (mean_g, inv_g);
* normalize pass: grid (N, X); elementwise with the per-group stats.

Backward uses the same two-pass structure (reduction pass for
dscale/dbias/per-group sums, then an elementwise dx pass), wired as a
custom VJP.  Chunking along X keeps every chunk shape static: chunk =
S / X rows, always an exact divisor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _indicator(c: int, num_groups: int) -> np.ndarray:
    m = np.zeros((c, num_groups), np.float32)
    m[np.arange(c), np.arange(c) // (c // num_groups)] = 1.0
    return m


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _stats_kernel(
    x_ref, m_ref, mean_ref, inv_ref, sum_s, sq_s, *, eps, denom, nchunks
):
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        sum_s[...] = jnp.zeros_like(sum_s)
        sq_s[...] = jnp.zeros_like(sq_s)

    x = x_ref[0, 0].astype(jnp.float32)  # (chunk, C)
    sum_s[...] += jnp.sum(x, axis=0, keepdims=True)
    sq_s[...] += jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(ci == nchunks - 1)
    def _():
        m = m_ref[...]
        g_sum = jnp.dot(sum_s[...], m, preferred_element_type=jnp.float32)
        g_sq = jnp.dot(sq_s[...], m, preferred_element_type=jnp.float32)
        mean_g = g_sum / denom
        var_g = g_sq / denom - mean_g * mean_g
        mean_ref[...] = mean_g
        inv_ref[...] = jax.lax.rsqrt(var_g + eps)


def _normalize_kernel(x_ref, m_ref, mean_ref, inv_ref, scale_ref, bias_ref, out_ref):
    x = x_ref[0, 0].astype(jnp.float32)
    m = m_ref[...]
    mean_c = jnp.dot(mean_ref[...], m.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_ref[...], m.T, preferred_element_type=jnp.float32)
    out = (x - mean_c) * (
        inv_c * scale_ref[...].astype(jnp.float32)
    ) + bias_ref[...].astype(jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _fwd_pallas(x3, indicator, scale, bias, *, num_groups, eps, nchunks):
    n, s, c = x3.shape
    chunk = s // nchunks
    cg = c // num_groups
    xc = x3.reshape(n, nchunks, chunk, c)

    mean_g, inv_g = pl.pallas_call(
        functools.partial(
            _stats_kernel, eps=eps, denom=float(s * cg), nchunks=nchunks
        ),
        grid=(n, nchunks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, chunk, c), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (c, num_groups), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((1, num_groups), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_groups), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, num_groups), jnp.float32),
            jax.ShapeDtypeStruct((n, num_groups), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
    )(xc, indicator)

    out = pl.pallas_call(
        _normalize_kernel,
        grid=(n, nchunks),
        in_specs=[
            pl.BlockSpec((1, 1, chunk, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_groups), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_groups), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, chunk, c), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(xc.shape, x3.dtype),
    )(xc, indicator, mean_g, inv_g, scale, bias)
    return out.reshape(n, s, c), mean_g, inv_g


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------


def _bwd_reduce_kernel(
    x_ref, g_ref, m_ref, mean_ref, inv_ref, scale_ref,
    dscale_ref, dbias_ref, sdx_ref, sdxx_ref,
    dsc_s, dbi_s, sdx_s, sdxx_s, *, nchunks
):
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        dsc_s[...] = jnp.zeros_like(dsc_s)
        dbi_s[...] = jnp.zeros_like(dbi_s)
        sdx_s[...] = jnp.zeros_like(sdx_s)
        sdxx_s[...] = jnp.zeros_like(sdxx_s)

    x = x_ref[0, 0].astype(jnp.float32)
    g = g_ref[0, 0].astype(jnp.float32)
    m = m_ref[...]
    mean_c = jnp.dot(mean_ref[...], m.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_ref[...], m.T, preferred_element_type=jnp.float32)
    xhat = (x - mean_c) * inv_c
    dxhat = g * scale_ref[...].astype(jnp.float32)
    dsc_s[...] += jnp.sum(g * xhat, axis=0, keepdims=True)
    dbi_s[...] += jnp.sum(g, axis=0, keepdims=True)
    sdx_s[...] += jnp.sum(dxhat, axis=0, keepdims=True)
    sdxx_s[...] += jnp.sum(dxhat * xhat, axis=0, keepdims=True)

    @pl.when(ci == nchunks - 1)
    def _():
        dscale_ref[...] = dsc_s[...]
        dbias_ref[...] = dbi_s[...]
        sdx_ref[...] = jnp.dot(
            sdx_s[...], m, preferred_element_type=jnp.float32
        )
        sdxx_ref[...] = jnp.dot(
            sdxx_s[...], m, preferred_element_type=jnp.float32
        )


def _bwd_dx_kernel(
    x_ref, g_ref, m_ref, mean_ref, inv_ref, scale_ref, sdx_ref, sdxx_ref,
    dx_ref, *, denom
):
    x = x_ref[0, 0].astype(jnp.float32)
    g = g_ref[0, 0].astype(jnp.float32)
    m = m_ref[...]
    mean_c = jnp.dot(mean_ref[...], m.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_ref[...], m.T, preferred_element_type=jnp.float32)
    sdx_c = jnp.dot(sdx_ref[...], m.T, preferred_element_type=jnp.float32)
    sdxx_c = jnp.dot(sdxx_ref[...], m.T, preferred_element_type=jnp.float32)
    xhat = (x - mean_c) * inv_c
    dxhat = g * scale_ref[...].astype(jnp.float32)
    dx = inv_c / denom * (denom * dxhat - sdx_c - xhat * sdxx_c)
    dx_ref[0, 0] = dx.astype(dx_ref.dtype)


def _bwd_pallas(x3, g3, indicator, scale, mean_g, inv_g, *, num_groups, eps, nchunks):
    n, s, c = x3.shape
    chunk = s // nchunks
    cg = c // num_groups
    xc = x3.reshape(n, nchunks, chunk, c)
    gc = g3.reshape(n, nchunks, chunk, c)

    x_spec = pl.BlockSpec((1, 1, chunk, c), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((c, num_groups), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    gstat_spec = pl.BlockSpec((1, num_groups), lambda i, j: (i, 0),
                              memory_space=pltpu.VMEM)
    cvec_spec = pl.BlockSpec((1, c), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)
    cvec_out_spec = pl.BlockSpec((1, c), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM)

    dscale, dbias, sdx, sdxx = pl.pallas_call(
        functools.partial(_bwd_reduce_kernel, nchunks=nchunks),
        grid=(n, nchunks),
        in_specs=[x_spec, x_spec, m_spec, gstat_spec, gstat_spec, cvec_spec],
        out_specs=(cvec_out_spec, cvec_out_spec, gstat_spec, gstat_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, c), jnp.float32),
            jax.ShapeDtypeStruct((n, c), jnp.float32),
            jax.ShapeDtypeStruct((n, num_groups), jnp.float32),
            jax.ShapeDtypeStruct((n, num_groups), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
    )(xc, gc, indicator, mean_g, inv_g, scale)

    dx = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, denom=float(s * cg)),
        grid=(n, nchunks),
        in_specs=[
            x_spec, x_spec, m_spec, gstat_spec, gstat_spec, cvec_spec,
            gstat_spec, gstat_spec,
        ],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(xc.shape, x3.dtype),
    )(xc, gc, indicator, mean_g, inv_g, scale, sdx, sdxx)

    dscale_c = jnp.sum(dscale, axis=0).reshape(scale.shape)
    dbias_c = jnp.sum(dbias, axis=0).reshape(scale.shape)
    return dx.reshape(n, s, c), dscale_c, dbias_c


# --------------------------------------------------------------------------
# custom-vjp wrapper
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _gn3_chunked(x3, indicator, scale, bias, num_groups, eps, nchunks):
    out, _, _ = _fwd_pallas(
        x3, indicator, scale, bias,
        num_groups=num_groups, eps=eps, nchunks=nchunks,
    )
    return out


def _gn3_chunked_fwd(x3, indicator, scale, bias, num_groups, eps, nchunks):
    out, mean_g, inv_g = _fwd_pallas(
        x3, indicator, scale, bias,
        num_groups=num_groups, eps=eps, nchunks=nchunks,
    )
    return out, (x3, indicator, scale, mean_g, inv_g)


def _gn3_chunked_bwd(num_groups, eps, nchunks, res, g):
    x3, indicator, scale, mean_g, inv_g = res
    dx, dscale, dbias = _bwd_pallas(
        x3, g, indicator, scale, mean_g, inv_g,
        num_groups=num_groups, eps=eps, nchunks=nchunks,
    )
    return dx, jnp.zeros_like(indicator), dscale.astype(scale.dtype), dbias.astype(scale.dtype)


_gn3_chunked.defvjp(_gn3_chunked_fwd, _gn3_chunked_bwd)


# Per-element VMEM footprint multiplier inside the kernels: double-buffered
# bf16 input blocks (x and g in bwd) + several fp32 temporaries.
_VMEM_BYTES_PER_ELEM = 24
_VMEM_CHUNK_BUDGET = 3 * 1024 * 1024


def pick_nchunks(x_shape, dtype) -> int:
    """Smallest chunk count (a divisor of S, aligned to whole X/Y slices)
    whose per-chunk VMEM footprint fits the budget; 0 if impossible."""
    c = x_shape[-1]
    spatial = x_shape[1:-1]
    s = int(np.prod(spatial))
    x_dim = spatial[0] if len(spatial) else 1
    y_dim = spatial[1] if len(spatial) > 1 else 1

    def fits(rows: int) -> bool:
        return rows * c * _VMEM_BYTES_PER_ELEM <= _VMEM_CHUNK_BUDGET

    candidates = [x_dim * k for k in range(1, y_dim + 1) if y_dim % k == 0]
    for nchunks in candidates:
        if s % nchunks == 0 and fits(s // nchunks):
            return nchunks
    return 0


def group_norm_pallas_chunked(
    x: jnp.ndarray,
    num_groups: int,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
    nchunks: int = 0,
) -> jnp.ndarray:
    """Chunked fused GroupNorm; x: (N, X, ..., C), chunked along X (and Y)."""
    orig_shape = x.shape
    n, c = orig_shape[0], orig_shape[-1]
    s = int(np.prod(orig_shape[1:-1]))
    if nchunks <= 0:
        nchunks = pick_nchunks(orig_shape, x.dtype)
        assert nchunks, f"no valid chunking for {orig_shape}"
    x3 = x.reshape(n, s, c)
    out = _gn3_chunked(
        x3,
        jnp.asarray(_indicator(c, num_groups)),
        scale.reshape(1, c),
        bias.reshape(1, c),
        num_groups,
        eps,
        nchunks,
    )
    return out.reshape(orig_shape)


def chunk_fits_vmem(x_shape, dtype) -> bool:
    """True when a valid chunking exists for this activation shape."""
    return pick_nchunks(x_shape, dtype) > 0
