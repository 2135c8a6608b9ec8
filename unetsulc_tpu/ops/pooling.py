"""MaxPool3d(kernel 2, stride 2, padding 1) with a fusion-friendly backward.

Forward semantics match torch's padded max pooling (the downsampler of the
deepsulci UNet3D encoders, SURVEY.md §2.3): -inf padding of 1 on every
spatial axis, window/stride 2, so the output extent is ``floor(d/2) + 1``
and odd extents stay alive through the ladder (96 -> 49 -> 25 -> 13).

Why a custom VJP: ``jax.lax.reduce_window(max)`` differentiates to
``select_and_scatter_add``, which XLA lowers poorly on TPU — the round-1
profile showed it among the dominant step ops with f32 relayout copies
around it (BASELINE.md).  The backward here is pure elementwise work over a
strided window view (compare-to-max + lexicographic first-match + masked
broadcast of the cotangent), which XLA fuses into a single VPU pass.

Tie-breaking: the cotangent is routed to the FIRST maximal element of each
window in row-major (x, y, z) scan order — exactly torch's MaxPool3d
backward (and XLA's select_and_scatter semantics), so swapping this in
changes no gradients, including on post-ReLU ties.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = float("-inf")


def _out_extent(d: int) -> int:
    return d // 2 + 1


def _pad_amounts(d: int):
    """(left, right) -inf padding so the padded extent is 2 * out_extent."""
    return 1, 2 * _out_extent(d) - d - 1


def _window_view(x: jnp.ndarray) -> jnp.ndarray:
    """(N, X, Y, Z, C) -> padded window view (N, ox, 2, oy, 2, oz, 2, C)."""
    n, dx, dy, dz, c = x.shape
    pads = [(0, 0)] + [_pad_amounts(d) for d in (dx, dy, dz)] + [(0, 0)]
    fill = (
        _NEG_INF
        if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min
    )
    xp = jnp.pad(x, pads, constant_values=fill)
    return xp.reshape(
        n, _out_extent(dx), 2, _out_extent(dy), 2, _out_extent(dz), 2, c
    )


@jax.custom_vjp
def max_pool_3d(x: jnp.ndarray) -> jnp.ndarray:
    """Padded 2x2x2/stride-2 max pool on (N, X, Y, Z, C)."""
    return _window_view(x).max(axis=(2, 4, 6))


def _fwd(x):
    out = max_pool_3d(x)
    return out, (x, out)


def _first_match_mask(eq: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask marking the lexicographically-first True per window.

    Hierarchical first-tie (z, then y, then x) equals global row-major
    first-tie: at each level, the earlier branch wins whenever it contains
    a maximal element.  Pure boolean ops — no integer prefix sums, so XLA
    fuses this into the surrounding elementwise pass with no extra HBM
    materialization.
    """
    take = lambda a, ax, i: jax.lax.slice_in_dim(a, i, i + 1, axis=ax)
    e0z, e1z = take(eq, 6, 0), take(eq, 6, 1)
    first_z = jnp.concatenate([e0z, e1z & ~e0z], axis=6)
    any_z = e0z | e1z  # (.., 1) along axis 6
    a0y, a1y = take(any_z, 4, 0), take(any_z, 4, 1)
    sel_y = jnp.concatenate([a0y, a1y & ~a0y], axis=4)
    any_y = a0y | a1y
    a0x, a1x = take(any_y, 2, 0), take(any_y, 2, 1)
    sel_x = jnp.concatenate([a0x, a1x & ~a0x], axis=2)
    return first_z & sel_y & sel_x


def _bwd(res, g):
    x, out = res
    n, dx, dy, dz, c = x.shape
    v = _window_view(x)
    m = out[:, :, None, :, None, :, None, :]
    first = _first_match_mask(v == m)
    dv = jnp.where(first, g[:, :, None, :, None, :, None, :], 0).astype(x.dtype)
    dxp = dv.reshape(
        n, 2 * _out_extent(dx), 2 * _out_extent(dy), 2 * _out_extent(dz), c
    )
    return (dxp[:, 1 : 1 + dx, 1 : 1 + dy, 1 : 1 + dz, :],)


max_pool_3d.defvjp(_fwd, _bwd)
