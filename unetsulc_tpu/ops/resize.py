"""Trilinear volume resize with exact torch ``align_corners=False`` semantics.

The decoder upsamples the coarse feature map to each skip connection's
spatial size (torch: ``F.interpolate(x, size=output_size)``, SURVEY.md §2.3
"trilinear-interpolate decoder").  Implemented as three separable 1-D linear
interpolations expressed as gathers + lerps — XLA fuses these into cheap
VPU work, and the pattern is identical in the backward pass (transposed
gather), so no custom VJP is needed.

Source coordinate convention (half-pixel centers, clamped):
    src = clamp((dst + 0.5) * in/out - 0.5, 0, in-1)
which is exactly torch's ``align_corners=False``.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def _axis_indices_weights(in_size: int, out_size: int):
    """Static (idx0, idx1, w1) for one axis; computed in numpy at trace time."""
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * (in_size / out_size) - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    idx0 = np.floor(src).astype(np.int32)
    idx1 = np.minimum(idx0 + 1, in_size - 1).astype(np.int32)
    w1 = (src - idx0).astype(np.float32)
    return idx0, idx1, w1


def _interp_axis(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    idx0, idx1, w1 = _axis_indices_weights(in_size, out_size)
    a = jnp.take(x, idx0, axis=axis)
    b = jnp.take(x, idx1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = jnp.asarray(w1).reshape(shape).astype(x.dtype)
    return a + (b - a) * w


def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Static (out, in) linear-interpolation matrix for one axis."""
    idx0, idx1, w1 = _axis_indices_weights(in_size, out_size)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, idx0), 1.0 - w1)
    np.add.at(m, (rows, idx1), w1)
    return m


def _interp_axis_matmul(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    m = jnp.asarray(_interp_matrix(in_size, out_size), dtype=x.dtype)
    # contract the axis with the interpolation matrix on the MXU
    out = jnp.tensordot(x, m, axes=[[axis], [1]])  # moves result axis last
    return jnp.moveaxis(out, -1, axis)


def resize_trilinear(
    x: jnp.ndarray, target: Sequence[int], use_matmul: bool = True
) -> jnp.ndarray:
    """Resize (N, X, Y, Z, C) to spatial ``target`` (X', Y', Z').

    Two equivalent implementations (same half-pixel weights):
    * matmul (default): each axis is contracted with a static (out, in)
      interpolation matrix — dense MXU work, no gathers, no relayout
      copies in fwd or bwd (the transpose is just the matrix transposed);
    * gather: take + lerp per axis (kept for reference/parity tests).
    """
    assert x.ndim == 5, "expected (N, X, Y, Z, C)"
    interp = _interp_axis_matmul if use_matmul else _interp_axis
    for axis, out_size in zip((1, 2, 3), target):
        x = interp(x, axis, int(out_size))
    return x


def _interp_matrix_padded(
    in_size: int, out_size: int, pad_in: int, pad_out: int
) -> np.ndarray:
    """(pad_out, pad_in) interp matrix on padded axes (interior offset 1).

    Rows for output padding are zero (conv kernels trust exact-zero
    padding) and columns for input padding are never referenced, so the
    resize runs directly on a padded buffer without unpad/repad passes."""
    m = np.zeros((pad_out, pad_in), np.float32)
    m[1 : 1 + out_size, 1 : 1 + in_size] = _interp_matrix(in_size, out_size)
    return m


def resize_trilinear_buf(buf: jnp.ndarray, g_in, g_out) -> jnp.ndarray:
    """Trilinear-resize a padded row-major buffer, layout-native.

    buf: (K, Xp, plane, cs) in the conv_pallas layout for geometry
    ``g_in``; returns the same-K buffer for ``g_out`` with identical
    interior semantics as ``resize_trilinear`` on the unpadded volume
    (same half-pixel weights; pads stay exact zeros).  The plane split
    (plane -> Yp, Zp) is layout-free, the channel shards never merge, and
    no unpad/pad passes run — this replaced ~2 ms/step of XLA relayout
    glue around the decoder upsample (BASELINE.md round-3 notes).
    """
    k, xp, ps, cs = (int(v) for v in buf.shape)
    assert xp == g_in.Xp and ps == g_in.plane, (buf.shape, g_in)
    x6 = buf.reshape(k, xp, g_in.Yp, g_in.Zp, cs)
    for axis, i_in, i_out, p_in, p_out in (
        (3, g_in.Z, g_out.Z, g_in.Zp, g_out.Zp),
        (2, g_in.Y, g_out.Y, g_in.Yp, g_out.Yp),
        (1, g_in.X, g_out.X, g_in.Xp, g_out.Xp),
    ):
        if i_in == i_out and p_in == p_out:
            continue
        m = jnp.asarray(
            _interp_matrix_padded(i_in, i_out, p_in, p_out), dtype=buf.dtype
        )
        x6 = jnp.moveaxis(jnp.tensordot(x6, m, axes=[[axis], [1]]), -1, axis)
    return x6.reshape(k, g_out.Xp, g_out.plane, cs)


def resize_nearest(x: jnp.ndarray, target: Sequence[int]) -> jnp.ndarray:
    """Nearest-neighbor variant (torch ``mode='nearest'``: src = floor(dst*in/out))."""
    assert x.ndim == 5
    for axis, out_size in zip((1, 2, 3), target):
        in_size = x.shape[axis]
        if in_size == int(out_size):
            continue
        idx = np.floor(
            np.arange(int(out_size), dtype=np.float64) * (in_size / int(out_size))
        ).astype(np.int32)
        x = jnp.take(x, idx, axis=axis)
    return x
