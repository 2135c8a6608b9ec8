"""Spatial-parallel plumbing for the fused Pallas pipeline.

Implements SURVEY.md §2.2b the tpu-native way (VERDICT r2 item 2): the
volume's X axis is sharded over the mesh's ``space`` axis and the fused
conv+ReLU+GN kernels (:mod:`unetsulc_tpu.ops.conv_pallas`) run per-shard
in *halo mode* — each device's padded slab buffer carries its neighbors'
boundary x-planes in the ring planes, exchanged with one
``lax.ppermute`` per conv input.  The reference has no equivalent (its
torch model is single-GPU, ref training.py:96-136); the design target is
full-resolution hemispheres whose activations exceed one chip's HBM.

Partition plan (sp_forward in models/unet3d.py):

* **Level 0 sharded** — encoder 0's two convs, decoder 2's pair convs and
  the classification head run on local (S = X/n)-plane slabs.  Level 0
  is where the memory (96^3 x 64ch activation pairs) and >50% of the
  FLOPs live.
* **Pool sharded, POOLED middle replicated** — encoder 1's torch-padded
  max pool runs on the local slabs (it needs only the left halo plane,
  one ppermute) and the POOLED output all-gathers (one bf16 collective
  over ICI, ~1/8 the full-resolution volume); encoders 1-3 + decoders
  0-1 then run the unmodified single-device pipeline identically on
  every device.  No full-resolution buffer is ever replicated, so
  per-device peak activation memory scales with the mesh (the design
  target for volumes exceeding one chip's HBM; pinned by
  test_parallel.py::test_sp_memory_scales).  The post-pool extents
  (X/2+1 — odd) do not divide evenly; replicating from there keeps
  exact single-device numerics where sharding the middle would need
  uneven-slab machinery for a minor fraction of the step's FLOPs.
* **Re-shard at decoder 2** — the trilinear upsample back to full
  resolution computes only the local slab's rows (the X-axis
  interpolation matrix is row-sliced per shard), feeding the sharded
  pair convs.

GroupNorm statistics stay *global*: the kernels' per-shard stat sums are
``psum``'d over the space axis before the lazy affine is formed, so the
normalization is bitwise the same computation as single-device up to
reduction order.

Gradients need no hand-written collectives: ring fills are functional
``ppermute`` + concat, the gather is ``all_gather``, and autodiff
transposes them (ppermute reverses, all_gather becomes psum_scatter);
the kernels' ``halo``/``edge_outputs`` backward emits ring-plane dx that
these transposes route to the owning neighbor.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from unetsulc_tpu.ops import conv_pallas as cp
from unetsulc_tpu.ops.resize import _interp_axis_matmul, _interp_matrix


def ring_fill(
    buf: jnp.ndarray, axis_name: str
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exchange boundary interior planes into the ring planes.

    ``buf``: (K, S+2, plane, cs) local padded shard buffer with zero
    rings.  Returns (buf with rings holding the neighbors' boundary
    planes, valid (S+2,) f32 marking which planes carry real data — ring
    validity is 0 at the global volume edges, where the zero ring IS the
    conv's padding).  Devices at the ends receive ppermute's implicit
    zeros, so no edge masking is needed on the data itself.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    s = buf.shape[1] - 2
    from_left = lax.ppermute(
        buf[:, s], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    from_right = lax.ppermute(
        buf[:, 1], axis_name, [(i, i - 1) for i in range(1, n)]
    )
    filled = jnp.concatenate(
        [from_left[:, None], buf[:, 1 : s + 1], from_right[:, None]], axis=1
    )
    ones = jnp.ones((s,), jnp.float32)
    valid = jnp.concatenate(
        [
            (idx > 0).astype(jnp.float32)[None],
            ones,
            (idx < n - 1).astype(jnp.float32)[None],
        ]
    )
    return filled, valid


def ring_planes_5d(x5: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """(1, S, Y, Z, C) local slab -> (1, S+2, Y, Z, C) with neighbor halo
    planes first/last (zeros at the global volume edges, which is exactly
    the conv's zero padding there).  Feeds the dense entry conv's
    ``ring=True`` mode (ops/conv_pallas.py conv3d_dense_entry)."""
    n = lax.axis_size(axis_name)
    from_left = lax.ppermute(
        x5[:, -1], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    from_right = lax.ppermute(
        x5[:, 0], axis_name, [(i, i - 1) for i in range(1, n)]
    )
    return jnp.concatenate(
        [from_left[:, None], x5, from_right[:, None]], axis=1
    )


def sp_pool_gather(
    buf: jnp.ndarray,
    aff: Optional[jnp.ndarray],
    g: cp.Geom,
    axis_name: str,
):
    """Spatially-sharded torch-padded max pool, then all-gather the POOLED
    output into the replicated middle's buffer (VERDICT r3 item 3).

    (K, S+2, plane, cs) local slabs (zero rings, optional pending GN
    affine) -> ((K, gXp, plane', cs) replicated buffer, global pooled
    Geom) where gX = n*S/2 + 1 — the torch MaxPool3d(2, 2, padding=1)
    extent of the global X = n*S (ops/conv_pallas.py pool_geom).  Only the
    POOLED volume is ever replicated: ~8x fewer elements than gathering
    the full-resolution level-0 output, so per-device peak activation
    memory scales with the mesh (the §2.2b design target; pinned by
    tests/test_parallel.py::test_sp_memory_scales).

    Plane bookkeeping (torch pools input pairs (2j-1, 2j) with -inf
    padding, so pairs straddle the slab boundaries): shard k owns output
    planes [k*S/2, (k+1)*S/2); its first pair's leading input is the left
    neighbor's last plane — one ``ppermute``, masked to -inf on shard 0
    where that position is the global pool padding.  The trailing output
    plane gX-1 = the YZ-pool of global input plane X-1 is computed on the
    last shard and broadcast with a one-plane masked ``psum``.  Values are
    affine-normalized and cast to the storage dtype exactly as
    ``max_pool_buf`` does single-device, so the result is bitwise the
    all-gathered single-device pool (max commutes with resharding).
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    k, xp, ps, cs = buf.shape
    s = g.X
    assert xp == s + 2 and s % 2 == 0, (buf.shape, g)
    gg = cp.pool_geom(cp.make_geom(n * s, g.Y, g.Z))
    assert gg.Y == g.Y // 2 + 1 and gg.Z == g.Z // 2 + 1, (gg, g)

    neg = jnp.asarray(-jnp.inf, buf.dtype)
    b5 = buf.reshape(k, xp, g.Yp, g.Zp, cs)
    if aff is not None:
        a = aff[:, 0, :][:, None, None, None, :]
        b = aff[:, 1, :][:, None, None, None, :]
        xn = (b5.astype(jnp.float32) * a + b).astype(buf.dtype)
    else:
        xn = b5
    mask_yz = jnp.asarray(
        g.interior_mask_rows().reshape(g.Yp, g.Zp, 1) > 0
    )
    xn = jnp.where(mask_yz[None, None], xn, neg)
    local = xn[:, 1 : s + 1]  # (k, S, Yp, Zp, cs) normalized real planes

    from_left = lax.ppermute(
        local[:, -1], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    from_left = jnp.where(idx > 0, from_left, neg)
    planes = jnp.concatenate([from_left[:, None], local], axis=1)
    pooled = lax.reduce_window(
        planes,
        -jnp.inf,
        lax.max,
        (1, 2, 2, 2, 1),
        (1, 2, 2, 2, 1),
        "VALID",
    )[:, :, : gg.Y, : gg.Z]  # (k, S/2, gY, gZ, cs) local output planes
    full = lax.all_gather(pooled, axis_name, axis=1, tiled=True)

    last_yz = lax.reduce_window(
        local[:, -1],
        -jnp.inf,
        lax.max,
        (1, 2, 2, 1),
        (1, 2, 2, 1),
        "VALID",
    )[:, : gg.Y, : gg.Z]
    last = lax.psum(
        jnp.where(idx == n - 1, last_yz, jnp.zeros_like(last_yz)),
        axis_name,
    )
    interior = jnp.concatenate([full, last[:, None]], axis=1)
    out = jnp.pad(
        interior,
        (
            (0, 0),
            (1, gg.Xp - gg.X - 1),
            (1, gg.Yp - gg.Y - 1),
            (1, gg.Zp - gg.Z - 1),
            (0, 0),
        ),
    )
    return out.reshape(k, gg.Xp, gg.plane, cs), gg


def sp_resize_to_slab(
    x5: jnp.ndarray, g_loc: cp.Geom, axis_name: str
) -> jnp.ndarray:
    """Trilinear-resize a replicated (1, X1, Y1, Z1, C) volume to this
    shard's slab (1, S, Y, Z, C) of the full-resolution output.

    Numerically identical to ``resize_trilinear`` (same half-pixel
    matrices, same X->Y->Z application order); the X matrix is row-sliced
    to the local slab so each device computes only its planes.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    s = g_loc.X
    x_in = x5.shape[1]
    m = jnp.asarray(_interp_matrix(x_in, n * s), dtype=x5.dtype)
    m_loc = lax.dynamic_slice(m, (idx * s, 0), (s, x_in))
    out = jnp.moveaxis(jnp.tensordot(x5, m_loc, axes=[[1], [1]]), -1, 1)
    out = _interp_axis_matmul(out, 2, g_loc.Y)
    out = _interp_axis_matmul(out, 3, g_loc.Z)
    return out


def sp_static_shapes_ok(n: int) -> bool:
    """True iff EVERY volume extent the data layer can produce splits into
    valid slabs over ``n`` devices, so the sp Pallas step can be built
    without risking a mid-training shape error.

    The data layer only ever produces X extents that are multiples of 16
    with minimum 32 (``data/voxelize.bucket_shape``: DEFAULT_BUCKET_SIZES
    are multiples of 16, beyond-max rounds up to a multiple of 32, and
    fixed sizes come from ``choose_static_size`` which buckets too).  The
    slab contract is: X % n == 0 (shard_map divisibility), slab S = X/n
    even (``conv_shards``'s paired-plane grid), and S >= 4 (the model's
    minimum extent).  Requiring that for all X in {32, 48, 64, ...}:
    n | gcd(32, 48) = 16; 48/n even rules out 16; 32/n >= 4 rules out > 8
    — leaving exactly n in {2, 4, 8}.  Ineligible values fall back to the
    pjit auto-SPMD XLA path (method/training.py _cached_steps) instead of
    crashing when an awkward bucket appears mid-training.
    """
    return n in (2, 4, 8)
