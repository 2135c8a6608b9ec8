"""Spatial-parallel plumbing for the fused Pallas pipeline.

Implements SURVEY.md §2.2b the tpu-native way (VERDICT r2 item 2): the
volume's X axis is sharded over the mesh's ``space`` axis and the fused
conv+ReLU+GN kernels (:mod:`unetsulc_tpu.ops.conv_pallas`) run per-shard
in *halo mode* — each device's padded slab buffer carries its neighbors'
boundary x-planes in the ring planes, exchanged with one
``lax.ppermute`` per conv input.  The reference has no equivalent (its
torch model is single-GPU, ref training.py:96-136); the design target is
full-resolution hemispheres whose activations exceed one chip's HBM.

Partition plan (sp wiring in models/unet3d.py UNet3D.__call__):

* **Level 0 sharded** — encoder 0's two convs, decoder 2's pair convs and
  the classification head run on local (S = X/n)-plane slabs.  Level 0
  is where the memory (96^3 x 64ch activation pairs) and ~53% of the
  FLOPs live.
* **Pooled level 1 sharded too** (``sp_shard_middle``, default; round-5,
  VERDICT r4 item 4) — the pooled extent gX = X/2 + 1 is odd, so it
  cannot split into uniform slabs; the **slab+E layout** (sp_mid_geom)
  gives every shard its P = S/2 pooled planes plus one extra plane slot:
  the real global trailing plane on the last shard, a duplicate of the
  right neighbor's first plane elsewhere (a valid conv input whose
  output/stats are masked by the kernels' runtime ``valid_out``).
  Encoder 1's pool stays local (sp_pool_local), its DoubleConv and
  decoder 1's pair convs run sharded in halo mode (ring_fill_mid:
  2 ppermutes/conv input, same count as level 0), and decoder 1's skip
  never leaves its shard.  This lifts sp's compute coverage from ~53%
  to ~80% of step FLOPs (Amdahl cap ~2x -> ~5x) at the cost of one
  duplicated plane of compute per shard (~1/P).
* **Level 2 sharded too when the slab splits twice** (``sp_shard_deep``,
  default; round-5): the layout recurses — gX2 = floor(gX1/2) + 1 =
  n*P2 + 1 for P2 = P1/2, so encoder 2's pool runs mid -> mid2 locally
  (sp_pool_local_mid) and encoder 2 + decoder 0 run sharded in the same
  slab+E halo mode (ring_fill_mid and the gathers are generic over P).
  Gated PER SHAPE at trace time (P1 even, P2 >= 4 planes; each bucket
  compiles its own executable), so awkward buckets keep the mid-only
  layout with identical numerics.  Compute coverage reaches ~97% of
  step FLOPs — only level 3 (~2.5%) replicates.
* **Level 3 replicated** — the deepest sharded level's output
  all-gathers (level-2 size x 4i channels under deep, else pooled-size
  x 2i) into the replicated bottom; the symmetric gather feeds each
  replicated decoder input.  No full-resolution buffer is ever
  replicated (pinned by test_parallel.py::test_sp_memory_scales).
  Measured caveat (BASELINE.md round-5 census): per-device PEAK does
  not actually drop at sp=2 — each conv input's ring-halo concat
  (:func:`ring_fill` / :func:`ring_planes_5d`) materializes a fresh
  (S+2)-plane copy of the whole slab in fwd, remat'd bwd, and
  wgrad/dx, ~2.3x the buffer count at ~0.5x the size.  The fix (pass
  the two halo planes as separate kernel operands) is the top sp
  lever; until then sp buys compute parallelism and collective-size
  scaling, not peak-memory reduction.
  ``sp_shard_middle=False`` restores the round-4 layout (replicate
  everything past encoder 1's pool, one pooled-size gather).
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
    the full-resolution level-0 output (the §2.2b design target; pinned
    by tests/test_parallel.py::test_sp_memory_scales; see the module
    docstring for the measured peak-memory caveat).

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


def sp_mid_geom(g: cp.Geom, axis_name: str) -> cp.Geom:
    """Local slab+E geometry of the sharded POOLED middle level.

    The pooled extent gX = n*S/2 + 1 is odd, so it cannot split into
    uniform slabs.  The mid layout solves this with one extra plane slot
    per shard: shard k's buffer holds its P = S/2 pooled planes
    [k*P, (k+1)*P) at interior positions 1..P plus an **E plane** at
    position P+1 — the global trailing plane gX-1 on the LAST shard, a
    duplicate of the right neighbor's first plane everywhere else (a
    valid conv INPUT whose output is masked, conv_pallas.py
    ``valid_out``).  Uniform shapes keep shard_map happy; the overhead is
    one duplicated plane of compute per shard (~1/P).

    The returned Geom has X = P+1 (slab + E), Xp = P+3 (rings at 0 and
    P+2 — note Xp is odd, which the halo kernels allow: they only
    require Xp == X + 2), and the global pooled level's Yp/Zp paddings so
    gathers are plane-layout-compatible.
    """
    n = lax.axis_size(axis_name)
    s = g.X
    assert s % 2 == 0, (g, "mid sharding needs even level-0 slabs")
    p = s // 2
    gg = cp.pool_geom(cp.make_geom(n * s, g.Y, g.Z))
    return cp.Geom(p + 1, gg.Y, gg.Z, p + 3, gg.Yp, gg.Zp)


def sp_pool_local(
    buf: jnp.ndarray,
    aff: Optional[jnp.ndarray],
    g: cp.Geom,
    axis_name: str,
):
    """Spatially-sharded torch-padded max pool into the LOCAL slab+E
    layout (no gather — the sharded-middle counterpart of
    :func:`sp_pool_gather`).

    (K, S+2, plane, cs) level-0 local slabs -> ((K, P+3, plane', cs)
    local mid buffer, mid Geom) where P = S/2: interior positions 1..P
    hold this shard's pooled output planes, position P+1 (E) holds the
    global trailing plane gX-1 on the last shard (zeros elsewhere — the
    next conv's :func:`ring_fill_mid` fills the duplicate), rings are
    zeros.  Plane bookkeeping and normalization are identical to
    :func:`sp_pool_gather`, so gathering these slabs reproduces its
    output bitwise.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    k, xp, ps, cs = buf.shape
    s = g.X
    assert xp == s + 2 and s % 2 == 0, (buf.shape, g)
    gm = sp_mid_geom(g, axis_name)
    p = gm.X - 1

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
    )[:, :, : gm.Y, : gm.Z]  # (k, P, gY, gZ, cs) owned output planes

    # trailing plane T = YZ-pool of the global input plane X-1: computed
    # where it lives (the last shard); other shards' E stays zero until
    # ring_fill_mid duplicates their neighbor's first plane into it
    last_yz = lax.reduce_window(
        local[:, -1],
        -jnp.inf,
        lax.max,
        (1, 2, 2, 1),
        (1, 2, 2, 1),
        "VALID",
    )[:, : gm.Y, : gm.Z]
    e = jnp.where(idx == n - 1, last_yz, jnp.zeros_like(last_yz))
    interior = jnp.concatenate([pooled, e[:, None]], axis=1)
    out = jnp.pad(
        interior,
        (
            (0, 0),
            (1, 1),
            (1, gm.Yp - gm.Y - 1),
            (1, gm.Zp - gm.Z - 1),
            (0, 0),
        ),
    )
    return out.reshape(k, gm.Xp, gm.plane, cs), gm


def sp_pool_local_mid(
    buf: jnp.ndarray,
    aff: Optional[jnp.ndarray],
    g_mid: cp.Geom,
    axis_name: str,
):
    """Torch-padded max pool from one slab+E mid layout into the NEXT
    (mid2) slab+E layout — the level 1 -> 2 counterpart of
    :func:`sp_pool_local` (round-5 deep sharding, ``sp_shard_deep``).

    The structure recurses: the level-2 extent gX2 = floor(gX1/2) + 1
    with gX1 = n*P1 + 1 equals n*P2 + 1 for P2 = P1/2, so shard k owns
    level-2 planes [k*P2, (k+1)*P2) plus the usual E slot.  Plane
    bookkeeping (torch pools input pairs (2j-1, 2j) with -inf padding):

    * output j in [k*P2, (k+1)*P2) needs pooled-level planes
      [k*P1 - 1, (k+1)*P1 - 1) — the owned slab plus the left neighbor's
      LAST OWNED plane (one ppermute; -inf on shard 0 where that position
      is the global pool padding);
    * the unowned E duplicate (zero on non-last shards — kernel
      ``valid_out`` masking) is never pooled: the pairs use only
      from_left + owned[0 .. P1-2];
    * the global trailing plane T2 = max(plane gX1-2, plane gX1-1) lives
      entirely on the LAST shard (its last owned plane and its REAL E =
      T1), YZ-pooled there and stored in the mid2 E slot.

    Values are affine-normalized and cast exactly as ``max_pool_buf``
    does single-device, so gathering the result reproduces the
    single-device level-2 pool bitwise.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    k, xp, ps, cs = buf.shape
    p1 = g_mid.X - 1
    assert xp == p1 + 3 and p1 % 2 == 0, (buf.shape, g_mid)
    p2 = p1 // 2
    full_g1 = cp.make_geom(n * p1 + 1, g_mid.Y, g_mid.Z)
    assert (full_g1.Yp, full_g1.Zp) == (g_mid.Yp, g_mid.Zp), (
        full_g1, g_mid,
    )
    gg2 = cp.pool_geom(full_g1)
    gm2 = cp.Geom(p2 + 1, gg2.Y, gg2.Z, p2 + 3, gg2.Yp, gg2.Zp)

    neg = jnp.asarray(-jnp.inf, buf.dtype)
    b5 = buf.reshape(k, xp, g_mid.Yp, g_mid.Zp, cs)
    if aff is not None:
        a = aff[:, 0, :][:, None, None, None, :]
        b = aff[:, 1, :][:, None, None, None, :]
        xn = (b5.astype(jnp.float32) * a + b).astype(buf.dtype)
    else:
        xn = b5
    mask_yz = jnp.asarray(
        g_mid.interior_mask_rows().reshape(g_mid.Yp, g_mid.Zp, 1) > 0
    )
    xn = jnp.where(mask_yz[None, None], xn, neg)
    owned = xn[:, 1 : p1 + 1]  # (k, P1, Yp1, Zp1, cs) owned planes

    from_left = lax.ppermute(
        owned[:, -1], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    from_left = jnp.where(idx > 0, from_left, neg)
    planes = jnp.concatenate([from_left[:, None], owned], axis=1)
    pooled = lax.reduce_window(
        planes,
        -jnp.inf,
        lax.max,
        (1, 2, 2, 2, 1),
        (1, 2, 2, 2, 1),
        "VALID",
    )[:, :, : gm2.Y, : gm2.Z]  # (k, P2, gY2, gZ2, cs) owned outputs

    # T2 = max over X of (last owned plane, real E = T1), last shard only
    # — note the unowned E is ZERO (not -inf) off the last shard, but the
    # result is gated to the last shard so it never leaks
    t_in = jnp.maximum(owned[:, -1], xn[:, p1 + 1])
    t_yz = lax.reduce_window(
        t_in,
        -jnp.inf,
        lax.max,
        (1, 2, 2, 1),
        (1, 2, 2, 1),
        "VALID",
    )[:, : gm2.Y, : gm2.Z]
    e2 = jnp.where(idx == n - 1, t_yz, jnp.zeros_like(t_yz))
    interior = jnp.concatenate([pooled, e2[:, None]], axis=1)
    out = jnp.pad(
        interior,
        (
            (0, 0),
            (1, 1),
            (1, gm2.Yp - gm2.Y - 1),
            (1, gm2.Zp - gm2.Z - 1),
            (0, 0),
        ),
    )
    return out.reshape(k, gm2.Xp, gm2.plane, cs), gm2


def ring_fill_mid(
    buf: jnp.ndarray, axis_name: str
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Ring + E-plane exchange for the slab+E mid layout.

    ``buf``: (K, P+3, plane, cs) local mid buffer (positions: 0 = left
    ring, 1..P = owned slab, P+1 = E, P+2 = right ring).  Returns
    (filled, valid_in (P+3,), valid_out (P+3,)):

    * left ring  <- left neighbor's plane P (its last owned plane);
    * E          <- right neighbor's plane 1 on shards 0..n-2 (the
      duplicated conv input for the slab's last output plane); the LAST
      shard keeps its own E — the real global trailing plane;
    * right ring <- right neighbor's plane 2 (the plane after the
      duplicate, so E's own conv output is exact on the last shard and
      correctly masked elsewhere).

    valid_in: rings are invalid at the global volume edges (the zero
    ring IS the conv's padding there); the E plane is always real data.
    valid_out: only positions 1..P everywhere, plus E on the last shard
    — each global plane is produced by exactly one shard
    (conv_pallas.py ``valid_out`` masking).
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    p = buf.shape[1] - 3
    from_left = lax.ppermute(
        buf[:, p], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    pair = lax.ppermute(
        buf[:, 1:3], axis_name, [(i, i - 1) for i in range(1, n)]
    )
    e = jnp.where(idx == n - 1, buf[:, p + 1], pair[:, 0])
    filled = jnp.concatenate(
        [
            from_left[:, None],
            buf[:, 1 : p + 1],
            e[:, None],
            pair[:, 1][:, None],
        ],
        axis=1,
    )
    ones = jnp.ones((p,), jnp.float32)
    one = jnp.ones((1,), jnp.float32)
    zero = jnp.zeros((1,), jnp.float32)
    last = (idx == n - 1).astype(jnp.float32)[None]
    valid_in = jnp.concatenate(
        [(idx > 0).astype(jnp.float32)[None], ones, one,
         (idx < n - 1).astype(jnp.float32)[None]]
    )
    valid_out = jnp.concatenate([zero, ones, last, zero])
    return filled, valid_in, valid_out


def sp_mid_gather(
    buf: jnp.ndarray, g_mid: cp.Geom, axis_name: str
) -> Tuple[jnp.ndarray, cp.Geom]:
    """All-gather a slab+E mid buffer into the replicated full pooled
    volume: (K, P+3, plane, cs) local -> ((K, gXp, plane, cs) replicated,
    full pooled Geom).

    Still a POOLED-size collective (the §2.2b memory contract:
    test_parallel.py::test_sp_memory_scales) — only now it carries the
    sharded middle level's OUTPUT (2i channels) instead of the pool's
    input-width volume.  The E plane is exactly zero on non-last shards
    (kernel ``valid_out`` masking), so the trailing plane psum picks the
    last shard's real value.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    k, xp, ps, cs = buf.shape
    p = g_mid.X - 1
    assert xp == p + 3, (buf.shape, g_mid)
    gx = n * p + 1
    gg = cp.make_geom(gx, g_mid.Y, g_mid.Z)
    assert (gg.Yp, gg.Zp) == (g_mid.Yp, g_mid.Zp), (gg, g_mid)
    b5 = buf.reshape(k, xp, g_mid.Yp, g_mid.Zp, cs)
    slabs = b5[:, 1 : p + 1]
    full = lax.all_gather(slabs, axis_name, axis=1, tiled=True)
    e = b5[:, p + 1]
    t = lax.psum(jnp.where(idx == n - 1, e, jnp.zeros_like(e)), axis_name)
    interior = jnp.concatenate([full, t[:, None]], axis=1)
    out = jnp.pad(
        interior,
        ((0, 0), (1, gg.Xp - gg.X - 1), (0, 0), (0, 0), (0, 0)),
    )
    return out.reshape(k, gg.Xp, gg.plane, cs), gg


def sp_resize_to_slab_mid(
    x5: jnp.ndarray, g_mid: cp.Geom, axis_name: str
) -> jnp.ndarray:
    """Trilinear-resize a replicated (1, X2, Y2, Z2, C) volume to this
    shard's slab+E rows of the pooled middle level: (1, P+1, gY, gZ, C).

    Row block [k*P, k*P + P] of the X interpolation matrix: the P owned
    planes plus the E row — row (k+1)*P is the right neighbor's first
    plane (whose value :func:`ring_fill_mid` would deliver identically:
    same matrix row against the same replicated input), and on the last
    shard it is the real trailing plane gX-1.  Numerically identical to
    ``resize_trilinear`` (same half-pixel matrices, same X->Y->Z order).
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    p = g_mid.X - 1
    x_in = x5.shape[1]
    gx = n * p + 1
    m = jnp.asarray(_interp_matrix(x_in, gx), dtype=x5.dtype)
    m_loc = lax.dynamic_slice(m, (idx * p, 0), (p + 1, x_in))
    out = jnp.moveaxis(jnp.tensordot(x5, m_loc, axes=[[1], [1]]), -1, 1)
    out = _interp_axis_matmul(out, 2, g_mid.Y)
    out = _interp_axis_matmul(out, 3, g_mid.Z)
    return out


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
