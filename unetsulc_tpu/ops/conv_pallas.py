"""Fused 'crg'-block Pallas kernels: GN-apply -> conv3x3x3 -> ReLU -> GN-stats.

This is the round-2 performance centerpiece (VERDICT.md item 1).  The XLA
lowering of the reference hot loop (ref training.py:198-217) tiles the 96^3
volumes into a blocked conv layout ([96,96,8,13,C] with z padded to 104)
and every surrounding elementwise/GN/relayout pass inherits it — the
round-1 profile showed ~125 ms of memory-bound tail around the conv
fusions.  These kernels instead keep activations in ONE canonical layout
and fuse the whole block.

Layout
======
A volume lives in HBM as ``(K, Xp, plane, cs)``: channels split into K
shards of width ``cs`` (Mosaic cannot slice the lane dimension at
sub-shard granularity, so shards are addressed by a leading index), each
zero-padded x-plane flattened to ``plane = Yp*Zp`` row-major (y, z) rows
with channels on lanes.  ``Zp`` is a multiple of 16.

Tap-merged matmuls (the v4 rewrite)
===================================
The naive kernel issued 27 dots of (plane, cs) @ (cs, cso) per grid step;
at cs = 64 that feeds the 128x128 MXU a K=64/N=64 problem (<=25%
utilization; 13-19 TF/s measured).  v4 merges the three dz taps into the
contraction dimension: a VMEM slab per x-plane holds
``[x[r-1], x[r], x[r+1]]`` lane-concatenated (width 3*cs), so one dot of
(plane, 3cs) @ (3cs, cso) covers a whole (dx, dy) tap column — K=192 at
cs=64 (75% K-passes), K=384 at cs=128 (100%).  The dy taps become row
offsets (+-Zp) into the slab, whose ``Zp`` guard rows on both sides keep
them in bounds and zero; dx indexes one of three slabs.  9 large dots per
plane instead of 27 small ones.

Slabs roll: each grid step normalizes and lane-concatenates ONLY the
incoming plane t+1 into slab ``(t+1) % 3`` (two sublane rolls for the
+-1-row chunks), so build cost is one plane, not three.  The forward
grid is ``(x-planes, in-shards)`` with the in-shard axis fastest; the
rolling slabs are per in-shard.

The forward kernel applies the *lazy GroupNorm apply* of the previous
block as a per-channel affine under the interior mask while building the
slab (conv zero-padding must stay zero; the mask also neutralizes the
clamped halo fetch at the volume end), runs the 9 tap-column matmuls on
the MXU into per-out-shard fp32 accumulators, and on the last in-shard
adds bias (plus an optional ``partial`` pre-activation accumulator from a
previous call — how multi-input decoder blocks compose), applies ReLU +
the interior mask, accumulates per-channel sum / sum-of-squares for THIS
block's GroupNorm, and writes the output plane.  One streamed HBM read of
x, one write of y — versus XLA's separate conv / stats / apply / relayout
passes.

GroupNorm itself is never materialized: its per-channel affine
``a = inv*scale, b = bias - mean*a`` (computed from the stat sums by tiny
JAX math, ``gn_affine_from_sums``) is consumed lazily by the next conv /
pool / resize / classification head.

Backward = the same conv kernel with mirrored+transposed tap shards (dx)
plus a per-tap-column contraction kernel (dW, same slabs, contracting
over plane rows); the ReLU/stats cotangent and d(affine) are fused JAX
elementwise passes.  ``fused_conv_block`` wires it all into
``jax.custom_vjp`` so plain autodiff over the model yields exact
gradients.

Decoder blocks pass TWO inputs (skip, upsampled): the WIDER branch's
conv writes a pre-activation ``partial`` buffer that the narrower
branch's call consumes (the finalizing call has the smaller slab working
set, so the extra partial stream costs it less pipelining headroom) —
the channel concat never exists (same linearity trick as
models.unet3d.SplitConv3; the transfer-learning contract and param
naming are untouched), and each branch keeps its natural shard width.

Reference semantics preserved: 'crg' order conv->ReLU->GroupNorm with
zero padding included in GN statistics (SURVEY.md §7 hard part #2); the
affine/stat math matches ops.groupnorm bit-for-bit in fp32.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_SHARD = 128  # widest lane shard; 128 lanes = full MXU contraction rows
_VMEM_LIMIT = 100 * 1024 * 1024
# phase-buffer budget for the K-folded fwd/dx kernels (see conv_shards):
# the flagship level-0 64-wide case (3 x 10976 x 576 bf16 = 37.9 MB) and
# the quarter-res 256-in mid-level case (41 MB) must pass; the 128-wide
# full-res case (75.9 MB) must not (no headroom left for the input/output
# double buffering)
_KFOLD9_BUDGET = 44 * 1024 * 1024


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def shard_width(c: int) -> int:
    """Default channel-shard width for a C-channel tensor."""
    if c >= MAX_SHARD:
        assert c % MAX_SHARD == 0, c
        return MAX_SHARD
    return c


@dataclasses.dataclass(frozen=True)
class Geom:
    """Padded-buffer geometry for one resolution level.

    Interior volume (X, Y, Z) sits at offset (1, 1, 1) inside the padded
    (Xp, Yp, Zp) box; Zp % 16 == 0 (aligned taps), Xp/Yp even (pooling
    pairs).
    """

    X: int
    Y: int
    Z: int
    Xp: int
    Yp: int
    Zp: int

    @property
    def plane(self) -> int:  # rows per stored x-plane
        return self.Yp * self.Zp

    @property
    def voxels(self) -> int:
        return self.X * self.Y * self.Z

    def interior_mask_rows(self) -> np.ndarray:
        """(plane, 1) float32: 1 on interior (y, z) rows, 0 on padding."""
        m = np.zeros((self.Yp, self.Zp), np.float32)
        m[1 : 1 + self.Y, 1 : 1 + self.Z] = 1.0
        return m.reshape(self.plane, 1)


def make_geom(x: int, y: int, z: int) -> Geom:
    return Geom(
        x,
        y,
        z,
        _round_up(x + 2, 2),
        _round_up(y + 2, 2),
        _round_up(z + 2, 16),
    )


def pad_to_geom(x5: jnp.ndarray, g: Geom, cs: Optional[int] = None) -> jnp.ndarray:
    """(1, X, Y, Z, C) -> (K, Xp, plane, cs) zero-padded shard buffer."""
    assert x5.shape[:4] == (1, g.X, g.Y, g.Z), (x5.shape, g)
    c = x5.shape[-1]
    cs = cs or shard_width(c)
    k = c // cs
    xp = jnp.pad(
        x5[0],
        (
            (1, g.Xp - g.X - 1),
            (1, g.Yp - g.Y - 1),
            (1, g.Zp - g.Z - 1),
            (0, 0),
        ),
    )
    return xp.reshape(g.Xp, g.plane, k, cs).transpose(2, 0, 1, 3)


def unpad_from_geom(buf: jnp.ndarray, g: Geom) -> jnp.ndarray:
    """(K, Xp, plane, cs) -> (1, X, Y, Z, C) interior view."""
    k, xp, ps, cs = buf.shape
    x5 = buf.transpose(1, 2, 0, 3).reshape(g.Xp, g.Yp, g.Zp, k * cs)
    return x5[1 : 1 + g.X, 1 : 1 + g.Y, 1 : 1 + g.Z, :][None]


def shard_weights(
    w: jnp.ndarray, cins: Sequence[int], cout: int, csi: Optional[int] = None
):
    """(3,3,3,Cin_total,Cout) DHWIO -> per-branch (Kin, Kout, 27, csi, cso).

    Tap index = dx'*9 + dy'*3 + dz' (row-major, d' = d+1).  When ``csi``
    is None each branch gets its own natural shard width."""
    taps = w.reshape(27, sum(cins), cout)
    cso = shard_width(cout)
    kout = cout // cso
    out, c0 = [], 0
    for ci in cins:
        cw = csi or shard_width(ci)
        kin = ci // cw
        wb = taps[:, c0 : c0 + ci, :]
        wb = wb.reshape(27, kin, cw, kout, cso).transpose(1, 3, 0, 2, 4)
        out.append(wb)
        c0 += ci
    return out


def mirror_transpose_shards(wb: jnp.ndarray) -> jnp.ndarray:
    """(Kin, Kout, 27, csi, cso) -> (Kout, Kin, 27, cso, csi) mirrored.

    Turns forward weight shards into transposed-conv shards for the dx
    pass: conv(dconv, mirror_transpose(W)) == conv^T(dconv, W)."""
    return jnp.flip(wb, axis=2).transpose(1, 0, 2, 4, 3)


def pack_weights_zcat(wb: jnp.ndarray) -> jnp.ndarray:
    """(Kin, Kout, 27, cs, cso) -> (Kin, Kout, 3, 3, 3*cs, cso).

    Merges the dz tap axis into the contraction dim, matching the slab's
    lane-concat order (dz-major, then channel)."""
    kin, kout, _, cs, cso = wb.shape
    return wb.reshape(kin, kout, 3, 3, 3, cs, cso).reshape(
        kin, kout, 3, 3, 3 * cs, cso
    )


def pack_weights_dyfold(wb: jnp.ndarray):
    """(Kin, Kout, 27, cs, cso) -> (wac (Kin,Kout,3,3cs,2cso), wb_mid
    (Kin,Kout,3,3cs,cso)).

    The round-3 dy-fold packing: dz merges into the contraction dim (slab
    lane-concat order, as :func:`pack_weights_zcat`) and the dy = 0/2 tap
    columns merge into ONE output-dim pair [A|C] — a (plane, 3cs) @
    (3cs, 2cso) dot per dx covers them both, doubling MXU column
    utilization for 64-wide out-shards (the round-2 ceiling: N = cso).
    The dy = 1 (no row shift) column stays its own dot.  The product's A/C
    blocks are combined by +-Zp row shifts and one lane roll
    (``_combine_dy`` in the kernel); Mosaic cannot lane-slice values at
    sub-tile offsets, which rules out the naive 3cso-wide single dot."""
    kin, kout, _, cs, cso = wb.shape
    w = wb.reshape(kin, kout, 3, 3, 3, cs, cso)  # [dx, dy, dz, ci, co]
    w = w.transpose(0, 1, 2, 4, 5, 3, 6)  # [dx, dz, ci, dy, co]
    wac = jnp.concatenate([w[..., 0, :], w[..., 2, :]], axis=-1).reshape(
        kin, kout, 3, 3 * cs, 2 * cso
    )
    wmid = w[..., 1, :].reshape(kin, kout, 3, 3 * cs, cso)
    return wac, wmid


def pack_weights_dyfold_merged(wb: jnp.ndarray) -> jnp.ndarray:
    """(Kin, Kout, 27, cs, cso) -> (Kin, Kout, 3, 3cs, 3cso), [A|C|B].

    Round-5 N-merge experiment (``UNETSULC_NMERGE``): the dy-pair [A|C]
    and the middle column B issue as ONE (plane, 3cs) @ (3cs, 3cso) dot
    per dx instead of a pair dot plus a middle dot — the MXU probe
    measures 7.45 µs for a K=192/N=192 dot vs 4.69 + 4.69 µs for the
    N=128 + N=64 pair it replaces (/tmp/r5_mxu.log).  Extraction needs
    no sub-tile lane slices: :func:`_combine_dy_merged` shifts rows at
    the full merged width and uses two lane rolls, all offset-0 ops."""
    wac, wmid = pack_weights_dyfold(wb)
    return jnp.concatenate([wac, wmid], axis=-1)


def pack_weights_dxfold9(wb: jnp.ndarray):
    """(Kin, Kout, 27, cs, cso) -> (wac9 (Kin,Kout,9cs,2cso), wmid9
    (Kin,Kout,9cs,cso)).

    The round-3 K-fold packing: on top of the dy-fold (dz in the
    contraction dim, dy = 0/2 as an [A|C] output pair), the dx tap axis
    ALSO merges into the contraction dim — one (plane, 9cs) @ (9cs, N)
    dot per output plane instead of three K = 3cs dots.  K-block order is
    [dx=1 | dx=0 | dx=2]: the kernel's phase buffers build each incoming
    plane's slab at lane offset 0 of its own output's buffer (aligned
    build) and copy it into the two neighbors' buffers at offsets 3cs/6cs
    (store offsets Mosaic supports; the copy READS at offset 0)."""
    kin, kout, _, cs, cso = wb.shape
    wac, wmid = pack_weights_dyfold(wb)  # (..., 3, 3cs, {2cso|cso})
    order = (1, 0, 2)

    def fold9(wt):
        return jnp.concatenate([wt[:, :, d] for d in order], axis=2)

    return fold9(wac), fold9(wmid)


def pack_weights_zcat9(wb: jnp.ndarray) -> jnp.ndarray:
    """(Kin, Kout, 27, cs, cso) -> (Kin, Kout, 3dy, 9cs, cso).

    The unfolded (cso == 128) K-fold packing: dz and dx both merge into
    the contraction dim (same [dx=1 | dx=0 | dx=2] K-block order as
    :func:`pack_weights_dxfold9`); dy stays a row offset into the guarded
    phase buffers — 3 dots of K = 9cs per output plane instead of 9 of
    K = 3cs."""
    wz = pack_weights_zcat(wb)  # (Kin, Kout, 3dx, 3dy, 3cs, cso)
    return jnp.concatenate([wz[:, :, d] for d in (1, 0, 2)], axis=3)


# ---------------------------------------------------------------------------
# forward / plain-conv kernel
# ---------------------------------------------------------------------------


def _norm_plane(src_plane, ab, mask, px, g: Geom, has_affine: bool,
                valid=None):
    """(plane, cs) -> fp32-normalized, interior-masked plane (src dtype).

    px is the UNCLAMPED plane index: out-of-range halo planes (clamped
    fetches at the volume ends) mask to exact zeros when the affine path
    is active.  Without an affine the input is trusted to be zero on all
    padding (true for conv outputs of these kernels and for cotangents).

    ``valid`` (spatial-parallel halo mode) overrides the static
    plane-index check with a runtime per-plane validity scalar: ring
    planes filled with a neighbor's boundary data are normalized like
    interior planes (valid = 1), while at the global volume edges the
    zero ring must NOT get the affine's +b (valid = 0)."""
    if not has_affine:
        return src_plane
    a = ab[0:1, :]
    b = ab[1:2, :]
    if valid is not None:
        mj = mask * valid
    else:
        mj = mask * jnp.where((px >= 1) & (px <= g.X), 1.0, 0.0)
    return ((src_plane.astype(jnp.float32) * a + b) * mj).astype(src_plane.dtype)


def _combine_dy(ac, b, ps: int, cso: int, zp: int):
    """Fold a dy-pair product [A|C] (ps, 2cso) plus the middle product B
    (ps, cso) into the output plane (ps, cso).

    ``y[r] = A[r - zp] + B[r] + C[r + zp]`` with out-of-range rows
    contributing zero (they correspond to the slab's zero guard rows in
    the unfolded formulation).  The row shifts happen at the FULL [A|C]
    width (offset-0 operations Mosaic supports); one lane roll brings the
    shifted C block to lane 0 (left-by-cso == right-by-cso at width
    2cso), and a single offset-0 lane slice extracts the sum."""
    pad2 = jnp.zeros((zp, 2 * cso), ac.dtype)
    acd = jnp.concatenate([pad2, ac[: ps - zp]], axis=0)  # A[r-zp] @ lane 0
    acu = jnp.concatenate([ac[zp:], pad2], axis=0)  # C[r+zp] @ lane cso
    c0 = pltpu.roll(acu, cso, axis=1)
    return b + (acd + c0)[:, 0:cso]


def _combine_dy_merged(tm, ps: int, cso: int, zp: int):
    """Fold ONE merged dy product [A|C|B] (ps, 3cso) into the output
    plane (ps, cso): ``y[r] = A[r - zp] + B[r] + C[r + zp]``.

    Same row-shift scheme as :func:`_combine_dy` at the merged width:
    the down-shift leaves A[r-zp] on lanes [0, cso); a 2cso roll of the
    up-shift brings C[r+zp] (lanes [cso, 2cso)) to lane 0; a cso roll
    of ``tm`` brings B (lanes [2cso, 3cso)) to lane 0.  All shifts,
    rolls, and the final slice are offset-0 operations Mosaic
    supports."""
    pad3 = jnp.zeros((zp, 3 * cso), tm.dtype)
    acd = jnp.concatenate([pad3, tm[: ps - zp]], axis=0)  # A[r-zp] @ 0
    acu = jnp.concatenate([tm[zp:], pad3], axis=0)  # C[r+zp] @ lane cso
    out = acd + pltpu.roll(acu, 2 * cso, axis=1) + pltpu.roll(tm, cso, axis=1)
    return out[:, 0:cso]


def _build_slab(zcat, ki, si, norm, ps: int, cs: int, sg: int):
    """Write the dz lane-concat of ``norm`` into slab (ki, si).

    Slab rows [sg, sg+ps) hold [norm[r-1], norm[r], norm[r+1]] on lanes;
    the single out-of-plane edge row per shifted chunk is zeroed.  Guard
    rows ([0, sg) and [sg+ps, ...)) are zeroed once at grid start and
    never written again."""
    zero_row = jnp.zeros((1, cs), norm.dtype)
    # dz = -1 chunk: rows shift down by one; row 0 reads out-of-plane -> 0
    zcat[ki, si, sg + 1 : sg + ps, 0:cs] = norm[0 : ps - 1, :]
    zcat[ki, si, sg : sg + 1, 0:cs] = zero_row
    # dz = 0 chunk: direct copy
    zcat[ki, si, sg : sg + ps, cs : 2 * cs] = norm
    # dz = +1 chunk: rows shift up by one; last row reads out-of-plane -> 0
    zcat[ki, si, sg : sg + ps - 1, 2 * cs : 3 * cs] = norm[1:ps, :]
    zcat[ki, si, sg + ps - 1 : sg + ps, 2 * cs : 3 * cs] = zero_row


def _fwd_kernel(
    *refs,
    g: Geom,
    kin: int,
    kout: int,
    has_affine: bool,
    has_partial: bool,
    relu: bool,
    stats: bool,
    out_dtype,
    fold: bool,
    halo: bool,
    edge_outputs: bool,
    has_valid: bool,
    has_vout: bool,
    post: bool,
    kfold: bool,
    nmerge: bool,
):
    i = 0
    xnext = refs[i]  # (1, 1, plane, cs) block: incoming plane t+1 (clamped)
    i += 1
    xcur_ref = None
    if halo:
        xcur_ref = refs[i]  # (1, 1, plane, cs) block: plane t (for slab 0)
        i += 1
    ab_ref = None
    if has_affine:
        ab_ref = refs[i]  # (1, 2, cs)
        i += 1
    valid_ref = None
    if has_valid:
        valid_ref = refs[i]  # (Xp,) f32 per-plane input validity (SMEM)
        i += 1
    vout_ref = None
    if has_vout:
        vout_ref = refs[i]  # (Xp,) f32 per-plane OUTPUT validity (SMEM)
        i += 1
    wacm_ref = None
    if fold and nmerge:
        wacm_ref = refs[i]  # (1, kout, 3, 3cs, 3cso): [A|C|B] merged
        i += 1
    elif fold:
        # kfold: (1, kout, 9cs, {2cso|cso}) — dx merged into K
        wac_ref = refs[i]  # (1, kout, 3, 3cs, 2cso): dy = 0/2 pair
        wmid_ref = refs[i + 1]  # (1, kout, 3, 3cs, cso): dy = 1
        i += 2
    else:
        wz_ref = refs[i]  # (1, kout, 3, 3, 3cs, cso)
        i += 1
    bias_ref = refs[i]  # (kout, 1, cso)
    mask_ref = refs[i + 1]  # (plane, 1)
    i += 2
    part_ref = None
    if has_partial:
        part_ref = refs[i]  # (kout, 1, plane, cso) block
        i += 1
    post_ab_ref = post_x_ref = None
    if post:
        post_ab_ref = refs[i]  # (kout, 2, cso): the forward block's affine
        post_x_ref = refs[i + 1]  # (kout, 1, plane, cso): forward input x
        i += 2
    y_ref = refs[i]  # (kout, 1, plane, cso) block
    sums_ref = refs[i + 1]  # (kout, 2, cso)
    i += 2
    zcat, acc, acc2, stat_acc = refs[i : i + 4]

    t = pl.program_id(0)
    ki = pl.program_id(1)
    n_t = pl.num_programs(0)
    n_ki = pl.num_programs(1)
    ps = g.plane
    sg = g.Zp  # row guard on each side of a slab (covers the +-Zp dy taps)
    cs = xnext.shape[-1]
    mask = mask_ref[...]

    @pl.when(t == 0)
    def _():  # plane 0 is conv padding: its slab (and all guards) = zeros
        zcat[ki] = jnp.zeros(zcat.shape[1:], zcat.dtype)

    if halo:
        # spatial-parallel mode: ring plane 0 carries the LEFT neighbor's
        # boundary plane (zero at the global edge) — build it into slab 0
        # at grid start so interior plane 1's conv sees the halo
        @pl.when(t == 0)
        def _():
            norm0 = _norm_plane(
                xcur_ref[0, 0], ab_ref[0] if has_affine else None,
                mask, 0, g, has_affine,
                valid=valid_ref[0] if has_valid else None,
            )
            _build_slab(zcat, ki, 0, norm0, ps, cs, sg)

    # build the incoming plane t+1 into slab (t+1) % 3
    vnext = (
        valid_ref[jnp.minimum(t + 1, n_t - 1)] if has_valid else None
    )
    norm = _norm_plane(xnext[0, 0], ab_ref[0] if has_affine else None,
                       mask, t + 1, g, has_affine, valid=vnext)
    if edge_outputs and not has_affine:
        # the clamped end fetch (plane Xp -> plane Xp-1) must build as
        # zeros: ring-plane outputs are real gradients in this mode and
        # must not read a duplicated plane (the affine path's valid/px
        # masking handles this on its own)
        norm = norm * jnp.where(t + 1 <= n_t - 1, 1.0, 0.0).astype(
            norm.dtype
        )
    if kfold:
        # K-fold phase buffers (zcat: (kin, 3, ps, 9cs)): output plane o
        # contracts ONE (ps, 9cs) operand [slab_o | slab_{o-1} | slab_{o+1}]
        # against dx-merged weights.  The incoming plane p = t+1's slab is
        # built ONCE at lane offset 0 of phase p%3 (its own output's
        # buffer), then copied into the two neighbor outputs' buffers —
        # trading 2 extra (ps, 3cs) stores per plane for a 3x wider MXU
        # contraction (K = 9cs vs 3cs).
        w3 = 3 * cs
        # the fold path needs no row guards (dy lives on the [A|C] lane
        # pair); the unfolded path keeps them for its +-Zp dy offsets
        sk = 0 if fold else sg
        phi1 = jax.lax.rem(t + 1, 3)
        zero_row = jnp.zeros((1, cs), norm.dtype)
        zcat[ki, phi1, sk + 1 : sk + ps, 0:cs] = norm[: ps - 1, :]
        zcat[ki, phi1, sk : sk + 1, 0:cs] = zero_row
        zcat[ki, phi1, sk : sk + ps, cs : 2 * cs] = norm
        zcat[ki, phi1, sk : sk + ps - 1, 2 * cs : 3 * cs] = norm[1:ps, :]
        zcat[ki, phi1, sk + ps - 1 : sk + ps, 2 * cs : 3 * cs] = zero_row
        slab = zcat[ki, phi1, sk : sk + ps, 0:w3]
        # as plane (o-1) for output o = t+2: K block 1
        zcat[ki, jax.lax.rem(t + 2, 3), sk : sk + ps, w3 : 2 * w3] = slab
        # as plane (o+1) for output o = t: K block 2
        zcat[ki, jax.lax.rem(t, 3), sk : sk + ps, 2 * w3 : 3 * w3] = slab
    else:
        _build_slab(zcat, ki, jax.lax.rem(t + 1, 3), norm, ps, cs, sg)

    if edge_outputs:
        # compute every plane including the rings: their values are the
        # cotangents w.r.t. halo-filled inputs, routed back through the
        # ppermute's VJP by autodiff (parallel/halo docstring)
        border = t < 0
    else:
        border = (t == 0) | (t == n_t - 1)

    def finalize_ko(ko, total, mask_t):
        out = total + bias_ref[ko]
        if has_partial:
            out = out + part_ref[ko, 0].astype(jnp.float32)
        if relu:
            out = jnp.maximum(out, 0.0)
        out = out * mask_t
        if stats or post:
            of = out.astype(jnp.float32)
            if post:
                # backward cross-stats: da = sum(x * dxn), db = sum(dxn)
                # over the interior (mask_t already zeroed pad rows/planes)
                s0 = jnp.sum(
                    of * post_x_ref[ko, 0].astype(jnp.float32),
                    axis=0, keepdims=True,
                )
                s1 = jnp.sum(of, axis=0, keepdims=True)
            else:
                s0 = jnp.sum(of, axis=0, keepdims=True)
                s1 = jnp.sum(of * of, axis=0, keepdims=True)
            new = jnp.concatenate([s0, s1], axis=0)

            @pl.when(t == 1)
            def _(ko=ko, new=new):
                stat_acc[ko] = new

            @pl.when(t != 1)
            def _(ko=ko, new=new):
                stat_acc[ko] += new
        if post:
            # dx w.r.t. the RAW input of the forward block: scale the
            # normalized-input cotangent by the affine's a (f32, pre-cast)
            out = out * post_ab_ref[ko, 0:1, :]
        y_ref[ko, 0] = out.astype(out_dtype)

    cso = y_ref.shape[-1]

    def dot_rows(si, w):
        return jax.lax.dot_general(
            zcat[ki, si, sg : sg + ps, :],
            w,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def _mask_t():
        # mask covers y/z pad rows; the plane factor zeroes back-pad
        # planes (X < t < Xp-1) that the grid still computes.  A runtime
        # ``valid_out`` (spatial-parallel mid-level slabs) replaces the
        # static factor: planes a shard computes but does NOT own (the
        # duplicated neighbor plane) zero out here, so their y — and
        # therefore the ReLU-gated dconv and the stat sums — never carry
        # another shard's output.
        if edge_outputs:
            return mask
        if has_vout:
            return mask * vout_ref[t]
        return mask * jnp.where(t <= g.X, 1.0, 0.0)

    @pl.when(jnp.logical_not(border))
    def _():
        mask_t = _mask_t()
        for ko in range(kout):
            if kin == 1 and fold and kfold:
                # single in-shard, fully K-folded: ONE (ps, 9cs) pair dot
                # + ONE middle dot per output plane
                op = zcat[ki, jax.lax.rem(t, 3)]
                tac = jax.lax.dot_general(
                    op, wac_ref[0, ko], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                tb = jax.lax.dot_general(
                    op, wmid_ref[0, ko], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                finalize_ko(ko, _combine_dy(tac, tb, ps, cso, g.Zp), mask_t)
                continue
            if kin == 1 and fold and nmerge:
                # single in-shard, N-merged: 3 dots of N = 3cso ([A|C|B]
                # columns in one MXU issue per dx), combined by row
                # shifts + two lane rolls
                tm = None
                for dx in range(3):
                    si = jax.lax.rem(t + 2 + dx, 3)
                    c = dot_rows(si, wacm_ref[0, ko, dx])
                    tm = c if tm is None else tm + c
                finalize_ko(
                    ko, _combine_dy_merged(tm, ps, cso, g.Zp), mask_t
                )
                continue
            if kin == 1 and fold:
                # single in-shard, dy-folded: 3 pair dots (N = 2cso) + 3
                # middle dots (N = cso) as values, combined by row shifts
                # + one lane roll — no accumulator scratch round-trips
                tac, tb = None, None
                for dx in range(3):
                    si = jax.lax.rem(t + 2 + dx, 3)
                    cac = dot_rows(si, wac_ref[0, ko, dx])
                    cb = dot_rows(si, wmid_ref[0, ko, dx])
                    tac = cac if tac is None else tac + cac
                    tb = cb if tb is None else tb + cb
                finalize_ko(ko, _combine_dy(tac, tb, ps, cso, g.Zp), mask_t)
                continue
            if kin == 1 and kfold:
                # single in-shard, wide out-shard, K-folded: 3 dy dots of
                # K = 9cs into the guarded phase buffer
                total = None
                phi = jax.lax.rem(t, 3)
                for dy in range(3):
                    s = sg + (dy - 1) * g.Zp
                    contrib = jax.lax.dot_general(
                        zcat[ki, phi, s : s + ps, :],
                        wz_ref[0, ko, dy],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    total = contrib if total is None else total + contrib
                finalize_ko(ko, total, mask_t)
                continue
            if kin == 1:
                # single in-shard, wide out-shard (cso == 128): the 9
                # tap-column dots already run the MXU at full column width
                total = None
                for dx in range(3):
                    si = jax.lax.rem(t + 2 + dx, 3)
                    for dy in range(3):
                        s = sg + (dy - 1) * g.Zp
                        contrib = jax.lax.dot_general(
                            zcat[ki, si, s : s + ps, :],
                            wz_ref[0, ko, dx, dy],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        total = contrib if total is None else total + contrib
                finalize_ko(ko, total, mask_t)
                continue
            # multi-in-shard grids accumulate in scratch across ki
            if fold and kfold:
                op = zcat[ki, jax.lax.rem(t, 3)]
                cac = jax.lax.dot_general(
                    op, wac_ref[0, ko], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                cb = jax.lax.dot_general(
                    op, wmid_ref[0, ko], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

                @pl.when(ki == 0)
                def _(ko=ko, cac=cac, cb=cb):
                    acc[ko] = cac
                    acc2[ko] = cb

                @pl.when(ki != 0)
                def _(ko=ko, cac=cac, cb=cb):
                    acc[ko] += cac
                    acc2[ko] += cb
                continue
            if fold and nmerge:
                # multi-in-shard, N-merged: accumulate the (ps, 3cso)
                # merged products in acc across ki; combine at the end
                for dx in range(3):
                    si = jax.lax.rem(t + 2 + dx, 3)
                    cm = dot_rows(si, wacm_ref[0, ko, dx])
                    if dx == 0:
                        @pl.when(ki == 0)
                        def _(ko=ko, cm=cm):
                            acc[ko] = cm

                        @pl.when(ki != 0)
                        def _(ko=ko, cm=cm):
                            acc[ko] += cm
                    else:
                        acc[ko] += cm
                continue
            if fold:
                for dx in range(3):
                    si = jax.lax.rem(t + 2 + dx, 3)
                    cac = dot_rows(si, wac_ref[0, ko, dx])
                    cb = dot_rows(si, wmid_ref[0, ko, dx])
                    if dx == 0:
                        @pl.when(ki == 0)
                        def _(ko=ko, cac=cac, cb=cb):
                            acc[ko] = cac
                            acc2[ko] = cb

                        @pl.when(ki != 0)
                        def _(ko=ko, cac=cac, cb=cb):
                            acc[ko] += cac
                            acc2[ko] += cb
                    else:
                        acc[ko] += cac
                        acc2[ko] += cb
                continue
            if kfold:
                phi = jax.lax.rem(t, 3)
                for dy in range(3):
                    s = sg + (dy - 1) * g.Zp
                    contrib = jax.lax.dot_general(
                        zcat[ki, phi, s : s + ps, :],
                        wz_ref[0, ko, dy],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    if dy == 0:
                        @pl.when(ki == 0)
                        def _(ko=ko, contrib=contrib):
                            acc[ko] = contrib

                        @pl.when(ki != 0)
                        def _(ko=ko, contrib=contrib):
                            acc[ko] += contrib
                    else:
                        acc[ko] += contrib
                continue
            first = True
            for dx in range(3):
                si = jax.lax.rem(t + 2 + dx, 3)  # slab of plane t-1+dx
                for dy in range(3):
                    s = sg + (dy - 1) * g.Zp
                    contrib = jax.lax.dot_general(
                        zcat[ki, si, s : s + ps, :],
                        wz_ref[0, ko, dx, dy],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    if first:
                        first = False

                        @pl.when(ki == 0)
                        def _(ko=ko, contrib=contrib):
                            acc[ko] = contrib

                        @pl.when(ki != 0)
                        def _(ko=ko, contrib=contrib):
                            acc[ko] += contrib
                    else:
                        acc[ko] += contrib

        if kin > 1:
            @pl.when(ki == n_ki - 1)
            def _():
                mask_t = _mask_t()
                for ko in range(kout):
                    if fold and nmerge:
                        finalize_ko(
                            ko,
                            _combine_dy_merged(acc[ko], ps, cso, g.Zp),
                            mask_t,
                        )
                    elif fold:
                        finalize_ko(
                            ko,
                            _combine_dy(acc[ko], acc2[ko], ps, cso, g.Zp),
                            mask_t,
                        )
                    else:
                        finalize_ko(ko, acc[ko], mask_t)

    @pl.when(border & (ki == n_ki - 1))
    def _():  # outermost pad planes are written as exact zeros
        y_ref[...] = jnp.zeros_like(y_ref)

    if stats or post:
        @pl.when((t == n_t - 1) & (ki == n_ki - 1))
        def _():
            sums_ref[...] = stat_acc[...]


def conv_shards(
    x: jnp.ndarray,
    ab: Optional[jnp.ndarray],
    w: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    *,
    g: Geom,
    relu: bool,
    stats: bool,
    out_dtype=None,
    partial: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    halo: bool = False,
    valid_in: Optional[jnp.ndarray] = None,
    valid_out: Optional[jnp.ndarray] = None,
    edge_outputs: bool = False,
    post_ab: Optional[jnp.ndarray] = None,
    post_x: Optional[jnp.ndarray] = None,
):
    """Run the fused conv over a channel-sharded input.

    x: (Kin, Xp, plane, cs); ab: (Kin, 2, cs) or None (None requires x to
    be zero on all padding rows/planes); w: (Kin, Kout, 27, cs, cso);
    bias: (Cout,) or None; partial: optional (Kout, Xp, plane, cso)
    pre-activation accumulator added before ReLU/stats.
    Returns (y (Kout, Xp, plane, cso), sums (Kout, 2, cso) f32).

    ``post_ab``/``post_x`` (backward dx mode, exclusive with stats/halo):
    the kernel computes the transposed conv's normalized-input cotangent
    ``dxn`` as usual, accumulates the d(affine) cross-stats
    ``sums[:, 0] = sum(post_x * dxn)`` / ``sums[:, 1] = sum(dxn)`` over
    the interior, and writes ``dxn * post_ab[:, 0]`` — folding what was a
    separate full-resolution XLA pass (read dxn + x, write dx, reduce
    da/db) into the kernel's finalize.

    Spatial-parallel extensions (SURVEY §2.2b; used under shard_map):
    ``halo`` treats the ring planes 0 / Xp-1 as real neighbor data (the
    caller fills them via ppermute) and feeds plane 0 into the slab;
    ``valid_in`` ((Xp,) f32) marks which planes are real (ring validity
    differs per shard at runtime); ``edge_outputs`` computes outputs at
    the ring planes too (the dx pass's gradients w.r.t. halo inputs).
    ``valid_out`` ((Xp,) f32, halo only) marks which interior planes this
    shard OWNS: unowned planes (the mid-level slab's duplicated neighbor
    plane, parallel/sp_pallas.py ring_fill_mid) are valid conv INPUTS but
    their outputs/stats zero out, so each global plane is produced and
    counted by exactly one shard.
    """
    kin, xp, ps, cs = (int(v) for v in x.shape)
    assert xp == g.Xp and ps == g.plane, (x.shape, g)
    kout, cso = int(w.shape[1]), int(w.shape[-1])
    assert w.shape == (kin, kout, 27, cs, cso), (w.shape,)
    post = post_ab is not None
    if post:
        assert post_x is not None and not (stats or halo or edge_outputs)
        assert post_ab.shape == (kout, 2, cso), (post_ab.shape,)
        assert post_x.shape == (kout, xp, ps, cso), (post_x.shape,)
    if halo:
        assert ab is not None, "halo mode normalizes ring planes (pass identity affine)"
        assert valid_in is not None and valid_in.shape == (xp,), valid_in
    if valid_out is not None:
        assert halo and valid_out.shape == (xp,), (valid_out, halo)
    if halo or edge_outputs:
        # even local extents leave no slack planes between the right ring
        # and the buffer end (make_geom: Xp == X + 2)
        assert g.Xp == g.X + 2, (g, "spatial-parallel slabs need even X")
    out_dtype = out_dtype or x.dtype
    if bias is None:
        bias = jnp.zeros((kout * cso,), jnp.float32)
    # dy-fold only pays when the out-shard is narrower than the MXU's 128
    # columns; at cso == 128 the classic 9-dot grid is already full-width
    # and the fold's roll/shift passes would be pure overhead
    fold = cso < MAX_SHARD
    # K-fold (round 3): additionally merge the dx taps into the
    # contraction dim via triple phase buffers — one K = 9cs dot pair
    # (fold) or 3 dy dots of K = 9cs (unfolded) per output plane.  Gated
    # on the phase buffers fitting comfortably in VMEM (the flagship
    # level-0 64-wide case is 37.9 MB; the 128-wide mid-level cases fit
    # easily at quarter-resolution planes) and off for the halo modes
    # (their ring-plane slab bookkeeping assumes the rolling 3-slab
    # layout).
    kf_rows = ps if fold else ps + 2 * g.Zp
    kfold = (
        not (halo or edge_outputs)
        and os.environ.get("UNETSULC_KFOLD9", "0") == "1"
        and kin * 3 * kf_rows * 9 * cs * x.dtype.itemsize <= _KFOLD9_BUDGET
        # scripts/kfold9_compile_bisect.py (round 5): the level-0 fwd
        # conv2 shape — stats+fold at cs=64, ps=10976 — reproducibly
        # kills the tunnel's remote compile helper (subprocess exit 1,
        # no diagnostic) while every other level-0/mid-level K-fold
        # config compiles, including the same-zcat-size post/dx kernels.
        # Keep that one config on the dy-fold path.
        and not (stats and fold and cs >= 64 and ps >= 8192)
    )
    # N-merge (round 5, UNETSULC_NMERGE A/B): issue the dy pair + middle
    # columns as one N = 3cso dot per dx.  cso >= 64 keeps the merged
    # width at >= 1.5 lane tiles (cso = 32 would run 96-lane ops).
    nmerge = (
        fold
        and not kfold
        and cso >= 64
        and os.environ.get("UNETSULC_NMERGE", "0") == "1"
    )

    kern = functools.partial(
        _fwd_kernel,
        g=g,
        kin=kin,
        kout=kout,
        has_affine=ab is not None,
        has_partial=partial is not None,
        relu=relu,
        stats=stats,
        out_dtype=out_dtype,
        fold=fold,
        halo=halo,
        edge_outputs=edge_outputs,
        has_valid=valid_in is not None,
        has_vout=valid_out is not None,
        post=post,
        kfold=kfold,
        nmerge=nmerge,
    )

    last = g.Xp - 1
    in_specs = [
        pl.BlockSpec(
            (1, 1, ps, cs),
            lambda t, ki: (ki, jnp.minimum(t + 1, last), 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [x]
    if halo:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, ps, cs),
                lambda t, ki: (ki, jnp.minimum(t, last), 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(x)
    if ab is not None:
        assert ab.shape == (kin, 2, cs), (ab.shape,)
        in_specs.append(
            pl.BlockSpec(
                (1, 2, cs), lambda t, ki: (ki, 0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(ab.astype(jnp.float32))
    if valid_in is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(valid_in.astype(jnp.float32))
    if valid_out is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(valid_out.astype(jnp.float32))
    if fold and kfold:
        wac, wmid = pack_weights_dxfold9(w)
        in_specs += [
            pl.BlockSpec(
                (1, kout, 9 * cs, 2 * cso),
                lambda t, ki: (ki, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, kout, 9 * cs, cso),
                lambda t, ki: (ki, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        operands += [wac, wmid]
    elif fold and nmerge:
        in_specs.append(
            pl.BlockSpec(
                (1, kout, 3, 3 * cs, 3 * cso),
                lambda t, ki: (ki, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(pack_weights_dyfold_merged(w))
    elif fold:
        wac, wmid = pack_weights_dyfold(w)
        in_specs += [
            pl.BlockSpec(
                (1, kout, 3, 3 * cs, 2 * cso),
                lambda t, ki: (ki, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, kout, 3, 3 * cs, cso),
                lambda t, ki: (ki, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        operands += [wac, wmid]
    elif kfold:
        in_specs.append(
            pl.BlockSpec(
                (1, kout, 3, 9 * cs, cso),
                lambda t, ki: (ki, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(pack_weights_zcat9(w))
    else:
        in_specs.append(
            pl.BlockSpec(
                (1, kout, 3, 3, 3 * cs, cso),
                lambda t, ki: (ki, 0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(pack_weights_zcat(w))
    in_specs += [
        pl.BlockSpec(
            (kout, 1, cso), lambda t, ki: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((ps, 1), lambda t, ki: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands += [
        bias.reshape(kout, 1, cso).astype(jnp.float32),
        jnp.asarray(g.interior_mask_rows()),
    ]
    if partial is not None:
        assert partial.shape == (kout, g.Xp, ps, cso), (partial.shape,)
        in_specs.append(
            pl.BlockSpec(
                (kout, 1, ps, cso),
                lambda t, ki: (0, t, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(partial)
    if post:
        in_specs += [
            pl.BlockSpec(
                (kout, 2, cso), lambda t, ki: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (kout, 1, ps, cso),
                lambda t, ki: (0, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        operands += [post_ab.astype(jnp.float32), post_x]

    sg = g.Zp
    # the partial accumulator is consumed exactly once and then dead:
    # alias it to the y output so the finalize writes in place (no second
    # full-volume allocation for the pair's result)
    aliases = (
        {len(operands) - 1: 0}
        if partial is not None and partial.dtype == out_dtype
        else {}
    )
    y, sums = pl.pallas_call(
        kern,
        grid=(g.Xp, kin),
        in_specs=in_specs,
        input_output_aliases=aliases,
        out_specs=(
            pl.BlockSpec(
                (kout, 1, ps, cso),
                lambda t, ki: (0, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (kout, 2, cso), lambda t, ki: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((kout, g.Xp, ps, cso), out_dtype),
            jax.ShapeDtypeStruct((kout, 2, cso), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (kin, 3, kf_rows, 9 * cs)
                if kfold
                else (kin, 3, ps + 2 * sg, 3 * cs),
                x.dtype,
            ),
            # kin == 1 accumulates dots as values; no acc scratch needed.
            # kin > 1: acc holds the [A|C] pair products (fold) or the
            # plain tap sums; acc2 holds the dy = 1 products (fold only).
            pltpu.VMEM(
                (kout, ps, (3 if nmerge else 2) * cso if fold else cso)
                if kin > 1
                else (1, 8, 128),
                jnp.float32,
            ),
            pltpu.VMEM(
                (kout, ps, cso)
                if (kin > 1 and fold and not nmerge)
                else (1, 8, 128),
                jnp.float32,
            ),
            pltpu.VMEM((kout, 2, cso), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*operands)
    return y, sums


# ---------------------------------------------------------------------------
# weight-gradient kernel
# ---------------------------------------------------------------------------


def _wgrad_kernel(
    *refs,
    g: Geom,
    kout: int,
    has_affine: bool,
    fold: bool,
    halo: bool,
    has_valid: bool,
):
    i = 0
    xnext = refs[i]  # (1, 1, plane, cs) block
    i += 1
    xcur_ref = None
    if halo:
        xcur_ref = refs[i]  # (1, 1, plane, cs) block: plane t
        i += 1
    ab_ref = None
    if has_affine:
        ab_ref = refs[i]
        i += 1
    valid_ref = None
    if has_valid:
        valid_ref = refs[i]  # (Xp,) f32 (SMEM)
        i += 1
    dconv_ref = refs[i]  # (kout, 1, plane, cso) block
    mask_ref = refs[i + 1]
    i += 2
    dw_ref = refs[i]  # (1,kout,3,3cs,3cso) fold / (1,kout,3,3,3cs,cso)
    i += 1
    zcat = refs[i]  # (1, 3, ps + 2sg, 3cs) rolling slabs (single shard)
    dp3 = refs[i + 1]  # (ps, 3cso) dy-shifted cotangent (fold only)

    ki = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    ps = g.plane
    sg = g.Zp
    cs = xnext.shape[-1]
    cso = dconv_ref.shape[-1]
    mask = mask_ref[...]

    @pl.when(t == 0)
    def _():
        zcat[0] = jnp.zeros(zcat.shape[1:], zcat.dtype)
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    if halo:
        @pl.when(t == 0)
        def _():
            norm0 = _norm_plane(
                xcur_ref[0, 0], ab_ref[0] if has_affine else None,
                mask, 0, g, has_affine,
                valid=valid_ref[0] if has_valid else None,
            )
            _build_slab(zcat, 0, 0, norm0, ps, cs, sg)

    vnext = (
        valid_ref[jnp.minimum(t + 1, n_t - 1)] if has_valid else None
    )
    norm = _norm_plane(xnext[0, 0], ab_ref[0] if has_affine else None,
                       mask, t + 1, g, has_affine, valid=vnext)
    _build_slab(zcat, 0, jax.lax.rem(t + 1, 3), norm, ps, cs, sg)

    # dconv is exactly zero on every pad row/plane (forward mask + ReLU
    # cotangent), so full-plane contractions are exact; t == 0 (and the
    # final border plane) contribute nothing.
    @pl.when(t != 0)
    def _():
        zp = g.Zp
        for ko in range(kout):
            dplane = dconv_ref[ko, 0]
            if fold:
                # dy-fold (round 3): dW[dx, dy] = sum_q zcat[sg+q] (x)
                # dplane[q - (dy-1)*zp]; shifting the COTANGENT laneward
                # instead of the slab rows makes one (3cs, 3cso) dot per
                # dx — N = 3cso vs the round-2 N = cso column ceiling.
                # Shifted-out rows are zero (they matched slab guard rows
                # in the unfolded form).
                zrow = jnp.zeros((zp, cso), dplane.dtype)
                dp3[:, 0:cso] = jnp.concatenate([dplane[zp:], zrow], axis=0)
                dp3[:, cso : 2 * cso] = dplane
                dp3[:, 2 * cso : 3 * cso] = jnp.concatenate(
                    [zrow, dplane[: ps - zp]], axis=0
                )
                for dx in range(3):
                    si = jax.lax.rem(t + 2 + dx, 3)
                    contrib = jax.lax.dot_general(
                        zcat[0, si, sg : sg + ps, :],
                        dp3[...],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    dw_ref[0, ko, dx] += contrib
                continue
            for dx in range(3):
                si = jax.lax.rem(t + 2 + dx, 3)
                for dy in range(3):
                    s = sg + (dy - 1) * g.Zp
                    contrib = jax.lax.dot_general(
                        zcat[0, si, s : s + ps, :],
                        dplane,
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    dw_ref[0, ko, dx, dy] += contrib


def conv_wgrad_shards(
    x: jnp.ndarray,
    ab: Optional[jnp.ndarray],
    dconv: jnp.ndarray,
    *,
    g: Geom,
    interpret: bool = False,
    halo: bool = False,
    valid_in: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """dW[ki, ko, tap] = sum_rows xn[ki, row + off(tap)] (x) dconv[ko, row].

    x: (Kin, Xp, ps, cs); dconv: (Kout, Xp, ps, cso), zero on pad rows.
    Returns (Kin, Kout, 27, cs, cso) f32.  ``halo``/``valid_in`` as in
    :func:`conv_shards` (dconv rings are zero, so only x's halo planes
    need the slab-0 build + validity-normalized affine)."""
    kin, xp, ps, cs = (int(v) for v in x.shape)
    kout, cso = int(dconv.shape[0]), int(dconv.shape[-1])
    assert xp == g.Xp and ps == g.plane, (x.shape, g)
    # same gating rationale as conv_shards: the fold triples N, which only
    # pays below the MXU's 128-column width
    fold = cso < MAX_SHARD
    if halo:
        assert ab is not None and valid_in is not None

    kern = functools.partial(
        _wgrad_kernel, g=g, kout=kout, has_affine=ab is not None, fold=fold,
        halo=halo, has_valid=valid_in is not None,
    )
    last = g.Xp - 1
    in_specs = [
        pl.BlockSpec(
            (1, 1, ps, cs),
            lambda ki, t: (ki, jnp.minimum(t + 1, last), 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [x]
    if halo:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, ps, cs),
                lambda ki, t: (ki, jnp.minimum(t, last), 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(x)
    if ab is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, 2, cs), lambda ki, t: (ki, 0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(ab.astype(jnp.float32))
    if valid_in is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(valid_in.astype(jnp.float32))
    in_specs += [
        pl.BlockSpec(
            (kout, 1, ps, cso),
            lambda ki, t: (0, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((ps, 1), lambda ki, t: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands += [dconv, jnp.asarray(g.interior_mask_rows())]

    sg = g.Zp
    if fold:
        out_spec = pl.BlockSpec(
            (1, kout, 3, 3 * cs, 3 * cso),
            lambda ki, t: (ki, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (kin, kout, 3, 3 * cs, 3 * cso), jnp.float32
        )
    else:
        out_spec = pl.BlockSpec(
            (1, kout, 3, 3, 3 * cs, cso),
            lambda ki, t: (ki, 0, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (kin, kout, 3, 3, 3 * cs, cso), jnp.float32
        )
    dwz = pl.pallas_call(
        kern,
        grid=(kin, g.Xp),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((1, 3, ps + 2 * sg, 3 * cs), x.dtype),
            pltpu.VMEM(
                (ps, 3 * cso) if fold else (8, 128), dconv.dtype
            ),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*operands)
    if fold:
        # (dx, dz*cs + ci, dy*cso + co) -> (dx, dy, dz, ci, co)
        dwz = dwz.reshape(kin, kout, 3, 3, cs, 3, cso).transpose(
            0, 1, 2, 5, 3, 4, 6
        )
    return dwz.reshape(kin, kout, 3, 3, 3, cs, cso).reshape(
        kin, kout, 27, cs, cso
    )


# ---------------------------------------------------------------------------
# the differentiable fused block
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def fused_conv_block(x1, x2, ab1, ab2, w1, w2, bias, valid1, valid2,
                     valid_out, n_inputs, g, interpret=False, halo=False):
    """relu(conv3x3x3(mask*(a*x + b), W) + bias) with GN stat sums, fused.

    x_i: (Kin_i, Xp, plane, cs_i) padded shard buffers; ab_i:
    (Kin_i, 2, cs_i) per-channel affine (the previous GroupNorm, applied
    lazily under the interior mask); w_i: (Kin_i, Kout, 27, cs_i, cso)
    weight shards; bias: (Cout,).  With ``n_inputs == 2`` the channel
    concat conv(concat(x1, x2)) is computed as two chained kernel calls
    (branch 1 produces a pre-activation ``partial``); x2/ab2/w2 are
    ignored dummies otherwise.  Returns (y (Kout, Xp, plane, cso),
    sums (Kout, 2, cso) f32) where sums hold per-channel sum /
    sum-of-squares of y over the padded volume (== interior: padding is
    exactly zero).

    ``halo`` (spatial parallel): x_i's ring planes carry neighbor halo
    data and valid_i ((Xp,) f32) marks per-plane validity; the backward
    emits ring-plane dx so autodiff routes halo gradients back through
    the caller's ppermute.  valid_i are None outside halo mode.
    ``valid_out`` ((Xp,) f32 or None) marks the planes this shard OWNS
    (mid-level slabs, see conv_shards): unowned planes' outputs/stats
    zero, which makes their ReLU-gated dconv zero too — the backward
    needs no extra masking."""
    y, sums = _fused_fwd(x1, x2, ab1, ab2, w1, w2, bias, valid1, valid2,
                         valid_out, n_inputs, g, interpret, halo)[0]
    return y, sums


def _fused_fwd(x1, x2, ab1, ab2, w1, w2, bias, valid1, valid2, valid_out,
               n_inputs, g, interpret, halo):
    def call(xb, abb, wb, vb, b, partial_, stats):
        return conv_shards(
            xb, abb, wb, b, g=g, relu=stats, stats=stats, partial=partial_,
            interpret=interpret, halo=halo, valid_in=vb,
            # only the finalizing (stats) call masks: the partial is a
            # pre-activation accumulator the second call overwrites
            valid_out=valid_out if stats else None,
        )

    if n_inputs == 2:
        # the WIDER branch computes the partial: the finalizing call then
        # has the smaller slab working set, so the extra partial block
        # stream costs it less pipelining headroom (measured ~2 ms at the
        # full-res decoder pair the other way around)
        first, second = (0, 1) if x1.shape[-1] >= x2.shape[-1] else (1, 0)
        xs, abs_, ws = (x1, x2), (ab1, ab2), (w1, w2)
        vs = (valid1, valid2)
        p, _ = call(xs[first], abs_[first], ws[first], vs[first], None,
                    None, False)
        y, sums = call(xs[second], abs_[second], ws[second], vs[second],
                       bias, p, True)
    else:
        y, sums = call(x1, ab1, w1, valid1, bias, None, True)
    return (y, sums), (
        x1, x2, ab1, ab2, w1, w2, valid1, valid2, valid_out, y,
    )


def _fused_bwd(n_inputs, g, interpret, halo, res, cts):
    x1, x2, ab1, ab2, w1, w2, valid1, valid2, valid_out, y = res
    dy, dsums = cts

    # cotangent through ReLU + the stat sums (one fused elementwise pass):
    #   dconv = 1[y > 0] * (dy + dsum0 + 2 y dsum1)
    # y == 0 on every padding row, so dconv vanishes there (the wgrad /
    # transposed-conv kernels rely on that).
    ds0 = dsums[:, 0:1, :][:, None, :, :]  # (Kout, 1, 1, cso)
    ds1 = dsums[:, 1:2, :][:, None, :, :]
    yf = y.astype(jnp.float32)
    dconv = jnp.where(
        yf > 0, dy.astype(jnp.float32) + ds0 + 2.0 * yf * ds1, 0.0
    ).astype(y.dtype)

    dbias = jnp.sum(dconv.astype(jnp.float32), axis=(1, 2)).reshape(-1)

    def branch_grads(xb, abb, wb, vb):
        dwb = conv_wgrad_shards(
            xb, abb, dconv, g=g, interpret=interpret, halo=halo, valid_in=vb
        )
        wt = mirror_transpose_shards(wb)
        if not halo:
            # dx-kernel post mode: the kernel scales by a at finalize and
            # accumulates the da/db cross-stats in its sums output — the
            # separate full-res XLA pass (read dxn + x, write dx, reduce
            # da/db) disappears.
            dxb, dsums = conv_shards(
                dconv, None, wt, None, g=g, relu=False, stats=False,
                out_dtype=xb.dtype, interpret=interpret,
                post_ab=abb, post_x=xb,
            )  # (Kin_b, Xp, ps, cs_b), (Kin_b, 2, cs_b)
            return dxb, dsums.astype(abb.dtype), dwb.astype(wb.dtype)
        dxn, _ = conv_shards(
            dconv, None, wt, None, g=g, relu=False, stats=False,
            out_dtype=y.dtype, interpret=interpret, edge_outputs=halo,
        )  # (Kin_b, Xp, ps, cs_b)
        # d(affine) + dx: only VALID rows count for the reductions — in
        # halo mode the affine was also applied to neighbor data in the
        # valid ring planes (a distinct application from the neighbor's
        # own), so those contributions belong in this shard's da/db.
        row_mask = jnp.asarray(
            g.interior_mask_rows().reshape(1, 1, g.plane, 1)
        )
        mask = row_mask * vb.astype(jnp.float32)[None, :, None, None]
        a = abb[:, 0:1, :][:, None, :, :]  # (Kin_b, 1, 1, cs_b)
        dxb = (dxn.astype(jnp.float32) * a).astype(xb.dtype)
        dxn_m = dxn.astype(jnp.float32) * mask
        da = jnp.sum(xb.astype(jnp.float32) * dxn_m, axis=(1, 2))
        db = jnp.sum(dxn_m, axis=(1, 2))
        dab = jnp.stack([da, db], axis=1).astype(abb.dtype)
        # dxb at INVALID planes must be zero (their input was ignored)
        dxb = dxb * vb.astype(dxb.dtype)[None, :, None, None]
        return dxb, dab, dwb.astype(wb.dtype)

    dx1, dab1, dw1 = branch_grads(x1, ab1, w1, valid1)
    if n_inputs == 2:
        dx2, dab2, dw2 = branch_grads(x2, ab2, w2, valid2)
    else:
        dx2 = jnp.zeros_like(x2)
        dab2 = jnp.zeros_like(ab2)
        dw2 = jnp.zeros_like(w2)
    dv1 = None if valid1 is None else jnp.zeros_like(valid1)
    dv2 = None if valid2 is None else jnp.zeros_like(valid2)
    dvo = None if valid_out is None else jnp.zeros_like(valid_out)
    return (
        dx1, dx2, dab1, dab2, dw1, dw2, dbias.astype(jnp.float32),
        dv1, dv2, dvo,
    )


fused_conv_block.defvjp(
    lambda x1, x2, ab1, ab2, w1, w2, bias, valid1, valid2, valid_out,
        n_inputs, g, interpret=False, halo=False:
        _fused_fwd(x1, x2, ab1, ab2, w1, w2, bias, valid1, valid2,
                   valid_out, n_inputs, g, interpret, halo),
    _fused_bwd,
)


@functools.lru_cache(maxsize=None)
def _interior_mask_3d(g: Geom) -> np.ndarray:
    """(1, Xp, plane, 1) f32 mask of the true interior volume."""
    rows = g.interior_mask_rows().reshape(1, 1, g.plane, 1)
    out = np.broadcast_to(rows, (1, g.Xp, g.plane, 1)).copy()
    out[:, 0] = 0.0
    out[:, 1 + g.X :] = 0.0
    return out


# ---------------------------------------------------------------------------
# GroupNorm affine from the kernel's stat sums (tiny, autodiff-friendly)
# ---------------------------------------------------------------------------


def gn_affine_from_sums(
    sums: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    count: int,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """(Kout, 2, cs) interior sums -> (Kout, 2, cs) lazy-GN affine (a; b).

    Matches ops.group_norm: fp32 biased variance over (spatial x
    channels-in-group), then the per-channel affine, expressed as
    ``gn(x) = a*x + b`` with a = inv*scale, b = bias - mean*a."""
    kout, _, cs = sums.shape
    c = kout * cs
    cg = c // num_groups
    ind = (
        jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cg
        == jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    ).astype(jnp.float32)
    denom = float(count * cg)
    flat = sums.swapaxes(0, 1).reshape(2, c)  # (2, C) channel-ordered
    g_sum = flat[0] @ ind
    g_sq = flat[1] @ ind
    mean_g = g_sum / denom
    var_g = g_sq / denom - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = mean_g @ ind.T
    inv_c = inv_g @ ind.T
    a = inv_c * scale.astype(jnp.float32)
    b = bias.astype(jnp.float32) - mean_c * a
    return jnp.stack([a, b]).reshape(2, kout, cs).swapaxes(0, 1)


def identity_affine(kin: int, cs: int) -> jnp.ndarray:
    return jnp.broadcast_to(
        jnp.stack(
            [jnp.ones((cs,), jnp.float32), jnp.zeros((cs,), jnp.float32)]
        ),
        (kin, 2, cs),
    )


# ---------------------------------------------------------------------------
# glue between fused blocks and the XLA-handled ops (pool, resize, head)
# ---------------------------------------------------------------------------


class DenseEntry:
    """Marker wrapping a plain (1, X, Y, Z, cin) volume: compute its conv as
    one dense (27*cin)-contraction matmul in the padded row layout (the
    pipeline's entry conv — cin is tiny, so per-shard kernels would
    underfeed the MXU and XLA's channels-last layout choices are poor)."""

    def __init__(self, x5: jnp.ndarray):
        self.x5 = x5


def conv3d_dense_entry(
    x5: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    compute_dtype,
    ring: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, Geom]:
    """relu(conv3x3x3(x5, kernel) + bias) directly into buffer layout.

    Builds the 27-tap shifted lane stack of the zero-ring-padded volume
    (one fused pad+slice pass) and contracts (rows, 27*cin) @ (27*cin,
    cout) on the MXU.  Returns (buf (1, Xp, plane, cout), stat sums
    (K, 2, cs) f32, geom) — the standard pipeline entry triple.

    ``ring`` (spatial parallel): x5's first/last x-planes are neighbor
    halo data (the caller's ppermute exchange; zeros at the global volume
    edges, where a zero ring IS the conv's padding) rather than interior
    volume — they are placed in the padded buffer's ring rows so interior
    outputs see their true neighbors, and the output/stats cover only the
    (X-2)-plane local slab."""
    _, X, Y, Z, cin = x5.shape
    cout = kernel.shape[-1]
    if ring:
        g = make_geom(X - 2, Y, Z)
        assert g.Xp == X, (g, x5.shape)  # even slabs: Xp == S + 2
        p = jnp.pad(
            x5[0].astype(compute_dtype),
            ((0, 0), (1, g.Yp - Y - 1), (1, g.Zp - Z - 1), (0, 0)),
        ).reshape(g.Xp, g.plane, cin)
    else:
        g = make_geom(X, Y, Z)
        buf = pad_to_geom(x5.astype(compute_dtype), g, cs=cin)
        p = buf[0]  # (Xp, plane, cin), zero ring included
    roff = g.Zp + 1
    pp = jnp.pad(p, ((1, 1), (roff, roff), (0, 0)))
    taps = []
    for dx in (0, 1, 2):
        for dy in (0, 1, 2):
            for dz in (0, 1, 2):
                r0 = roff + (dy - 1) * g.Zp + (dz - 1)
                taps.append(
                    jax.lax.dynamic_slice(
                        pp, (dx, r0, 0), (g.Xp, g.plane, cin)
                    )
                )
    stack = jnp.concatenate(taps, axis=-1)  # (Xp, plane, 27*cin)
    w = kernel.reshape(27 * cin, cout).astype(compute_dtype)
    # compute-dtype output (f32 MXU accumulation inside the dot) keeps
    # every full-res intermediate AND its autodiff cotangent in bf16 —
    # the same rounding contract as the fused kernels' finalize
    y = jax.lax.dot_general(
        stack, w, (((2,), (0,)), ((), ())),
        preferred_element_type=compute_dtype,
    ) + bias.astype(compute_dtype)
    y = jnp.maximum(y, 0.0) * jnp.asarray(
        _interior_mask_3d(g).reshape(g.Xp, g.plane, 1)
    ).astype(compute_dtype)
    yf = y.astype(jnp.float32)
    s0 = jnp.sum(yf, axis=(0, 1))
    s1 = jnp.sum(yf * yf, axis=(0, 1))
    cs = shard_width(cout)
    ybuf = y.reshape(g.Xp, g.plane, cout // cs, cs).transpose(2, 0, 1, 3)
    return ybuf, affine_from_channels(s0, s1, cs), g


def pool_geom(g: Geom) -> Geom:
    """Geometry after the torch-padded 2x2x2/stride-2 max pool."""
    return make_geom(g.X // 2 + 1, g.Y // 2 + 1, g.Z // 2 + 1)


def max_pool_buf_xla(buf, aff, g: Geom):
    """Torch-padded max pool on the buffer via XLA reduce_window.

    Semantics oracle for (and fallback of) the Pallas pool below; its
    select-and-scatter backward picks the first >= match, torch's tie
    convention.  (A window-view reshape variant with an explicit
    first-match mask measured ~20 ms/step at 96^3: the 7-D
    (o,2,o,2,o,2,C) pred tensors force (4,128)-tiled relayouts; this
    reduce_window form costs ~11 ms at 96^3 because XLA relayouts the
    5-D view to its select-and-scatter layout — hence the kernels.)"""
    go = pool_geom(g)
    k, xp, ps, cs = buf.shape
    b5 = buf.reshape(k, g.Xp, g.Yp, g.Zp, cs)
    m = jnp.asarray(
        _interior_mask_3d(g).reshape(1, g.Xp, g.Yp, g.Zp, 1) > 0
    )
    if aff is not None:
        a = aff[:, 0, :][:, None, None, None, :]
        b = aff[:, 1, :][:, None, None, None, :]
        xn = (b5.astype(jnp.float32) * a + b).astype(buf.dtype)
    else:
        xn = b5
    xn = jnp.where(m, xn, jnp.asarray(-jnp.inf, buf.dtype))
    pooled = jax.lax.reduce_window(
        xn,
        -jnp.inf,
        jax.lax.max,
        (1, 2, 2, 2, 1),
        (1, 2, 2, 2, 1),
        "VALID",
    )[:, : go.X, : go.Y, : go.Z, :]
    padded = jnp.pad(
        pooled,
        (
            (0, 0),
            (1, go.Xp - go.X - 1),
            (1, go.Yp - go.Y - 1),
            (1, go.Zp - go.Z - 1),
            (0, 0),
        ),
    )
    return padded.reshape(k, go.Xp, go.plane, cs)


def _pool_norm_plane(xp, ab, mask, p, g: Geom, has_affine: bool):
    """Normalized plane with -inf at every pad position (ring plane, pad
    rows), cast to the storage dtype exactly like the forward max sees it."""
    neg = jnp.asarray(-jnp.inf, xp.dtype)
    ok = (mask > 0) & ((p >= 1) & (p <= g.X))
    if has_affine:
        a = ab[0:1, :]
        b = ab[1:2, :]
        v = (xp.astype(jnp.float32) * a + b).astype(xp.dtype)
    else:
        v = xp
    return jnp.where(ok, v, neg)


def _pool_fwd_kernel(*refs, g: Geom, go: Geom, has_affine: bool):
    i = 0
    xpair = refs[i]  # (1, 2, plane, cs) block: input planes 2o-2, 2o-1
    i += 1
    ab_ref = None
    if has_affine:
        ab_ref = refs[i]
        i += 1
    mask_ref = refs[i]
    y_ref = refs[i + 1]  # (1, 1, plane2, cs) block

    ki = pl.program_id(0)
    o = pl.program_id(1)
    cs = xpair.shape[-1]
    mask = mask_ref[...]

    @pl.when((o >= 1) & (o <= go.X))
    def _():
        ab = ab_ref[0] if has_affine else None
        v0 = _pool_norm_plane(xpair[0, 0], ab, mask, 2 * o - 2, g, has_affine)
        v1 = _pool_norm_plane(xpair[0, 1], ab, mask, 2 * o - 1, g, has_affine)
        m = jnp.maximum(v0, v1)  # (plane, cs)
        mz = jnp.max(m.reshape(g.plane // 2, 2, cs), axis=1)
        my = jnp.max(
            mz.reshape(g.Yp // 2, 2, g.Zp // 2, cs), axis=1
        )  # (Yp/2, Zp/2, cs)
        out = my[: go.Y, : go.Z, :]
        out = jnp.pad(
            out,
            (
                (1, go.Yp - go.Y - 1),
                (1, go.Zp - go.Z - 1),
                (0, 0),
            ),
        )
        y_ref[0, 0] = out.reshape(go.plane, cs)

    @pl.when((o < 1) | (o > go.X))
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)


def _pool_bwd_kernel(*refs, g: Geom, go: Geom, has_affine: bool):
    i = 0
    xpair = refs[i]  # (1, 2, plane, cs) block: input planes 2q, 2q+1
    i += 1
    ab_ref = None
    if has_affine:
        ab_ref = refs[i]
        i += 1
    yo_ref = refs[i]  # pooled plane q+1 (clamped)
    do_ref = refs[i + 1]  # its cotangent
    mask_ref = refs[i + 2]
    i += 3
    dx_ref = refs[i]  # (1, 2, plane, cs) block: cotangents of both planes
    dab_ref = refs[i + 1]  # (1, 2, cs)
    i += 2
    dab_acc = refs[i]  # (2, cs) f32 scratch

    ki = pl.program_id(0)
    q = pl.program_id(1)
    n_q = pl.num_programs(1)
    cs = xpair.shape[-1]
    mask = mask_ref[...]

    @pl.when(q == 0)
    def _():
        dab_acc[...] = jnp.zeros(dab_acc.shape, dab_acc.dtype)

    @pl.when(q + 1 <= go.X)
    def _():
        ab = ab_ref[0] if has_affine else None
        v0 = _pool_norm_plane(xpair[0, 0], ab, mask, 2 * q, g, has_affine)
        v1 = _pool_norm_plane(xpair[0, 1], ab, mask, 2 * q + 1, g, has_affine)
        yh, zh = g.Yp // 2, g.Zp // 2

        # pooled values / cotangent back at (Yp/2, Zp/2) granularity;
        # rows beyond the output interior never matched (dout zero there)
        yo5 = yo_ref[0, 0].reshape(go.Yp, go.Zp, cs)
        do5 = do_ref[0, 0].reshape(go.Yp, go.Zp, cs)
        # compare in f32: Mosaic has no bf16 vector compare; the cast is
        # exact so first-match semantics are unchanged
        ov = jnp.pad(
            yo5[1 : 1 + go.Y, 1 : 1 + go.Z, :].astype(jnp.float32),
            ((0, yh - go.Y), (0, zh - go.Z), (0, 0)),
        )
        dv = jnp.pad(
            do5[1 : 1 + go.Y, 1 : 1 + go.Z, :].astype(jnp.float32),
            ((0, yh - go.Y), (0, zh - go.Z), (0, 0)),
        )

        w0 = v0.reshape(yh, 2, zh, 2, cs)
        w1 = v1.reshape(yh, 2, zh, 2, cs)
        # torch first-match: window positions in (x, y, z) lexicographic
        # order; the first position equal to the max takes the gradient
        taken = None
        dparts = []
        for w in (w0, w1):
            sel = []
            for ys in (0, 1):
                for zs in (0, 1):
                    eq = w[:, ys, :, zs, :].astype(jnp.float32) == ov
                    hit = eq if taken is None else (eq & ~taken)
                    taken = eq if taken is None else (taken | eq)
                    sel.append(jnp.where(hit, dv, 0.0))
            dparts.append(
                jnp.stack(
                    [
                        jnp.stack([sel[0], sel[1]], axis=2),
                        jnp.stack([sel[2], sel[3]], axis=2),
                    ],
                    axis=1,
                ).reshape(g.plane, cs)
            )
        d0, d1 = dparts  # f32, zero wherever no first-match

        if has_affine:
            a = ab[0:1, :]
            dx_ref[0, 0] = (d0 * a).astype(dx_ref.dtype)
            dx_ref[0, 1] = (d1 * a).astype(dx_ref.dtype)
            da = jnp.sum(
                xpair[0, 0].astype(jnp.float32) * d0
                + xpair[0, 1].astype(jnp.float32) * d1,
                axis=0, keepdims=True,
            )
            db = jnp.sum(d0 + d1, axis=0, keepdims=True)
            dab_acc[...] += jnp.concatenate([da, db], axis=0)
        else:
            dx_ref[0, 0] = d0.astype(dx_ref.dtype)
            dx_ref[0, 1] = d1.astype(dx_ref.dtype)

    @pl.when(q + 1 > go.X)
    def _():
        dx_ref[...] = jnp.zeros_like(dx_ref)

    @pl.when(q == n_q - 1)
    def _():
        dab_ref[0] = dab_acc[...]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def max_pool_buf(buf, aff, g: Geom, interpret: bool = False):
    """Torch-padded 2x2x2/stride-2 max pool on the (K, Xp, plane, cs)
    buffer, as a Pallas kernel pair that never leaves the row layout.

    Consumes the pending GN affine (max does not commute with it); the
    buffer's zero ring plays the role of torch's pad=1 (window o covers
    ring coords (2o, 2o+1)); pad positions compare as -inf.  Backward is
    an explicit first-match (torch tie convention) with exact d(affine).
    The XLA reduce_window form (max_pool_buf_xla, the semantics oracle in
    tests) costs ~11 ms/step at 96^3 in select-and-scatter + relayouts."""
    go = pool_geom(g)
    k, xp, ps, cs = buf.shape
    kern = functools.partial(
        _pool_fwd_kernel, g=g, go=go, has_affine=aff is not None
    )
    n_q = g.Xp // 2
    in_specs = [
        pl.BlockSpec(
            (1, 2, ps, cs),
            lambda ki, o: (ki, jnp.clip(o - 1, 0, n_q - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [buf]
    if aff is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, 2, cs), lambda ki, o: (ki, 0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(aff.astype(jnp.float32))
    in_specs.append(
        pl.BlockSpec((ps, 1), lambda ki, o: (0, 0), memory_space=pltpu.VMEM)
    )
    operands.append(jnp.asarray(g.interior_mask_rows()))
    out = pl.pallas_call(
        kern,
        grid=(k, go.Xp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, go.plane, cs),
            lambda ki, o: (ki, o, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((k, go.Xp, go.plane, cs), buf.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*operands)
    return out


def _max_pool_buf_fwd(buf, aff, g, interpret):
    out = max_pool_buf(buf, aff, g, interpret)
    return out, (buf, aff, out)


def _max_pool_buf_bwd(g, interpret, res, cot):
    buf, aff, out = res
    go = pool_geom(g)
    k, xp, ps, cs = buf.shape
    kern = functools.partial(
        _pool_bwd_kernel, g=g, go=go, has_affine=aff is not None
    )
    n_q = g.Xp // 2
    olast = go.Xp - 1
    in_specs = [
        pl.BlockSpec(
            (1, 2, ps, cs),
            lambda ki, q: (ki, q, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [buf]
    if aff is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, 2, cs), lambda ki, q: (ki, 0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(aff.astype(jnp.float32))
    in_specs += [
        pl.BlockSpec(
            (1, 1, go.plane, cs),
            lambda ki, q: (ki, jnp.minimum(q + 1, olast), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, go.plane, cs),
            lambda ki, q: (ki, jnp.minimum(q + 1, olast), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((ps, 1), lambda ki, q: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands += [out, cot, jnp.asarray(g.interior_mask_rows())]
    dbuf, dab = pl.pallas_call(
        kern,
        grid=(k, n_q),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (1, 2, ps, cs),
                lambda ki, q: (ki, q, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2, cs), lambda ki, q: (ki, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, xp, ps, cs), buf.dtype),
            jax.ShapeDtypeStruct((k, 2, cs), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((2, cs), jnp.float32)],
        # the first-match tree holds many plane-sized temporaries; Mosaic's
        # stack estimate lands just over the default budget at 96^3
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=118 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    if aff is None:
        return dbuf, None
    return dbuf, dab.astype(aff.dtype)


max_pool_buf.defvjp(_max_pool_buf_fwd, _max_pool_buf_bwd)


def affine_to_channels(aff: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(K, 2, cs) shard affine -> ((C,) scale, (C,) shift)."""
    k, _, cs = aff.shape
    return aff[:, 0, :].reshape(k * cs), aff[:, 1, :].reshape(k * cs)


def affine_from_channels(a: jnp.ndarray, b: jnp.ndarray, cs: int) -> jnp.ndarray:
    """((C,), (C,)) -> (K, 2, cs) shard affine."""
    c = a.shape[0]
    k = c // cs
    return jnp.stack([a.reshape(k, cs), b.reshape(k, cs)], axis=1)


def stat_sums_5d(y5: jnp.ndarray, cs: int) -> jnp.ndarray:
    """Per-channel (sum, sum-of-squares) of a (1, X, Y, Z, C) volume as the
    kernel's (K, 2, cs) f32 layout (for blocks computed outside Pallas,
    e.g. the tiny in_channels->mid first conv)."""
    yf = y5.astype(jnp.float32)
    s0 = jnp.sum(yf, axis=(0, 1, 2, 3))
    s1 = jnp.sum(yf * yf, axis=(0, 1, 2, 3))
    return affine_from_channels(s0, s1, cs)


def apply_affine_5d(x5: jnp.ndarray, aff: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Materialize a pending lazy-GN affine on an interior (1,X,Y,Z,C) view."""
    if aff is None:
        return x5
    a, b = affine_to_channels(aff)
    return (x5.astype(jnp.float32) * a + b).astype(x5.dtype)
