"""Fused 'crg'-block Pallas kernels: GN-apply -> conv3x3x3 -> ReLU -> GN-stats.

This is the round-2 performance centerpiece (VERDICT.md item 1).  The XLA
lowering of the reference hot loop (ref training.py:198-217) tiles the 96^3
volumes into a blocked conv layout ([96,96,8,13,C] with z padded to 104)
and every surrounding elementwise/GN/relayout pass inherits it — the
round-1 profile showed ~125 ms of memory-bound tail around ~20 ms of conv
roofline.  These kernels instead keep activations in ONE canonical layout
and fuse the whole block.

Layout
======
A volume lives in HBM as ``(K, Xp, plane, cs)``: channels split into K
shards of width ``cs`` (Mosaic cannot slice the lane dimension, so shards
are addressed by a leading index), each zero-padded x-plane flattened to
``plane = Yp*Zp`` row-major (y, z) rows with channels on lanes.  In VMEM
the three active planes sit in a scratch with ``vguard = Zp+16`` zero
guard rows, so every conv tap is the row slice
``[vguard + dy*Zp + dz, ...)`` — sublane aligned except the +/-1 z taps
(one Mosaic roll each); the guards keep the wrap-around slices of
(masked) border rows in bounds and zero.  ``Zp`` is a multiple of 16.

The forward kernel's grid is ``(x-planes, in-shards)``; each step sees
three auto-pipelined block refs of the input shard — previous / current /
next plane, via clamped BlockSpec index maps — plus the weight shard.  It
applies the *lazy GroupNorm apply* of the previous block as a per-channel
affine under the interior mask (conv zero-padding must stay zero; the
mask also neutralizes the clamped halo fetches at the volume ends), runs
the 81 tap matmuls (27 taps x 3 source planes collapsed to 27 dots) on
the MXU into per-out-shard fp32 accumulators, and on the last in-shard
adds bias, applies ReLU + the interior mask, accumulates per-channel
sum / sum-of-squares for THIS block's GroupNorm, and writes the output
plane.  One streamed HBM read of x (x3 for the plane halo, overlapped by
the pipeline), one write of y — versus XLA's separate conv / stats /
apply / relayout passes.

GroupNorm itself is never materialized: its per-channel affine
``a = inv*scale, b = bias - mean*a`` (computed from the stat sums by tiny
JAX math, ``gn_affine_from_sums``) is consumed lazily by the next conv /
pool / resize / classification head.

Backward = the same conv kernel with mirrored+transposed tap shards (dx)
plus a per-tap row-contraction kernel (dW); the ReLU/stats cotangent and
d(affine) are fused JAX elementwise passes.  ``fused_conv_block`` wires
it all into ``jax.custom_vjp`` so plain autodiff over the model yields
exact gradients.

Decoder blocks pass TWO inputs (skip, upsampled) whose shard arrays are
concatenated — the channel concat itself never exists at full width in a
compute pass (same linearity trick as models.unet3d.SplitConv3; the
transfer-learning contract and param naming are untouched).

Reference semantics preserved: 'crg' order conv->ReLU->GroupNorm with
zero padding included in GN statistics (SURVEY.md §7 hard part #2); the
affine/stat math matches ops.groupnorm bit-for-bit in fp32.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_SHARD = 64  # default lane width of one channel shard


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def shard_width(c: int) -> int:
    """Default channel-shard width for a C-channel tensor."""
    if c >= MAX_SHARD:
        assert c % MAX_SHARD == 0, c
        return MAX_SHARD
    return c


def pair_width(cins: Sequence[int]) -> int:
    """Uniform in-shard width for a (possibly multi-branch) conv input."""
    return min(shard_width(ci) for ci in cins)


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
    def vguard(self) -> int:  # zero guard rows in the VMEM plane scratch
        return self.Zp + 16

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


def reshard(buf: jnp.ndarray, cs_new: int) -> jnp.ndarray:
    """(K, Xp, ps, cs) -> (K*cs/cs_new, Xp, ps, cs_new), channel order kept.

    Pair inputs must share one shard width; when branch widths differ
    (small test configs) the wider buffer is resharded down.  A real
    relayout copy — the flagship config's pairs are already uniform."""
    k, xp, ps, cs = buf.shape
    if cs == cs_new:
        return buf
    assert cs % cs_new == 0, (cs, cs_new)
    r = cs // cs_new
    return (
        buf.reshape(k, xp, ps, r, cs_new)
        .transpose(0, 3, 1, 2, 4)
        .reshape(k * r, xp, ps, cs_new)
    )


def shard_weights(
    w: jnp.ndarray, cins: Sequence[int], cout: int, csi: Optional[int] = None
):
    """(3,3,3,Cin_total,Cout) DHWIO -> per-branch (Kin, Kout, 27, csi, cso).

    Tap index = dx'*9 + dy'*3 + dz' (row-major, d' = d+1), matching the
    kernel's tap loop."""
    taps = w.reshape(27, sum(cins), cout)
    cso = shard_width(cout)
    kout = cout // cso
    csi = csi or pair_width(cins)
    out, c0 = [], 0
    for ci in cins:
        kin = ci // csi
        wb = taps[:, c0 : c0 + ci, :]
        wb = wb.reshape(27, kin, csi, kout, cso).transpose(1, 3, 0, 2, 4)
        out.append(wb)
        c0 += ci
    return out


def mirror_transpose_shards(wb: jnp.ndarray) -> jnp.ndarray:
    """(Kin, Kout, 27, csi, cso) -> (Kout, Kin, 27, cso, csi) mirrored.

    Turns forward weight shards into transposed-conv shards for the dx
    pass: conv(dconv, mirror_transpose(W)) == conv^T(dconv, W)."""
    return jnp.flip(wb, axis=2).transpose(1, 0, 2, 4, 3)


def _masked_affine_plane(ref_plane, ab, mask, px, g: Geom):
    """(plane, cs) plane -> mask * (a*x + b), fp32 -> input dtype.

    px is the UNCLAMPED plane index: out-of-range halo planes (clamped
    fetches at the volume ends) mask to exact zeros, so the clamped
    BlockSpec index maps never leak data."""
    a = ab[0:1, :]
    b = ab[1:2, :]
    mj = mask * jnp.where((px >= 1) & (px <= g.X), 1.0, 0.0)
    return ((ref_plane.astype(jnp.float32) * a + b) * mj).astype(
        ref_plane.dtype
    )


# ---------------------------------------------------------------------------
# forward / plain-conv kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    *refs,
    g: Geom,
    kout: int,
    has_affine: bool,
    relu: bool,
    stats: bool,
    out_dtype,
):
    i = 0
    xprev, xmid, xnext = refs[i : i + 3]  # (1, 1, plane, cs) blocks
    i += 3
    ab_ref = None
    if has_affine:
        ab_ref = refs[i]  # (1, 2, cs)
        i += 1
    w_ref = refs[i]  # (1, kout, 27, cs, cso)
    bias_ref = refs[i + 1]  # (kout, 1, cso)
    mask_ref = refs[i + 2]  # (plane, 1)
    i += 3
    y_ref = refs[i]  # (kout, 1, plane, cso) block
    sums_ref = refs[i + 1]  # (kout, 2, cso)
    i += 2
    xn, acc, stat_acc = refs[i : i + 3]

    t = pl.program_id(0)
    ki = pl.program_id(1)
    n_t = pl.num_programs(0)
    n_ki = pl.num_programs(1)
    ps = g.plane
    gp = g.vguard
    mask = mask_ref[...]

    border = (t == 0) | (t == n_t - 1)

    @pl.when((t <= 1) & (ki == 0))
    def _():  # zero the xn guard rows once (scratch starts uninitialized)
        for j in range(3):
            xn[j, 0:gp, :] = jnp.zeros_like(xn[j, 0:gp, :])
            xn[j, gp + ps :, :] = jnp.zeros_like(xn[j, gp + ps :, :])

    @pl.when(jnp.logical_not(border))
    def _():
        # normalize the three source planes (or just copy, when the input
        # is already normalized / this is a plain conv)
        for j, src in enumerate((xprev, xmid, xnext)):
            if has_affine:
                xn[j, gp : gp + ps, :] = _masked_affine_plane(
                    src[0, 0], ab_ref[0], mask, t + j - 1, g
                )
            else:
                xn[j, gp : gp + ps, :] = src[0, 0]

        for ko in range(kout):
            for tap in range(27):
                dx, rem = divmod(tap, 9)
                dy, dz = divmod(rem, 3)
                s = gp + (dy - 1) * g.Zp + (dz - 1)
                contrib = jax.lax.dot_general(
                    xn[dx, s : s + ps, :],
                    w_ref[0, ko, tap],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if tap == 0:
                    @pl.when(ki == 0)
                    def _(ko=ko, contrib=contrib):
                        acc[ko] = contrib

                    @pl.when(ki != 0)
                    def _(ko=ko, contrib=contrib):
                        acc[ko] += contrib
                else:
                    acc[ko] += contrib

        @pl.when(ki == n_ki - 1)
        def _():
            # mask covers y/z pad rows; the plane factor zeroes back-pad
            # planes (X < t < Xp-1) that the grid still computes
            mask_t = mask * jnp.where(t <= g.X, 1.0, 0.0)
            for ko in range(kout):
                out = acc[ko] + bias_ref[ko]
                if relu:
                    out = jnp.maximum(out, 0.0)
                out = out * mask_t
                y_ref[ko, 0] = out.astype(out_dtype)
                if stats:
                    of = out.astype(jnp.float32)
                    s0 = jnp.sum(of, axis=0, keepdims=True)
                    s1 = jnp.sum(of * of, axis=0, keepdims=True)
                    new = jnp.concatenate([s0, s1], axis=0)

                    @pl.when(t == 1)
                    def _(ko=ko, new=new):
                        stat_acc[ko] = new

                    @pl.when(t != 1)
                    def _(ko=ko, new=new):
                        stat_acc[ko] += new

    @pl.when(border & (ki == n_ki - 1))
    def _():  # outermost pad planes are written as exact zeros
        y_ref[...] = jnp.zeros_like(y_ref)

    if stats:
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
    interpret: bool = False,
):
    """Run the fused conv over a channel-sharded input.

    x: (Kin, Xp, plane, cs); ab: (Kin, 2, cs) or None;
    w: (Kin, Kout, 27, cs, cso); bias: (Cout,) or None.
    Returns (y (Kout, Xp, plane, cso), sums (Kout, 2, cso) f32).
    """
    kin, xp, ps, cs = (int(v) for v in x.shape)
    assert xp == g.Xp and ps == g.plane, (x.shape, g)
    kout, cso = int(w.shape[1]), int(w.shape[-1])
    assert w.shape == (kin, kout, 27, cs, cso), (w.shape,)
    out_dtype = out_dtype or x.dtype
    if bias is None:
        bias = jnp.zeros((kout * cso,), jnp.float32)

    kern = functools.partial(
        _fwd_kernel,
        g=g,
        kout=kout,
        has_affine=ab is not None,
        relu=relu,
        stats=stats,
        out_dtype=out_dtype,
    )

    last = g.Xp - 1
    in_specs = [
        pl.BlockSpec(
            (1, 1, ps, cs),
            lambda t, ki: (ki, jnp.maximum(t - 1, 0), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, ps, cs), lambda t, ki: (ki, t, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, 1, ps, cs),
            lambda t, ki: (ki, jnp.minimum(t + 1, last), 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [x, x, x]
    if ab is not None:
        assert ab.shape == (kin, 2, cs), (ab.shape,)
        in_specs.append(
            pl.BlockSpec(
                (1, 2, cs), lambda t, ki: (ki, 0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(ab.astype(jnp.float32))
    in_specs += [
        pl.BlockSpec(
            (1, kout, 27, cs, cso),
            lambda t, ki: (ki, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (kout, 1, cso), lambda t, ki: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((ps, 1), lambda t, ki: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands += [
        w,
        bias.reshape(kout, 1, cso).astype(jnp.float32),
        jnp.asarray(g.interior_mask_rows()),
    ]

    y, sums = pl.pallas_call(
        kern,
        grid=(g.Xp, kin),
        in_specs=in_specs,
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
            pltpu.VMEM((3, ps + 2 * g.vguard, cs), x.dtype),
            pltpu.VMEM((kout, ps, cso), jnp.float32),
            pltpu.VMEM((kout, 2, cso), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
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
):
    i = 0
    xprev, xmid, xnext = refs[i : i + 3]
    i += 3
    ab_ref = None
    if has_affine:
        ab_ref = refs[i]
        i += 1
    dconv_ref = refs[i]  # (kout, 1, plane, cso) block
    mask_ref = refs[i + 1]
    i += 2
    dw_ref = refs[i]  # (1, kout, 27, cs, cso) block
    i += 1
    xn = refs[i]

    ki = pl.program_id(0)
    t = pl.program_id(1)
    ps = g.plane
    gp = g.vguard
    mask = mask_ref[...]

    @pl.when((ki == 0) & (t == 0))
    def _():  # zero the xn guard rows once
        for j in range(3):
            xn[j, 0:gp, :] = jnp.zeros_like(xn[j, 0:gp, :])
            xn[j, gp + ps :, :] = jnp.zeros_like(xn[j, gp + ps :, :])

    for j, src in enumerate((xprev, xmid, xnext)):
        if has_affine:
            xn[j, gp : gp + ps, :] = _masked_affine_plane(
                src[0, 0], ab_ref[0], mask, t + j - 1, g
            )
        else:
            xn[j, gp : gp + ps, :] = src[0, 0]

    # dconv is exactly zero on every pad row/plane (forward mask + ReLU
    # cotangent), so full-plane contractions are exact, and the t=0 /
    # t=Xp-1 border planes contribute nothing.
    for ko in range(kout):
        for tap in range(27):
            dx, rem = divmod(tap, 9)
            dy, dz = divmod(rem, 3)
            s = gp + (dy - 1) * g.Zp + (dz - 1)
            contrib = jax.lax.dot_general(
                xn[dx, s : s + ps, :],
                dconv_ref[ko, 0],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            @pl.when(t == 0)
            def _(ko=ko, tap=tap, contrib=contrib):
                dw_ref[0, ko, tap] = contrib

            @pl.when(t != 0)
            def _(ko=ko, tap=tap, contrib=contrib):
                dw_ref[0, ko, tap] += contrib


def conv_wgrad_shards(
    x: jnp.ndarray,
    ab: Optional[jnp.ndarray],
    dconv: jnp.ndarray,
    *,
    g: Geom,
    interpret: bool = False,
) -> jnp.ndarray:
    """dW[ki, ko, tap] = sum_rows xn[ki, row + off(tap)] (x) dconv[ko, row].

    x: (Kin, Xp, ps, cs); dconv: (Kout, Xp, ps, cso), zero on pad rows.
    Returns (Kin, Kout, 27, cs, cso) f32."""
    kin, xp, ps, cs = (int(v) for v in x.shape)
    kout, cso = int(dconv.shape[0]), int(dconv.shape[-1])
    assert xp == g.Xp and ps == g.plane, (x.shape, g)

    kern = functools.partial(
        _wgrad_kernel, g=g, kout=kout, has_affine=ab is not None
    )
    last = g.Xp - 1
    in_specs = [
        pl.BlockSpec(
            (1, 1, ps, cs),
            lambda ki, t: (ki, jnp.maximum(t - 1, 0), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, ps, cs), lambda ki, t: (ki, t, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, 1, ps, cs),
            lambda ki, t: (ki, jnp.minimum(t + 1, last), 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [x, x, x]
    if ab is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, 2, cs), lambda ki, t: (ki, 0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(ab.astype(jnp.float32))
    in_specs += [
        pl.BlockSpec(
            (kout, 1, ps, cso),
            lambda ki, t: (0, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((ps, 1), lambda ki, t: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands += [dconv, jnp.asarray(g.interior_mask_rows())]

    dw = pl.pallas_call(
        kern,
        grid=(kin, g.Xp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, kout, 27, cs, cso),
            lambda ki, t: (ki, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((kin, kout, 27, cs, cso), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, ps + 2 * g.vguard, cs), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    return dw


# ---------------------------------------------------------------------------
# the differentiable fused block
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_conv_block(x1, x2, ab, ws, bias, g, n_inputs, interpret):
    """relu(conv3x3x3(mask*(a*x + b), W) + bias) with GN stat sums, fused.

    x1/x2: (Kin_i, Xp, plane, cs) padded shard buffers (x2 is a
    (1, 2, 16, 8) dummy when n_inputs == 1); ab: (Kin_total, 2, cs)
    per-channel affine (the previous GroupNorm, applied lazily under the
    interior mask); ws: tuple of per-input (Kin_i, Kout, 27, cs, cso)
    weight shards; bias: (Cout,).  Returns
    (y (Kout, Xp, plane, cso), sums (Kout, 2, cso) f32) where sums hold
    per-channel sum / sum-of-squares of y over the interior volume."""
    x = jnp.concatenate([x1, x2], axis=0) if n_inputs == 2 else x1
    w = jnp.concatenate(list(ws), axis=0) if n_inputs == 2 else ws[0]
    y, sums = conv_shards(
        x, ab, w, bias, g=g, relu=True, stats=True, interpret=interpret
    )
    return y, sums


def _fused_fwd(x1, x2, ab, ws, bias, g, n_inputs, interpret):
    y, sums = fused_conv_block(x1, x2, ab, ws, bias, g, n_inputs, interpret)
    return (y, sums), (x1, x2, ab, ws, y)


def _fused_bwd(g, n_inputs, interpret, res, cts):
    x1, x2, ab, ws, y = res
    dy, dsums = cts
    xs = [x1, x2][:n_inputs]
    kins = [int(v.shape[0]) for v in xs]

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

    dbias = jnp.sum(dconv.astype(jnp.float32), axis=(1, 2))  # (Kout, cso)
    dbias = dbias.reshape(-1)

    x_cat = jnp.concatenate(xs, axis=0) if n_inputs == 2 else x1
    dw_cat = conv_wgrad_shards(x_cat, ab, dconv, g=g, interpret=interpret)

    # transposed conv for dxn (plain: no affine / relu / stats)
    w_cat = jnp.concatenate(list(ws), axis=0) if n_inputs == 2 else ws[0]
    wt = mirror_transpose_shards(w_cat)
    dxn, _ = conv_shards(
        dconv,
        None,
        wt,
        None,
        g=g,
        relu=False,
        stats=False,
        out_dtype=y.dtype,
        interpret=interpret,
    )  # (Kin_total, Xp, ps, cs)

    # d(affine) + dx: only interior rows count for the reductions — dxn
    # rows in the pad ring carry real-but-discarded gradients.
    mask = jnp.asarray(_interior_mask_3d(g))  # (1, Xp, ps, 1)
    a = ab[:, 0:1, :][:, None, :, :]  # (Kin, 1, 1, cs)
    dx_cat = (dxn.astype(jnp.float32) * a).astype(x1.dtype)
    dxn_m = dxn.astype(jnp.float32) * mask
    da = jnp.sum(x_cat.astype(jnp.float32) * dxn_m, axis=(1, 2))  # (Kin, cs)
    db = jnp.sum(dxn_m, axis=(1, 2))
    dab = jnp.stack([da, db], axis=1).astype(ab.dtype)

    k0 = 0
    dws, dx_list = [], []
    for kin in kins:
        dws.append(dw_cat[k0 : k0 + kin].astype(ws[0].dtype))
        dx_list.append(dx_cat[k0 : k0 + kin])
        k0 += kin
    dx1 = dx_list[0]
    dx2 = dx_list[1] if n_inputs == 2 else jnp.zeros_like(x2)
    return dx1, dx2, dab, tuple(dws), dbias.astype(jnp.float32)


fused_conv_block.defvjp(_fused_fwd, _fused_bwd)


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
