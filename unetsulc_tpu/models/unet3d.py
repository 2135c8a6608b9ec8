"""3D U-Net in flax — the framework's flagship model.

Re-implements the observable architecture of
``deepsulci.deeptools.models.UNet3D`` (SURVEY.md §2.3; ctor usage at
ref training.py:65-67 and ref pattern_class.py:352-356):

* encoder channel ladder ``init_ch -> 2i -> 4i -> 8i`` with each block a
  DoubleConv of 3x3x3 convs in configurable 'crg' order
  (conv -> ReLU -> GroupNorm);
* encoder downsampling by MaxPool3d(kernel 2, stride 2, padding 1) — the
  padding keeps odd extents alive (out = floor(d/2) + 1);
* three decoders named ``decoders.{0,1,2}`` (the transfer-learning freeze
  contract, ref transfer_learning/transfer_learning.py:69) that upsample by
  trilinear interpolation to the skip's spatial size, concat, DoubleConv;
* a swappable ``final_conv`` 1x1x1 head, optionally an ``nn.Sequential`` of
  ``num_conv`` 1x1x1 convs with linearly interpolated channel counts
  (ref pattern_class.py:357-365);
* final softmax/sigmoid applied only in eval mode (torch semantics:
  ``final_activation`` runs when ``not self.training``) — training code
  consumes raw logits for the cross-entropy.

TPU-first choices: channels-last (N, X, Y, Z, C) layout so XLA maps convs
onto the MXU, bfloat16 compute with float32 params and float32 GroupNorm
statistics, and a Pallas fused GroupNorm(+ReLU) kernel on the hot path
(:mod:`unetsulc_tpu.ops.groupnorm`).

Parameter tree naming intentionally mirrors the torch ``state_dict`` keys
(``encoders_0/double_conv/conv1`` <-> ``encoders.0.double_conv.conv1``) so
``.mdsm`` import/export is a mechanical rename + transpose
(:mod:`unetsulc_tpu.models.torch_interop`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from unetsulc_tpu.ops.groupnorm import group_norm
from unetsulc_tpu.ops.resize import resize_trilinear, resize_trilinear_buf
from unetsulc_tpu.ops import conv_pallas as cp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PallasVol:
    """A volume flowing through the fused-Pallas block pipeline.

    ``buf`` is the (K, Xp, plane, cs) shard buffer of RAW post-ReLU conv
    outputs (ops/conv_pallas.py layout); ``aff`` the pending lazy GroupNorm
    affine (K, 2, cs) — consumed by the next conv kernel, or materialized
    at pool / head boundaries; ``g`` the static padded geometry."""

    buf: jnp.ndarray
    aff: Optional[jnp.ndarray]
    g: cp.Geom

    @property
    def channels(self) -> int:
        return self.buf.shape[0] * self.buf.shape[-1]

    def interior(self) -> jnp.ndarray:
        """Materialize the normalized (1, X, Y, Z, C) interior view."""
        return cp.apply_affine_5d(cp.unpad_from_geom(self.buf, self.g), self.aff)

    def tree_flatten(self):
        return (self.buf, self.aff), self.g

    @classmethod
    def tree_unflatten(cls, g, children):
        return cls(children[0], children[1], g)


def _wrap_pallas(x5: jnp.ndarray, aff: Optional[jnp.ndarray]) -> "PallasVol":
    g = cp.make_geom(*x5.shape[1:4])
    return PallasVol(cp.pad_to_geom(x5, g), aff, g)


def _pallas_interpret() -> bool:
    return jax.default_backend() != "tpu"


# largest interpret-mode (CPU test backend) volume the Pallas pipeline
# will EXECUTE; see _pallas_eligible
_INTERPRET_SIZE_LIMIT = 4096


def pick_num_groups(channels: int, preferred: int = 32) -> int:
    """Largest divisor of ``channels`` that is <= ``preferred``.

    torch GroupNorm(32, C) requires 32 | C; the deepsulci configs always
    satisfy that (init_channel_number 64 => all widths are multiples of 32).
    Smaller test configs need a valid fallback.
    """
    g = min(preferred, channels)
    while channels % g:
        g -= 1
    return g


def max_pool_3d(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool3d(kernel_size=2, stride=2, padding=1) on (..., X, Y, Z, C).

    -inf padding reproduces torch's padded max pooling; output extent is
    floor(d/2) + 1 per axis.

    Kept as reduce_window (select_and_scatter backward): measured FASTER
    here than the reshape-window custom VJP in ops.pooling, because XLA
    lays this graph out in its blocked conv layout and the window-view
    reshapes force relayout copies (5.49M vs 6.04M voxels/s on v5e).  The
    custom-VJP variant wins only on natively-laid-out buffers (the Pallas
    fast path).
    """
    spatial = [(1, 1)] * 3
    pads = [(0, 0)] + spatial + [(0, 0)]
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, 2, 2, 2, 1),
        window_strides=(1, 2, 2, 2, 1),
        padding=pads,
    )


class SplitConv3(nn.Module):
    """3x3x3 same-padding conv that also accepts a *pair* of inputs.

    Given ``(a, b)`` it computes ``conv(concat(a, b))`` WITHOUT
    materializing the concatenation, by linearity:
    ``conv(concat(a,b), W) = conv(a, W[..., :Ca, :]) + conv(b, W[..., Ca:, :])``.
    The decoder's skip-concat tensor at full resolution is ~340 MB bf16
    (96^3 x 192ch) per direction — this keeps it out of HBM entirely.
    Parameter names/shapes are identical to ``nn.Conv`` (kernel slicing
    happens at trace time), so torch ``.mdsm`` interop is unaffected.
    """

    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16
    # spatial parallel (parallel/sp_pallas.py): mesh axis name over which
    # the volume X axis is sharded; conv inputs then carry neighbor halo
    # planes exchanged with one ppermute per input and the kernels run in
    # halo mode
    sp_axis: Optional[str] = None
    # sharded POOLED middle level (slab+E layout, sp_pallas.py
    # ring_fill_mid): the E duplicate plane exchanges alongside the rings
    # and unowned outputs are masked via the kernels' valid_out
    sp_mid: bool = False

    @nn.compact
    def __call__(self, x):
        pair = isinstance(x, (tuple, list))
        pallas = isinstance(x[0] if pair else x, PallasVol)
        dense_entry = isinstance(x, cp.DenseEntry)
        if dense_entry:
            cin = x.x5.shape[-1]
        elif pallas:
            cin = sum(v.channels for v in (x if pair else [x]))
        else:
            cin = x[0].shape[-1] + x[1].shape[-1] if pair else x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        if dense_entry:
            if self.sp_axis is not None:
                from unetsulc_tpu.parallel.sp_pallas import ring_planes_5d

                return cp.conv3d_dense_entry(
                    ring_planes_5d(x.x5, self.sp_axis), kernel, bias,
                    self.compute_dtype, ring=True,
                )
            return cp.conv3d_dense_entry(
                x.x5, kernel, bias, self.compute_dtype
            )
        if pallas:
            return self._pallas_call(x if pair else [x], kernel, bias)
        precision = (
            jax.lax.Precision.HIGHEST
            if self.compute_dtype == jnp.float32
            else None
        )
        k = kernel.astype(self.compute_dtype)

        def conv(v, kk):
            return jax.lax.conv_general_dilated(
                v.astype(self.compute_dtype),
                kk,
                window_strides=(1, 1, 1),
                padding=((1, 1), (1, 1), (1, 1)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                precision=precision,
            )

        if pair:
            ca = x[0].shape[-1]
            out = conv(x[0], k[:, :, :, :ca, :]) + conv(x[1], k[:, :, :, ca:, :])
        else:
            out = conv(x, k)
        return out + bias.astype(out.dtype)

    def _pallas_call(self, vols, kernel, bias):
        """Fused conv3x3x3 + ReLU + GN-stat-sums on PallasVol inputs.

        Returns (y_buf, sums, g): the raw post-ReLU output shards and the
        per-channel stat sums the caller turns into the next lazy GN
        affine.  Each branch keeps its natural shard width; pending input
        affines are consumed inside the kernel.  With ``sp_axis`` set the
        inputs are local slabs: their ring planes are filled from the
        neighbor shards (one ppermute each) and the kernels run in halo
        mode — the returned sums are still LOCAL (the caller psums)."""
        g = vols[0].g
        assert all(v.g == g for v in vols), [v.g for v in vols]
        cins = [v.channels for v in vols]
        ws = cp.shard_weights(kernel.astype(self.compute_dtype), cins,
                              self.features)
        abs_ = [
            v.aff if v.aff is not None
            else cp.identity_affine(v.buf.shape[0], v.buf.shape[-1])
            for v in vols
        ]
        xs = [v.buf for v in vols]
        halo = self.sp_axis is not None
        valid_out = None
        if halo and self.sp_mid:
            from unetsulc_tpu.parallel.sp_pallas import ring_fill_mid

            filled = [ring_fill_mid(xb, self.sp_axis) for xb in xs]
            xs = [f[0] for f in filled]
            valids = [f[1] for f in filled]
            valid_out = filled[0][2]
        elif halo:
            from unetsulc_tpu.parallel.sp_pallas import ring_fill

            filled = [ring_fill(xb, self.sp_axis) for xb in xs]
            xs = [f[0] for f in filled]
            valids = [f[1] for f in filled]
        else:
            valids = [None for _ in xs]
        if len(vols) == 1:
            dt = xs[0].dtype
            xs = xs + [jnp.zeros((1, 2, 16, 8), dt)]
            abs_ = abs_ + [jnp.zeros((1, 2, 8), jnp.float32)]
            ws = list(ws) + [jnp.zeros((1, 1, 27, 8, 8), dt)]
            valids = valids + [jnp.ones((2,), jnp.float32) if halo else None]
        y, sums = cp.fused_conv_block(
            xs[0], xs[1], abs_[0], abs_[1], ws[0], ws[1], bias,
            valids[0], valids[1], valid_out, len(vols), g,
            _pallas_interpret(), halo,
        )
        return y, sums, g


class DoubleConv(nn.Module):
    """Two 3x3x3 convs applying ops in ``order`` per conv.

    order chars: 'c' conv3x3x3 (padding 1, bias), 'r' ReLU, 'g' GroupNorm
    (must come after the conv).  BatchNorm ('b') is intentionally
    unsupported — reference configs use 'crg' (ref pattern_class.py:95);
    raise loudly rather than silently diverge.

    Channel split follows the torch original:
    encoder (in < out): conv1 in->out//2, conv2 out//2->out;
    decoder (in >= out): conv1 in->out, conv2 out->out.

    Param paths (``conv1``, ``norm1_scale``, ...) are chosen so the torch
    state_dict keys ``double_conv.conv1.weight`` / ``double_conv.norm1.weight``
    map mechanically (see torch_interop).
    """

    in_channels: int
    out_channels: int
    order: str = "crg"
    compute_dtype: jnp.dtype = jnp.bfloat16
    pallas: bool = False
    sp_axis: Optional[str] = None
    # slab+E mid-level sharding (parallel/sp_pallas.py sp_mid_geom)
    sp_mid: bool = False

    def _block_pallas(self, x, pos: int, out_channels: int) -> "PallasVol":
        """One fused 'crg' unit on the Pallas pipeline.

        PallasVol (or pair) input -> fused conv+ReLU+stat kernel; a plain
        (1,X,Y,Z,C) array input (the tiny in_channels->mid first conv,
        whose shard width would underfeed the MXU) runs the XLA conv +
        ReLU and enters the pipeline here.  Either way GroupNorm becomes
        the lazy affine carried by the returned PallasVol.

        With ``sp_axis`` the convs run in spatial-parallel halo mode and
        the GroupNorm statistics go GLOBAL: the per-shard stat sums psum
        over the space axis before the affine forms, so normalization is
        the same computation as single-device up to reduction order."""
        if isinstance(x, jnp.ndarray):
            if x.shape[-1] <= 8:
                # dense 27*cin-contraction entry conv: the XLA channels-last
                # conv at this width drags ~20 ms/step of bad-layout
                # relu/stat/wgrad fusions into the otherwise row-major graph
                y_buf, sums, g = SplitConv3(
                    features=out_channels,
                    compute_dtype=self.compute_dtype,
                    sp_axis=self.sp_axis,
                    name=f"conv{pos}",
                )(cp.DenseEntry(x))
            else:
                assert self.sp_axis is None, (
                    "spatial-parallel entry requires the dense-entry path"
                )
                y = SplitConv3(
                    features=out_channels,
                    compute_dtype=self.compute_dtype,
                    name=f"conv{pos}",
                )(x)
                y = nn.relu(y)
                sums = cp.stat_sums_5d(y, cp.shard_width(out_channels))
                vol = _wrap_pallas(y, None)
                y_buf, g = vol.buf, vol.g
        else:
            y_buf, sums, g = SplitConv3(
                features=out_channels,
                compute_dtype=self.compute_dtype,
                sp_axis=self.sp_axis,
                sp_mid=self.sp_mid,
                name=f"conv{pos}",
            )(x)
        scale = self.param(
            f"norm{pos}_scale", nn.initializers.ones, (out_channels,),
            jnp.float32,
        )
        bias = self.param(
            f"norm{pos}_bias", nn.initializers.zeros, (out_channels,),
            jnp.float32,
        )
        count = g.voxels
        if self.sp_axis is not None:
            sums = jax.lax.psum(sums, self.sp_axis)
            n = jax.lax.axis_size(self.sp_axis)
            if self.sp_mid:
                # slab+E geometry: shards own g.X - 1 = P planes each plus
                # ONE global trailing plane (on the last shard); unowned E
                # duplicates are masked out of the psum'd sums, so the
                # normalizing count is the true global pooled voxel count
                count = (n * (g.X - 1) + 1) * g.Y * g.Z
            else:
                count = g.voxels * n
        aff = cp.gn_affine_from_sums(
            sums, scale, bias, pick_num_groups(out_channels), count
        )
        return PallasVol(y_buf, aff, g)

    def _block(self, x, pos: int, out_channels: int) -> jnp.ndarray:
        if self.pallas:
            if self.order != "crg":
                raise ValueError("pallas blocks support only 'crg' order")
            return self._block_pallas(x, pos, out_channels)
        if isinstance(x, (tuple, list)) and not self.order.startswith("c"):
            raise ValueError(
                "pair (concat-free) inputs require the conv first in order"
            )
        for i, char in enumerate(self.order):
            if char == "c":
                x = SplitConv3(
                    features=out_channels,
                    compute_dtype=self.compute_dtype,
                    name=f"conv{pos}",
                )(x)
            elif char == "r":
                x = nn.relu(x)
            elif char == "g":
                if i < self.order.index("c"):
                    raise ValueError("GroupNorm must come after the conv")
                x = group_norm(
                    x,
                    num_groups=pick_num_groups(out_channels),
                    scale=self.param(
                        f"norm{pos}_scale",
                        nn.initializers.ones,
                        (out_channels,),
                        jnp.float32,
                    ),
                    bias=self.param(
                        f"norm{pos}_bias",
                        nn.initializers.zeros,
                        (out_channels,),
                        jnp.float32,
                    ),
                )
            else:
                raise ValueError(f"Unsupported conv_layer_order char: {char!r}")
        return x

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.in_channels < self.out_channels:
            mid = self.out_channels // 2
        else:
            mid = self.out_channels
        x = self._block(x, 1, mid)
        x = self._block(x, 2, self.out_channels)
        return x


class Encoder(nn.Module):
    in_channels: int
    out_channels: int
    pool: bool = True
    order: str = "crg"
    compute_dtype: jnp.dtype = jnp.bfloat16
    pallas: bool = False
    sp_axis: Optional[str] = None
    # spatial-parallel boundary encoder (level 1): pool the sharded level-0
    # slabs IN PLACE (the pool only needs the left halo plane).  With
    # ``sp_mid`` the pooled slabs STAY LOCAL (slab+E layout) and this
    # encoder's DoubleConv runs sharded in halo mode (sp_pool_local);
    # otherwise the POOLED output all-gathers for the replicated middle
    # (sp_pool_gather).  Either way no full-resolution buffer is ever
    # replicated (parallel/sp_pallas.py).
    sp_pool_axis: Optional[str] = None
    # sharded-middle encoder (level 1): see sp_pool_axis
    sp_mid: bool = False
    # deep-sharded encoder (level 2, ``sp_shard_deep``): the input is the
    # sharded level-1 slab+E output — pool it locally into the NEXT
    # slab+E layout (sp_pool_local_mid) and run this DoubleConv sharded
    # too
    sp_pool_from_mid: bool = False
    # boundary into the replicated deep levels: the input is a sharded
    # slab+E output — all-gather it (still pooled-size or smaller) into
    # the replicated volume this and the deeper levels run on
    sp_gather_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.sp_axis is None or self.sp_mid or not self.pool, (
            "spatial-parallel encoders are pool-free (level 0 only) "
            "except the sharded slab+E encoders (sp_mid)"
        )
        if self.pool:
            if isinstance(x, PallasVol):
                if self.sp_pool_axis is not None and self.sp_pool_from_mid:
                    from unetsulc_tpu.parallel.sp_pallas import (
                        sp_pool_local_mid,
                    )

                    buf, gg = sp_pool_local_mid(
                        x.buf, x.aff, x.g, self.sp_pool_axis
                    )
                    x = PallasVol(buf, None, gg)
                elif self.sp_pool_axis is not None and self.sp_mid:
                    from unetsulc_tpu.parallel.sp_pallas import (
                        sp_pool_local,
                    )

                    buf, gg = sp_pool_local(
                        x.buf, x.aff, x.g, self.sp_pool_axis
                    )
                    x = PallasVol(buf, None, gg)
                elif self.sp_pool_axis is not None:
                    from unetsulc_tpu.parallel.sp_pallas import (
                        sp_pool_gather,
                    )

                    buf, gg = sp_pool_gather(
                        x.buf, x.aff, x.g, self.sp_pool_axis
                    )
                    x = PallasVol(buf, None, gg)
                else:
                    if self.sp_gather_axis is not None:
                        # x is the sharded middle's local slab+E output:
                        # gather (pooled-size) into the replicated volume
                        from unetsulc_tpu.parallel.sp_pallas import (
                            sp_mid_gather,
                        )

                        buf, gg = sp_mid_gather(
                            x.buf, x.g, self.sp_gather_axis
                        )
                        x = PallasVol(buf, x.aff, gg)
                    # buffer-native pool: consumes the pending GN affine
                    # (max does not commute with it), first-match tie
                    # backward (torch semantics), stays in the row layout
                    x = PallasVol(
                        cp.max_pool_buf(
                            x.buf, x.aff, x.g, _pallas_interpret()
                        ),
                        None,
                        cp.pool_geom(x.g),
                    )
            else:
                x = max_pool_3d(x)
        return DoubleConv(
            self.in_channels,
            self.out_channels,
            self.order,
            compute_dtype=self.compute_dtype,
            pallas=self.pallas,
            sp_axis=self.sp_axis,
            sp_mid=self.sp_mid,
            name="double_conv",
        )(x)


class UpsampleTranspose(nn.Module):
    """Transposed-conv 2x upsampling — the ``interpolate=False`` decoder path.

    Matches torch ``nn.ConvTranspose3d(C, C, kernel_size=3, stride=2,
    padding=1, output_padding=1)`` (the deepsulci UNet3D's ``upsample``
    submodule; the ctor flag is threaded from parameters.json
    ``dict_model.interpolate`` via ref pattern_class.py:81-85 and ref
    training.py:65-67).  Implemented as the standard dilated-conv
    equivalence: conv(lhs_dilation=2, padding (1,2) per axis) with the
    spatially flipped kernel — output extent is exactly ``2*d`` per axis,
    torch's ``(d-1)*2 - 2*p + k + op``.

    The param is stored as ``kernel`` (kX, kY, kZ, Cin, Cout) — the direct
    axis-permutation of torch's ConvTranspose3d (Cin, Cout, kX, kY, kZ)
    layout, NO flip — so ``.mdsm`` interop stays a mechanical transpose
    (models/torch_interop.py handles the ``upsample`` name).
    """

    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        precision = (
            jax.lax.Precision.HIGHEST
            if self.compute_dtype == jnp.float32
            else None
        )
        k = jnp.flip(kernel.astype(self.compute_dtype), axis=(0, 1, 2))
        out = jax.lax.conv_general_dilated(
            x.astype(self.compute_dtype),
            k,
            window_strides=(1, 1, 1),
            padding=((1, 2), (1, 2), (1, 2)),
            lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            precision=precision,
        )
        return out + bias.astype(out.dtype)


class Decoder(nn.Module):
    in_channels: int
    out_channels: int
    interpolate: bool = True
    order: str = "crg"
    compute_dtype: jnp.dtype = jnp.bfloat16
    pallas: bool = False
    sp_axis: Optional[str] = None
    # sharded-middle decoder (level 1): the skip is encoder 1's LOCAL
    # slab+E volume; the replicated deeper input resizes straight to this
    # shard's slab+E rows and the pair convs run sharded in halo mode
    sp_mid: bool = False
    # full-resolution decoder (level 2) when the middle is sharded: the
    # input is decoder 1's LOCAL slab+E output — all-gather (pooled-size)
    # before the row-sliced upsample
    sp_gather: bool = False

    @nn.compact
    def __call__(
        self, encoder_features: jnp.ndarray, x: jnp.ndarray
    ) -> jnp.ndarray:
        if not self.interpolate:
            # transposed-conv upsampling (CONTRACTS.md §5): ConvTranspose
            # doubles each extent, but the skip has floor(d/2)+1 -> d
            # semantics from the PADDED maxpool, so the upstream module
            # would produce d+1 / d+2 rows and crash at the concat; the
            # pinned completion crops the leading corner to the skip's
            # extent.  Not Pallas-eligible (interpolate gate); XLA path.
            assert not isinstance(x, PallasVol)
            target = encoder_features.shape[1:4]
            up = UpsampleTranspose(
                features=x.shape[-1],
                compute_dtype=self.compute_dtype,
                name="upsample",
            )(x)
            up = up[:, : target[0], : target[1], : target[2], :]
            return DoubleConv(
                self.in_channels,
                self.out_channels,
                self.order,
                compute_dtype=self.compute_dtype,
                name="double_conv",
            )((encoder_features, up.astype(encoder_features.dtype)))
        if isinstance(x, PallasVol):
            # trilinear resize is affine-commuting (weights sum to 1 per
            # output voxel), so resize the RAW buffer and keep the lazy GN
            # affine pending into the pair conv
            gt = encoder_features.g
            if self.sp_axis is not None and self.sp_mid:
                # sharded slab+E level: resize the replicated deeper
                # output straight to this shard's slab+E rows
                # (parallel/sp_pallas.py) — the pair conv below runs
                # sharded against the level's local skip
                from unetsulc_tpu.parallel.sp_pallas import (
                    sp_mid_gather,
                    sp_resize_to_slab_mid,
                )

                if self.sp_gather:
                    # the deeper decoder ran sharded too (sp_shard_deep):
                    # gather its local slab+E output (level-2 size) into
                    # the replicated volume the resize reads
                    buf, gg = sp_mid_gather(x.buf, x.g, self.sp_axis)
                    x = PallasVol(buf, x.aff, gg)
                up5 = sp_resize_to_slab_mid(
                    cp.unpad_from_geom(x.buf, x.g), gt, self.sp_axis
                )
                up = PallasVol(cp.pad_to_geom(up5, gt), x.aff, gt)
            elif self.sp_axis is not None:
                # x is the middle output; each device computes only its
                # slab of the full-resolution upsample (the X
                # interpolation matrix is row-sliced per shard)
                from unetsulc_tpu.parallel.sp_pallas import (
                    sp_mid_gather,
                    sp_resize_to_slab,
                )

                if self.sp_gather:
                    # decoder 1 ran sharded: gather its local slab+E
                    # output (pooled-size) into the replicated volume
                    buf, gg = sp_mid_gather(x.buf, x.g, self.sp_axis)
                    x = PallasVol(buf, x.aff, gg)
                up5 = sp_resize_to_slab(
                    cp.unpad_from_geom(x.buf, x.g), gt, self.sp_axis
                )
                up = PallasVol(cp.pad_to_geom(up5, gt), x.aff, gt)
            else:
                # buffer-native resize: no unpad/repad or shard-merge glue
                up = PallasVol(
                    resize_trilinear_buf(x.buf, x.g, gt), x.aff, gt
                )
            return DoubleConv(
                self.in_channels,
                self.out_channels,
                self.order,
                compute_dtype=self.compute_dtype,
                pallas=True,
                sp_axis=self.sp_axis,
                sp_mid=self.sp_mid,
                name="double_conv",
            )((encoder_features, up))
        target = encoder_features.shape[1:4]
        x = resize_trilinear(x, target)
        # pass the (skip, upsampled) pair: the first conv applies split
        # kernels by linearity, so the concat tensor never hits HBM
        return DoubleConv(
            self.in_channels,
            self.out_channels,
            self.order,
            compute_dtype=self.compute_dtype,
            name="double_conv",
        )((encoder_features, x.astype(encoder_features.dtype)))


class Lane1x1(nn.Module):
    """A 1x1x1 conv as an explicit lane matmul on (rows..., C) tensors.

    Param names/shapes identical to ``nn.Conv`` ((1,1,1,Cin,Cout) kernel +
    bias) so the ``.mdsm`` interop mapping is untouched; used by the
    padded-row head where nn.Conv's pseudo-5D form made XLA pick (1,128)
    tilings costing ~44 ms/step in the surrounding CE/grad fusions."""

    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, 1, cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        precision = (
            jax.lax.Precision.HIGHEST
            if self.compute_dtype == jnp.float32
            else None
        )
        out = jax.lax.dot_general(
            x.astype(self.compute_dtype),
            kernel.reshape(cin, self.features).astype(self.compute_dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            precision=precision,
        )
        return out + bias.astype(out.dtype)


class FinalConvHead(nn.Module):
    """1x1x1 classification head; ``num_conv > 1`` chains convs whose channel
    counts interpolate linearly from ``init_channels`` down to
    ``out_channels`` (ref pattern_class.py:357-365)."""

    init_channels: int
    out_channels: int
    num_conv: int = 1
    compute_dtype: jnp.dtype = jnp.bfloat16
    # emit (Xp, plane, C) padded row-major logits instead of unpadding to
    # (1, X, Y, Z, C): keeps the whole loss/metric graph in the pipeline's
    # layout (the unpadded 5-D form makes XLA pick tiled layouts that cost
    # ~85 ms/step in argmax/CE fusions at 96^3 x 63)
    padded: bool = False

    @staticmethod
    def channel_schedule(init_channels: int, out_channels: int, num_conv: int):
        fac = (init_channels - out_channels) / num_conv
        chans = [init_channels - round(n * fac) for n in range(num_conv + 1)]
        chans[-1] = init_channels - round(num_conv * fac)
        return chans

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        padded_out = False
        if isinstance(x, PallasVol):
            if self.padded:
                # stay in the row layout: apply the pending GN affine on the
                # shard buffer; the chain below runs as (Xp, plane, C) lane
                # matmuls so every downstream loss/metric op stays row-major
                k, xp, ps, cs = x.buf.shape
                xb = x.buf.astype(jnp.float32)
                if x.aff is not None:
                    xb = xb * x.aff[:, 0, :][:, None, None, :] + x.aff[
                        :, 1, :
                    ][:, None, None, :]
                x = (
                    xb.transpose(1, 2, 0, 3)
                    .reshape(xp, ps, k * cs)
                    .astype(self.compute_dtype)
                )
                padded_out = True
            else:
                # leave the pipeline: materialize the last block's GN affine
                # on the interior view; the 1x1x1 chain is a lane matmul
                x = x.interior()
        precision = (
            jax.lax.Precision.HIGHEST
            if self.compute_dtype == jnp.float32
            else None
        )

        def conv1x1(features, name):
            if padded_out:
                return Lane1x1(
                    features, compute_dtype=self.compute_dtype, name=name
                )
            return nn.Conv(
                features,
                (1, 1, 1),
                use_bias=True,
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                precision=precision,
                name=name,
            )

        if self.num_conv <= 1:
            x = conv1x1(self.out_channels, "conv")(x)
        else:
            chans = self.channel_schedule(
                self.init_channels, self.out_channels, self.num_conv
            )
            for n in range(self.num_conv):
                x = conv1x1(chans[n + 1], str(n))(x)
        return x


class UNet3D(nn.Module):
    """Çiçek-style 3D U-Net (see module docstring for the full contract).

    Input: (N, X, Y, Z, in_channels) float; output (N, X, Y, Z, out_channels)
    float32 logits (train) or probabilities (eval).
    """

    in_channels: int = 1
    out_channels: int = 2
    final_sigmoid: bool = False
    interpolate: bool = True
    conv_layer_order: str = "crg"
    init_channel_number: int = 64
    dropout: float = 0.0
    num_conv: int = 1
    compute_dtype: jnp.dtype = jnp.bfloat16
    # rematerialize each encoder/decoder block in the backward pass:
    # trades ~1 extra forward of FLOPs for not storing block activations
    # in HBM - enables full-resolution hemispheres on one chip
    # (jax.checkpoint; see SURVEY.md §5 long-context analogue)
    remat: bool = False
    # run the conv blocks through the fused Pallas pipeline
    # (ops/conv_pallas.py).  None/False = XLA path; True = fused path when
    # eligible (batch 1, dropout 0, 'crg', interpolate) with silent
    # fallback otherwise — eval/labeling on the same model definition must
    # keep working for any input.
    pallas_blocks: Optional[bool] = None
    # spatial parallelism (SURVEY.md §2.2b, parallel/sp_pallas.py): name of
    # the mesh axis over which the input's X axis is sharded.  The forward
    # then runs the Pallas pipeline on local slabs: level 0 (encoder 0,
    # encoder 1's pool, decoder 2's pair convs, head) sharded with halo
    # exchange; the POOLED level 1 (encoder 1's convs, decoder 1) sharded
    # in the slab+E layout when ``sp_shard_middle``; only levels 2-3
    # replicated, on gathered POOLED-size volumes.  Must only be set on
    # the model used INSIDE shard_map (train/step.py make_train_step_sp) —
    # it requires the axis to be bound and the Pallas pipeline eligible.
    sp_axis: Optional[str] = None
    # shard the pooled middle level (encoder 1 + decoder 1) over sp_axis
    # too (slab+E layout, parallel/sp_pallas.py sp_mid_geom): lifts sp's
    # compute coverage from ~53% of FLOPs (level 0) to ~80% (levels 0-1),
    # i.e. the Amdahl cap from ~2x to ~5x, while keeping every collective
    # pooled-size.  Equivalence with the unsharded middle is pinned by
    # tests/test_parallel.py (sp_pallas tests run both).  False =
    # round-4 behavior (replicate from the pooled level up).
    sp_shard_middle: bool = True
    # recurse the slab+E layout one more level (encoder 2 + decoder 0
    # over the twice-pooled extent, parallel/sp_pallas.py
    # sp_pool_local_mid): lifts compute coverage to ~97% of step FLOPs
    # (only level 3 replicates).  Gated per input shape in __call__ —
    # buckets whose local slab cannot split twice (P1 odd or P2 < 4
    # planes) keep the mid-only layout for that executable, with
    # identical numerics.  Requires sp_shard_middle.
    sp_shard_deep: bool = True

    def _shard_widths_ok(self) -> bool:
        """Every channel count the pipeline shards must satisfy
        ``shard_width``'s contract (c < 128 or c % 128 == 0).

        The channel ladder is i/2, i, 2i, 4i, 8i (encoder mids and outs;
        decoder widths are a subset), so e.g. ``num_filter=48`` produces a
        192-wide level that the kernels cannot shard — fall back to the
        XLA path instead of tripping the assert at trace time
        (ADVICE r2, medium)."""
        i = self.init_channel_number
        widths = {max(i // 2, 1), i, 2 * i, 4 * i, 8 * i}
        return all(c < cp.MAX_SHARD or c % cp.MAX_SHARD == 0 for c in widths)

    def _pallas_eligible(self, x: jnp.ndarray) -> bool:
        # on real TPU hardware the kernels' f32 matmuls run at Mosaic's
        # default (reduced) MXU precision, which would silently break the
        # Precision.HIGHEST torch-parity contract of the f32 XLA path —
        # restrict the hardware path to bf16 compute (interpret mode, used
        # by the CPU test mesh, is exact in any dtype)
        dtype_ok = (
            self.compute_dtype != jnp.float32 or _pallas_interpret()
        )
        # interpret mode (CPU backend) emulates the kernels op by op —
        # fine for test-sized volumes, pathological for real ones.
        # Compile-only analyses (test_sp_memory_scales) monkeypatch the
        # limit up: lowering big shapes is cheap, only execution isn't.
        size_ok = (
            not _pallas_interpret()
            or int(np.prod(x.shape[1:4])) <= _INTERPRET_SIZE_LIMIT
        )
        return bool(
            self.pallas_blocks
            and not self.is_initializing()
            and x.ndim == 5
            and x.shape[0] == 1
            and self.dropout == 0
            and self.conv_layer_order == "crg"
            and self.interpolate
            and dtype_ok
            and size_ok
            and self._shard_widths_ok()
            and min(x.shape[1:4]) >= 4
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = True,
        apply_final_activation: Optional[bool] = None,
        padded_output: bool = False,
    ) -> jnp.ndarray:
        i = self.init_channel_number
        enc_chans = [
            (self.in_channels, i),
            (i, 2 * i),
            (2 * i, 4 * i),
            (4 * i, 8 * i),
        ]
        x = x.astype(self.compute_dtype)
        pallas = self._pallas_eligible(x)
        sp = self.sp_axis
        if sp is not None and not self.is_initializing() and not pallas:
            raise ValueError(
                "sp_axis (spatial parallelism) requires the fused Pallas "
                "pipeline: batch 1 per shard, dropout 0, 'crg', "
                f"interpolate, bf16; got input {x.shape} on model "
                f"{self.init_channel_number}ch — the caller "
                "(train/step.py make_train_step_sp) must not build an SP "
                "step for ineligible configs"
            )
        enc_cls = nn.remat(Encoder) if self.remat else Encoder
        dec_cls = nn.remat(Decoder) if self.remat else Decoder
        # sp partition plan (parallel/sp_pallas.py): level 0 sharded on
        # local slabs; with sp_shard_middle the POOLED level 1 is sharded
        # too (slab+E layout: encoder 1's convs and decoder 1's pair
        # convs run on local pooled slabs, skip stays local); with
        # sp_shard_deep the layout recurses once more to level 2
        # (encoder 2 + decoder 0, slab+E over the twice-pooled extent) so
        # only level 3 replicates.  Otherwise everything past encoder 1's
        # pool replicates (round-4 behavior).  Every boundary crossing is
        # a pooled-size-or-smaller all_gather.
        sp_mid = sp is not None and self.sp_shard_middle
        # deep gate is PER SHAPE (each bucket compiles its own
        # executable): the local slab must split twice more — P1 = S/2
        # even and P2 = S/4 >= 4 planes — else that bucket keeps the
        # mid-only layout (identical numerics, no crash)
        sp_deep = (
            sp_mid
            and self.sp_shard_deep
            and int(x.shape[1]) % 4 == 0
            and int(x.shape[1]) // 4 >= 4
        )
        skips = []
        for n, (cin, cout) in enumerate(enc_chans):
            x = enc_cls(
                cin,
                cout,
                pool=(n != 0),
                order=self.conv_layer_order,
                compute_dtype=self.compute_dtype,
                pallas=pallas,
                sp_axis=sp if (
                    n == 0 or (n == 1 and sp_mid) or (n == 2 and sp_deep)
                ) else None,
                sp_pool_axis=sp if (
                    n == 1 or (n == 2 and sp_deep)
                ) else None,
                sp_mid=(sp_mid and n == 1) or (sp_deep and n == 2),
                sp_pool_from_mid=sp_deep and n == 2,
                sp_gather_axis=sp if (
                    (n == 2 and sp_mid and not sp_deep)
                    or (n == 3 and sp_deep)
                ) else None,
                name=f"encoders_{n}",
            )(x)
            if self.dropout > 0:
                x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
            skips.insert(0, x)
        skips = skips[1:]  # deepest output is the decoder input, not a skip

        dec_chans = [
            (4 * i + 8 * i, 4 * i),
            (2 * i + 4 * i, 2 * i),
            (i + 2 * i, i),
        ]
        for n, ((cin, cout), skip) in enumerate(zip(dec_chans, skips)):
            x = dec_cls(
                cin,
                cout,
                interpolate=self.interpolate,
                order=self.conv_layer_order,
                compute_dtype=self.compute_dtype,
                pallas=pallas,
                sp_axis=sp if (
                    n == 2 or (n == 1 and sp_mid) or (n == 0 and sp_deep)
                ) else None,
                sp_mid=(sp_mid and n == 1) or (sp_deep and n == 0),
                sp_gather=(sp_mid and n == 2) or (sp_deep and n == 1),
                name=f"decoders_{n}",
            )(skip, x)

        x = FinalConvHead(
            init_channels=i,
            out_channels=self.out_channels,
            num_conv=self.num_conv,
            compute_dtype=self.compute_dtype,
            padded=pallas and padded_output,
            name="final_conv",
        )(x)
        x = x.astype(jnp.float32)

        if apply_final_activation is None:
            apply_final_activation = not train
        if apply_final_activation:
            x = (
                jax.nn.sigmoid(x)
                if self.final_sigmoid
                else jax.nn.softmax(x, axis=-1)
            )
        return x


def make_unet(
    in_channels: int,
    out_channels: int,
    final_sigmoid: bool = False,
    interpolate: bool = True,
    conv_layer_order: str = "crg",
    init_channel_number: int = 64,
    dropout: float = 0.0,
    num_conv: int = 1,
    compute_dtype=jnp.bfloat16,
) -> UNet3D:
    """Ctor with the torch UNet3D's exact signature (ref training.py:65-67)."""
    return UNet3D(
        in_channels=in_channels,
        out_channels=out_channels,
        final_sigmoid=final_sigmoid,
        interpolate=interpolate,
        conv_layer_order=conv_layer_order,
        init_channel_number=init_channel_number,
        dropout=dropout,
        num_conv=num_conv,
        compute_dtype=compute_dtype,
    )


def make_apply_fn(model: UNet3D):
    """Canonical ``apply_fn(params, inputs, train, apply_final_activation,
    rngs)`` closure over a model definition.

    The full signature matters: train/eval step builders
    (:mod:`unetsulc_tpu.train.step`) pass ``train=False,
    apply_final_activation=False`` to get eval-mode (dropout-off) raw
    logits — a closure that drops those kwargs silently reintroduces the
    train-mode-at-eval bug."""

    def apply_fn(
        params, inputs, train=True, apply_final_activation=None, rngs=None,
        padded_output=False,
    ):
        return model.apply(
            {"params": params},
            inputs,
            train=train,
            apply_final_activation=apply_final_activation,
            padded_output=padded_output,
            rngs=rngs,
        )

    return apply_fn


def init_params(model: UNet3D, rng: jax.Array, example_shape: Sequence[int]):
    """Initialize parameters for an input of ``example_shape`` (N,X,Y,Z,C)."""
    dummy = jnp.zeros(tuple(example_shape), jnp.float32)
    return model.init(rng, dummy, train=True)["params"]


def min_valid_extent() -> int:
    """Smallest per-axis input extent that survives 3 pooling stages (>=2
    voxels at the deepest level): 2 -> pools to 2,2,2 — any extent >= 2
    works thanks to the padded maxpool, but tiny extents waste the MXU;
    tests use >= 16."""
    return 2


def output_matches_input_shape(in_shape: Tuple[int, ...]) -> bool:
    """The decoder resizes to each skip's size, so output spatial shape ==
    input spatial shape by construction."""
    return True
