"""Pallas kernels: fused GroupNorm forward + custom VJP vs reference impl.

On the CPU test backend pallas runs in interpret mode (functionally
identical); the same code compiles natively on TPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import unetsulc_tpu.ops.groupnorm_pallas as gnp
from unetsulc_tpu.ops.groupnorm import group_norm


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    """Force interpret mode for pallas_call on the CPU backend."""
    orig = pl.pallas_call
    monkeypatch.setattr(
        gnp.pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    yield


def _ref_gn(x, num_groups, scale, bias, eps=1e-5):
    return group_norm(x, num_groups, scale, bias, eps, use_pallas=False)


@pytest.mark.parametrize("shape,groups", [((2, 5, 4, 3, 16), 8), ((1, 7, 7, 7, 32), 32)])
def test_pallas_gn_forward(shape, groups):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32))
    ours = gnp.group_norm_pallas(x, groups, scale, bias)
    ref = _ref_gn(x, groups, scale, bias)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_pallas_gn_grad():
    rng = np.random.default_rng(1)
    shape, groups = (2, 4, 4, 4, 16), 8
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32))

    def loss_pallas(x, scale, bias):
        y = gnp.group_norm_pallas(x, groups, scale, bias)
        return jnp.sum(y * y)

    def loss_ref(x, scale, bias):
        y = _ref_gn(x, groups, scale, bias)
        return jnp.sum(y * y)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a).ravel(),
            np.asarray(b).ravel(),
            rtol=2e-3,
            atol=2e-4,
        )


def test_use_pallas_policy():
    # small deep-level slab fits; full-res level must not
    assert not gnp.use_pallas_for((1, 96, 96, 96, 64), jnp.bfloat16) or (
        jax.default_backend() != "tpu"
    )
    # on CPU backend the policy always says no (pallas is TPU-targeted)
    assert gnp.use_pallas_for((1, 13, 13, 13, 512), jnp.bfloat16) == (
        jax.default_backend() == "tpu"
    )


def test_chunked_gn_forward_and_grad(monkeypatch):
    # attic: kept negative result (2.8x slower than XLA's fused GN —
    # BASELINE.md); the test keeps the archived kernel honest.
    import unetsulc_tpu.ops.attic.groupnorm_pallas_chunked as gnc

    orig = pl.pallas_call
    monkeypatch.setattr(
        gnc.pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    rng = np.random.default_rng(2)
    shape, groups = (2, 6, 5, 4, 16), 8  # 6 chunks along X
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32))

    ours = gnc.group_norm_pallas_chunked(x, groups, scale, bias)
    ref = _ref_gn(x, groups, scale, bias)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-5
    )

    def loss_c(x, s, b):
        y = gnc.group_norm_pallas_chunked(x, groups, s, b)
        return jnp.sum(y * jnp.cos(y))

    def loss_r(x, s, b):
        y = _ref_gn(x, groups, s, b)
        return jnp.sum(y * jnp.cos(y))

    g1 = jax.grad(loss_c, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a).ravel(), np.asarray(b).ravel(),
            rtol=2e-3, atol=2e-4,
        )


# ---------------------------------------------------------------------------
# fused conv+ReLU+GN-stats block kernels (ops/conv_pallas.py)
# ---------------------------------------------------------------------------

import unetsulc_tpu.ops.conv_pallas as cp
from unetsulc_tpu.models.unet3d import UNet3D


def _ref_crg_unit(x5, a, b, k5, bias):
    """affine -> conv3x3x3 -> +bias -> relu, plus per-channel stat sums."""
    xn = x5 * a + b
    y = jax.lax.conv_general_dilated(
        xn, k5, (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + bias
    y = jnp.maximum(y, 0.0)
    return y, jnp.stack([jnp.sum(y, axis=(0, 1, 2, 3)),
                         jnp.sum(y * y, axis=(0, 1, 2, 3))])


def _branch_affine(a, b, ci):
    cs = cp.shard_width(ci)
    return jnp.stack([a.reshape(ci // cs, cs), b.reshape(ci // cs, cs)], axis=1)


def _dummies():
    return (jnp.zeros((1, 2, 16, 8), jnp.float32),
            jnp.zeros((1, 2, 8), jnp.float32),
            jnp.zeros((1, 1, 27, 8, 8), jnp.float32))


@pytest.mark.parametrize("cins,cout", [([16], 16), ([8, 16], 8), ([32], 16)])
def test_fused_conv_block_fwd_and_grads(cins, cout):
    """fused_conv_block == affine+conv+relu+stats, incl. ALL gradients.

    Pins the v4 kernel design end to end: dz-tap lane merge, rolling
    slabs, per-branch widths, partial-accumulator pair composition,
    custom VJP (dx via mirrored-transposed shards, dW via the
    tap-column contraction kernel)."""
    r = np.random.default_rng(0)
    X, Y, Z = 6, 5, 7
    g = cp.make_geom(X, Y, Z)
    xs5 = [jnp.asarray(r.standard_normal((1, X, Y, Z, ci)).astype(np.float32))
           for ci in cins]
    cin_t = sum(cins)
    a = jnp.asarray((r.standard_normal(cin_t) * 0.5 + 1).astype(np.float32))
    b = jnp.asarray((r.standard_normal(cin_t) * 0.1).astype(np.float32))
    k5 = jnp.asarray((r.standard_normal((3, 3, 3, cin_t, cout)) * 0.2
                      ).astype(np.float32))
    bias = jnp.asarray((r.standard_normal(cout) * 0.1).astype(np.float32))
    gy = jnp.asarray(r.standard_normal((1, X, Y, Z, cout)).astype(np.float32))
    gs = jnp.asarray(r.standard_normal((2, cout)).astype(np.float32) * 0.01)

    def loss_ref(k5):
        y, s = _ref_crg_unit(jnp.concatenate(xs5, -1), a, b, k5, bias)
        return jnp.sum(y * gy) + jnp.sum(s * gs), (y, s)

    (_, (yref, sref)), dwref = jax.value_and_grad(loss_ref, has_aux=True)(k5)

    c1 = cins[0]
    xps = [cp.pad_to_geom(v, g) for v in xs5]
    abs_ = [_branch_affine(a[:c1], b[:c1], c1)]
    if len(cins) == 2:
        abs_.append(_branch_affine(a[c1:], b[c1:], cins[1]))

    def loss_pal(k5):
        ws = list(cp.shard_weights(k5, cins, cout))
        xs, ab = list(xps), list(abs_)
        if len(cins) == 1:
            d1, d2, d3 = _dummies()
            xs, ab, ws = xs + [d1], ab + [d2], ws + [d3]
        y, s = cp.fused_conv_block(xs[0], xs[1], ab[0], ab[1], ws[0], ws[1],
                                   bias, None, None, None, len(cins), g,
                                   True)
        y5 = cp.unpad_from_geom(y, g)
        sflat = s.swapaxes(0, 1).reshape(2, -1)
        return jnp.sum(y5 * gy) + jnp.sum(sflat * gs), (y5, sflat)

    (_, (y5, sflat)), dwpal = jax.value_and_grad(loss_pal, has_aux=True)(k5)

    np.testing.assert_allclose(np.asarray(y5), np.asarray(yref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sflat), np.asarray(sref),
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(dwpal), np.asarray(dwref),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("num_conv", [1, 2])
def test_unet_pallas_path_matches_xla(num_conv):
    """UNet3D(pallas_blocks=True) == the XLA path: forward, eval-mode
    probabilities, and every parameter gradient (fp32, interpret)."""
    r = np.random.default_rng(0)
    x = jnp.asarray((r.random((1, 9, 8, 10, 1)) < 0.1).astype(np.float32))
    mk = dict(in_channels=1, out_channels=5, init_channel_number=8,
              num_conv=num_conv, compute_dtype=jnp.float32)
    mx = UNet3D(**mk)
    mp = UNet3D(**mk, pallas_blocks=True)
    params = mx.init(jax.random.key(0), x, train=True)["params"]
    # perturb all params off zero: with zero-init conv biases, empty volume
    # regions give pre-ReLU activations of EXACTLY 0, where jnp.maximum's
    # JVP (XLA path) splits the subgradient 0.5/0.5 while the fused kernels
    # use 1[y > 0] — torch's ReLU convention.  The tie is measure-zero in
    # real training; the comparison needs params away from it.
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.key(7), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [v + 0.03 * jax.random.normal(k, v.shape, v.dtype)
         for v, k in zip(leaves, keys)],
    )

    yx = mx.apply({"params": params}, x, train=True)
    yp = mp.apply({"params": params}, x, train=True)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yx),
                               rtol=1e-4, atol=2e-4)

    ex = mx.apply({"params": params}, x, train=False)
    ep = mp.apply({"params": params}, x, train=False)
    np.testing.assert_allclose(np.asarray(ep), np.asarray(ex),
                               rtol=1e-4, atol=1e-5)

    gy = jnp.asarray(r.standard_normal(yx.shape).astype(np.float32))
    gx = jax.grad(lambda p: jnp.sum(mx.apply({"params": p}, x, train=True) * gy))(params)
    gp = jax.grad(lambda p: jnp.sum(mp.apply({"params": p}, x, train=True) * gy))(params)
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_p = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gp)}
    for k, v in flat_x:
        got = flat_p[jax.tree_util.keystr(k)]
        scale = max(1.0, float(jnp.max(jnp.abs(v))))
        np.testing.assert_allclose(np.asarray(got) / scale,
                                   np.asarray(v) / scale,
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=jax.tree_util.keystr(k))


def test_pallas_train_step_matches_xla():
    """make_train_step on a pallas model (padded row-major logits + padded
    labels) reproduces the XLA model's loss, confusion counts, and updated
    params — pins the whole 2-D loss/metric layout path."""
    from unetsulc_tpu.models.unet3d import make_apply_fn
    from unetsulc_tpu.train.step import TrainState, make_train_step

    r = np.random.default_rng(3)
    x = jnp.asarray((r.random((1, 9, 8, 10, 1)) < 0.15).astype(np.float32))
    labels = jnp.asarray(
        np.where(r.random((1, 9, 8, 10)) < 0.1,
                 r.integers(0, 5, (1, 9, 8, 10)), -1).astype(np.int32))
    mk = dict(in_channels=1, out_channels=5, init_channel_number=8,
              compute_dtype=jnp.float32)
    mx = UNet3D(**mk)
    mp = UNet3D(**mk, pallas_blocks=True)
    params = mx.init(jax.random.key(0), x, train=True)["params"]
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.key(9), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [v + 0.03 * jax.random.normal(k, v.shape, v.dtype)
         for v, k in zip(leaves, keys)],
    )

    outs = {}
    for name, m in (("xla", mx), ("pal", mp)):
        state = TrainState.create(params, lr=0.05)
        step = make_train_step(make_apply_fn(m), num_classes=5, donate=False)
        state, loss, counts = step(state, x, labels)
        outs[name] = (float(loss), np.asarray(counts), state.trainable)

    assert abs(outs["xla"][0] - outs["pal"][0]) < 1e-5
    np.testing.assert_array_equal(outs["xla"][1], outs["pal"][1])
    for k, v in jax.tree_util.tree_leaves_with_path(outs["xla"][2]):
        got = {jax.tree_util.keystr(kk): vv for kk, vv in
               jax.tree_util.tree_leaves_with_path(outs["pal"][2])}[
            jax.tree_util.keystr(k)]
        np.testing.assert_allclose(np.asarray(got), np.asarray(v),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=jax.tree_util.keystr(k))


def test_pallas_remat_grads_bit_exact():
    """nn.remat over the PallasVol pipeline replays the kernels exactly:
    gradients are bit-identical with and without remat (the memory-for-
    FLOPs trade composes with the fused blocks)."""
    r = np.random.default_rng(5)
    x = jnp.asarray((r.random((1, 9, 8, 10, 1)) < 0.1).astype(np.float32))
    mk = dict(in_channels=1, out_channels=5, init_channel_number=8,
              compute_dtype=jnp.float32, pallas_blocks=True)
    m0 = UNet3D(**mk)
    m1 = UNet3D(**mk, remat=True)
    params = m0.init(jax.random.key(0), x, train=True)["params"]
    gy = jnp.asarray(r.standard_normal((1, 9, 8, 10, 5)).astype(np.float32))
    g0 = jax.grad(lambda p: jnp.sum(m0.apply({"params": p}, x, train=True) * gy))(params)
    g1 = jax.grad(lambda p: jnp.sum(m1.apply({"params": p}, x, train=True) * gy))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("shape", [(9, 8, 10, 8), (7, 9, 5, 4)])
def test_pallas_pool_matches_reduce_window_oracle(shape):
    """max_pool_buf (Pallas kernel pair) == max_pool_buf_xla (reduce_window
    + select-and-scatter): forward, tie ROUTING in the backward (dbuf must
    be bitwise equal — both implement torch's first >= match), and
    d(affine)."""
    X, Y, Z, C = shape
    r = np.random.default_rng(0)
    g = cp.make_geom(X, Y, Z)
    x5 = jnp.asarray(r.standard_normal((1, X, Y, Z, C)).astype(np.float32))
    buf = cp.pad_to_geom(x5, g)
    a = jnp.asarray((r.standard_normal(C) * 0.5 + 1).astype(np.float32))
    b = jnp.asarray((r.standard_normal(C) * 0.2).astype(np.float32))
    aff = cp.affine_from_channels(a, b, buf.shape[-1])

    ref = cp.max_pool_buf_xla(buf, aff, g)
    got = cp.max_pool_buf(buf, aff, g, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    gy = jnp.asarray(r.standard_normal(ref.shape).astype(np.float32))
    gr = jax.grad(lambda t: jnp.sum(cp.max_pool_buf_xla(t[0], t[1], g) * gy))(
        (buf, aff))
    gp = jax.grad(lambda t: jnp.sum(cp.max_pool_buf(t[0], t[1], g, True) * gy))(
        (buf, aff))
    np.testing.assert_array_equal(np.asarray(gr[0]), np.asarray(gp[0]))
    np.testing.assert_allclose(np.asarray(gr[1]), np.asarray(gp[1]),
                               rtol=1e-4, atol=1e-4)

    # affine-free entry (post-pool levels)
    np.testing.assert_allclose(
        np.asarray(cp.max_pool_buf(buf, None, g, True)),
        np.asarray(cp.max_pool_buf_xla(buf, None, g)), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("extent", [(12, 17, 19), (15, 6, 11)])
def test_unet_pallas_irregular_extents(extent):
    """Pallas path == XLA path on irregular volumes: odd extents, z past
    the 16-row tile (Zp=32), odd pooled sizes at every level — the shapes
    per-sample cubic buckets produce."""
    r = np.random.default_rng(0)
    x = jnp.asarray((r.random((1, *extent, 1)) < 0.1).astype(np.float32))
    mk = dict(in_channels=1, out_channels=4, init_channel_number=8,
              compute_dtype=jnp.float32)
    mx = UNet3D(**mk)
    mp = UNet3D(**mk, pallas_blocks=True)
    params = mx.init(jax.random.key(0), x, train=True)["params"]
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.key(7), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [v + 0.03 * jax.random.normal(k, v.shape, v.dtype)
         for v, k in zip(leaves, keys)],
    )
    yx = mx.apply({"params": params}, x, train=True)
    yp = mp.apply({"params": params}, x, train=True)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yx),
                               rtol=1e-4, atol=2e-4)
    gy = jnp.asarray(r.standard_normal(yx.shape).astype(np.float32))
    gx = jax.grad(lambda p: jnp.sum(mx.apply({"params": p}, x, train=True) * gy))(params)
    gp = jax.grad(lambda p: jnp.sum(mp.apply({"params": p}, x, train=True) * gy))(params)
    for (k, a), b in zip(jax.tree_util.tree_leaves_with_path(gx),
                         jax.tree_util.tree_leaves(gp)):
        scale = max(1.0, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(np.asarray(b) / scale, np.asarray(a) / scale,
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=jax.tree_util.keystr(k))


def test_pallas_train_step_multiconv_and_sigmoid():
    """Padded-output mode with a num_conv=2 Lane1x1 chain, and
    final_sigmoid eval probabilities, both match the XLA path."""
    from unetsulc_tpu.models.unet3d import make_apply_fn
    from unetsulc_tpu.train.step import TrainState, make_train_step, make_eval_step

    r = np.random.default_rng(4)
    x = jnp.asarray((r.random((1, 9, 8, 10, 1)) < 0.15).astype(np.float32))
    labels = jnp.asarray(
        np.where(r.random((1, 9, 8, 10)) < 0.1,
                 r.integers(0, 5, (1, 9, 8, 10)), -1).astype(np.int32))
    mk = dict(in_channels=1, out_channels=5, init_channel_number=8,
              num_conv=2, final_sigmoid=True, compute_dtype=jnp.float32)
    mx = UNet3D(**mk)
    mp = UNet3D(**mk, pallas_blocks=True)
    params = mx.init(jax.random.key(0), x, train=True)["params"]
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.key(9), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [v + 0.03 * jax.random.normal(k, v.shape, v.dtype)
         for v, k in zip(leaves, keys)])

    outs = {}
    for name, m in (("xla", mx), ("pal", mp)):
        state = TrainState.create(params, lr=0.05)
        step = make_train_step(make_apply_fn(m), num_classes=5, donate=False)
        state, loss, counts = step(state, x, labels)
        ev = make_eval_step(make_apply_fn(m), num_classes=5,
                            final_sigmoid=True)
        eloss, ecounts = ev(params, x, labels)
        outs[name] = (float(loss), np.asarray(counts), float(eloss),
                      np.asarray(ecounts))
    assert abs(outs["xla"][0] - outs["pal"][0]) < 1e-5
    np.testing.assert_array_equal(outs["xla"][1], outs["pal"][1])
    assert abs(outs["xla"][2] - outs["pal"][2]) < 1e-5
    np.testing.assert_array_equal(outs["xla"][3], outs["pal"][3])


def test_nmerge_matches_dyfold(monkeypatch):
    """The N-merged fwd kernel (one [A|C|B] dot of N = 3cso per dx,
    UNETSULC_NMERGE) == the dy-fold pair+middle kernel.

    Round-5 MXU widening A/B: pack_weights_dyfold_merged concatenates
    the dy pair and middle weight columns so each dx issues ONE
    N = 3cso dot; _combine_dy_merged extracts y via row shifts + two
    lane rolls.  Covers the mode matrix the fold path dispatches:
    single/multi in-shard, partial composition, post (dx d-affine)
    mode.  cso = 64 everywhere (the gate needs >= 64: merged width
    >= 1.5 lane tiles on TPU; interpret mode has no tiles but tests
    the shipped predicate)."""
    r = np.random.default_rng(7)
    g = cp.make_geom(6, 7, 5)

    def mk(shape):
        return jnp.asarray(r.standard_normal(shape).astype(np.float32))

    for kin, kout, cs, cso, affine, partial, post in [
        (1, 1, 8, 64, True, False, False),
        (1, 2, 8, 64, True, True, False),
        (2, 2, 16, 64, True, True, False),
        (2, 1, 8, 64, False, True, True),
        (1, 1, 8, 64, False, False, True),
    ]:
        buf = cp.pad_to_geom(mk((1, g.X, g.Y, g.Z, kin * cs)), g, cs=cs)
        ab = (mk((kin, 2, cs)) * 0.3 + jnp.asarray([[1.0], [0.0]])
              if affine else None)
        w = mk((kin, kout, 27, cs, cso)) * 0.1
        bias = mk((kout * cso,)) * 0.1
        part = mk((kout, g.Xp, g.plane, cso)) * 0.1 if partial else None
        pab = pxo = None
        stats = not post
        if post:
            pab = mk((kout, 2, cso)) * 0.5 + jnp.asarray([[1.0], [0.0]])
            pxo = cp.pad_to_geom(
                mk((1, g.X, g.Y, g.Z, kout * cso)), g, cs=cso
            )
        outs = {}
        for flag in ("1", "0"):
            monkeypatch.setenv("UNETSULC_NMERGE", flag)
            outs[flag] = cp.conv_shards(
                buf, ab, w, bias, g=g, relu=not post, stats=stats,
                partial=part, interpret=True, post_ab=pab, post_x=pxo,
            )
        np.testing.assert_allclose(
            np.asarray(outs["1"][0]), np.asarray(outs["0"][0]),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(outs["1"][1]), np.asarray(outs["0"][1]),
            rtol=1e-5, atol=1e-4,
        )


def test_kfold9_matches_rolling_slabs(monkeypatch):
    """The K-folded phase-buffer fwd kernel == the rolling-slab kernel.

    Round-3 MXU widening: dx taps merged into the contraction dim (one
    K = 9cs dot pair per output plane, pack_weights_dxfold9) must be
    numerically identical to the 3-dot rolling-slab form across the mode
    matrix: multi-in-shard accumulation, partial composition, and the
    post (dx d-affine) mode."""
    r = np.random.default_rng(3)
    g = cp.make_geom(6, 7, 5)

    def mk(shape):
        return jnp.asarray(r.standard_normal(shape).astype(np.float32))

    for kin, kout, cs, cso, affine, partial, post in [
        (1, 1, 8, 8, True, False, False),
        (1, 2, 8, 16, True, True, False),
        (2, 2, 16, 8, True, True, False),
        (2, 1, 8, 8, False, True, True),
        # unfolded (cso == 128): dz+dx in K, dy stays a guarded row offset
        (1, 1, 8, 128, True, False, False),
        (2, 1, 16, 128, True, True, False),
        (1, 1, 8, 128, False, False, True),
    ]:
        buf = cp.pad_to_geom(mk((1, g.X, g.Y, g.Z, kin * cs)), g, cs=cs)
        ab = (mk((kin, 2, cs)) * 0.3 + jnp.asarray([[1.0], [0.0]])
              if affine else None)
        w = mk((kin, kout, 27, cs, cso)) * 0.1
        bias = mk((kout * cso,)) * 0.1
        part = mk((kout, g.Xp, g.plane, cso)) * 0.1 if partial else None
        pab = pxo = None
        stats = not post
        if post:
            pab = mk((kout, 2, cso)) * 0.5 + jnp.asarray([[1.0], [0.0]])
            pxo = cp.pad_to_geom(
                mk((1, g.X, g.Y, g.Z, kout * cso)), g, cs=cso
            )
        outs = {}
        for flag in ("1", "0"):
            monkeypatch.setenv("UNETSULC_KFOLD9", flag)
            outs[flag] = cp.conv_shards(
                buf, ab, w, bias, g=g, relu=not post, stats=stats,
                partial=part, interpret=True, post_ab=pab, post_x=pxo,
            )
        np.testing.assert_allclose(
            np.asarray(outs["1"][0]), np.asarray(outs["0"][0]),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(outs["1"][1]), np.asarray(outs["0"][1]),
            rtol=1e-5, atol=1e-4,
        )
