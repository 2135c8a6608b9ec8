"""Flax UNet3D: shapes, torch numerics parity, .mdsm import/export."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unetsulc_tpu.io.mdsm import read_state_dict, write_state_dict
from unetsulc_tpu.models.torch_interop import (
    params_from_state_dict,
    state_dict_from_params,
    swap_final_conv,
)
from unetsulc_tpu.models.unet3d import UNet3D, max_pool_3d
from unetsulc_tpu.ops.resize import resize_trilinear


def small_unet(out_channels=5, num_conv=1, final_sigmoid=False):
    return UNet3D(
        in_channels=1,
        out_channels=out_channels,
        final_sigmoid=final_sigmoid,
        init_channel_number=16,
        num_conv=num_conv,
        compute_dtype=jnp.float32,
    )


def test_forward_shapes():
    model = small_unet()
    x = jnp.zeros((1, 24, 20, 28, 1))
    params = model.init(jax.random.key(0), x, train=True)["params"]
    out = model.apply({"params": params}, x, train=True)
    assert out.shape == (1, 24, 20, 28, 5)
    assert out.dtype == jnp.float32
    # eval mode applies softmax
    probs = model.apply({"params": params}, x, train=False)
    np.testing.assert_allclose(
        np.asarray(probs.sum(-1)), 1.0, rtol=1e-5
    )


def test_max_pool_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).normal(size=(1, 11, 8, 13, 3)).astype(np.float32)
    ours = np.asarray(max_pool_3d(jnp.asarray(x)))
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    theirs = torch.nn.functional.max_pool3d(xt, 2, padding=1)
    theirs = theirs.permute(0, 2, 3, 4, 1).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=0)


def test_resize_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(1).normal(size=(2, 5, 9, 6, 4)).astype(np.float32)
    target = (9, 17, 11)
    ours = np.asarray(resize_trilinear(jnp.asarray(x), target))
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    theirs = torch.nn.functional.interpolate(
        xt, size=target, mode="trilinear", align_corners=False
    )
    theirs = theirs.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-5)


def _torch_forward(oracle, x_ndhwc, train):
    import torch

    oracle.train(train)
    with torch.no_grad():
        xt = torch.from_numpy(x_ndhwc).permute(0, 4, 1, 2, 3)
        out = oracle(xt)
    return out.permute(0, 2, 3, 4, 1).numpy()


@pytest.mark.parametrize("num_conv", [1, 3])
def test_forward_parity_with_torch(num_conv):
    """End-to-end logits parity: torch weights -> flax via state_dict map."""
    torch = pytest.importorskip("torch")
    from torch_oracle import UNet3DOracle

    torch.manual_seed(0)
    oracle = UNet3DOracle(1, 5, init_channel_number=16, num_conv=num_conv)
    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = params_from_state_dict(state)

    model = small_unet(num_conv=num_conv)
    x = np.random.default_rng(2).normal(size=(1, 19, 22, 17, 1)).astype(np.float32)
    x[x < 0.5] = 0.0  # sparse binary-ish input like real volumes

    ours_train = np.asarray(
        model.apply({"params": params}, jnp.asarray(x), train=True)
    )
    theirs_train = _torch_forward(oracle, x, train=True)
    np.testing.assert_allclose(ours_train, theirs_train, rtol=2e-4, atol=2e-4)

    ours_eval = np.asarray(
        model.apply({"params": params}, jnp.asarray(x), train=False)
    )
    theirs_eval = _torch_forward(oracle, x, train=False)
    np.testing.assert_allclose(ours_eval, theirs_eval, rtol=2e-4, atol=2e-5)


def test_state_dict_roundtrip():
    model = small_unet(num_conv=1)
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = model.init(jax.random.key(1), x, train=True)["params"]
    state = state_dict_from_params(jax.tree.map(np.asarray, params))
    # torch-style keys present
    assert "encoders.0.double_conv.conv1.weight" in state
    assert "decoders.2.double_conv.norm2.bias" in state
    assert "final_conv.weight" in state
    back = params_from_state_dict(state)
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_mdsm_end_to_end(tmp_path):
    """flax params -> .mdsm -> flax params preserves the forward exactly."""
    model = small_unet()
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    )
    params = model.init(jax.random.key(2), x, train=True)["params"]
    p = str(tmp_path / "model.mdsm")
    write_state_dict(state_dict_from_params(jax.tree.map(np.asarray, params)), p)
    back = params_from_state_dict(read_state_dict(p))
    out_a = model.apply({"params": params}, x, train=True)
    out_b = model.apply({"params": back}, x, train=True)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)


def test_swap_final_conv():
    """Transfer-learning head swap: trunk kept, head re-initialized."""
    model = small_unet(out_channels=5)
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = model.init(jax.random.key(3), x, train=True)["params"]
    new_params = swap_final_conv(params, rng=0, init_channels=16, out_channels=9)
    # trunk untouched
    np.testing.assert_array_equal(
        np.asarray(params["encoders_0"]["double_conv"]["conv1"]["kernel"]),
        np.asarray(new_params["encoders_0"]["double_conv"]["conv1"]["kernel"]),
    )
    model9 = small_unet(out_channels=9)
    out = model9.apply({"params": new_params}, x, train=True)
    assert out.shape == (1, 16, 16, 16, 9)


def test_remat_same_numerics():
    """remat=True changes memory, not values: same forward and grads."""
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(1, 12, 12, 12, 1)).astype(np.float32)
    )
    labels = jnp.asarray(
        np.random.default_rng(6).integers(-1, 5, size=(1, 12, 12, 12)), dtype=jnp.int32
    )
    from unetsulc_tpu.ops.losses import cross_entropy_ignore

    outs = []
    for remat in (False, True):
        model = UNet3D(
            in_channels=1,
            out_channels=5,
            init_channel_number=8,
            compute_dtype=jnp.float32,
            remat=remat,
        )
        params = model.init(jax.random.key(7), x, train=True)["params"]

        def loss_fn(p):
            return cross_entropy_ignore(
                model.apply({"params": p}, x, train=True), labels
            )

        outs.append((loss_fn(params), jax.grad(loss_fn)(params)))
    np.testing.assert_allclose(float(outs[0][0]), float(outs[1][0]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(outs[0][1]), jax.tree.leaves(outs[1][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_forward_parity_flagship_width():
    """Parity at init_channel_number=64 (the BrainVISA width): exercises
    GroupNorm(32, C) for C in {32,64,...,512} - the exact production path."""
    torch = pytest.importorskip("torch")
    from torch_oracle import UNet3DOracle

    torch.manual_seed(1)
    oracle = UNet3DOracle(1, 7, init_channel_number=64)
    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = params_from_state_dict(state)

    model = UNet3D(
        in_channels=1,
        out_channels=7,
        init_channel_number=64,
        compute_dtype=jnp.float32,
    )
    x = np.random.default_rng(4).normal(size=(1, 14, 12, 10, 1)).astype(np.float32)
    x[x < 0.8] = 0.0
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x), train=True))
    theirs = _torch_forward(oracle, x, train=True)
    np.testing.assert_allclose(ours, theirs, rtol=5e-4, atol=5e-4)


def test_mdsm_loads_into_torch_module_strict():
    """Our exported .mdsm strict-loads into a real torch module and
    reproduces our forward - the full reverse interop direction."""
    import tempfile

    torch = pytest.importorskip("torch")
    from torch_oracle import UNet3DOracle

    model = small_unet(out_channels=4)
    x = np.random.default_rng(8).normal(size=(1, 12, 14, 10, 1)).astype(np.float32)
    x[x < 0.6] = 0.0
    params = model.init(jax.random.key(9), jnp.asarray(x), train=True)["params"]
    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/m.mdsm"
        write_state_dict(
            state_dict_from_params(jax.tree.map(np.asarray, params)), p
        )
        sd = torch.load(p, map_location="cpu", weights_only=True)
    oracle = UNet3DOracle(1, 4, init_channel_number=16)
    oracle.load_state_dict(sd, strict=True)  # keys+shapes must match exactly

    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x), train=True))
    theirs = _torch_forward(oracle, x, train=True)
    np.testing.assert_allclose(ours, theirs, rtol=5e-4, atol=5e-4)


def test_pallas_ineligible_widths_fall_back():
    """num_filter=48 yields a 192-wide level that shard_width cannot split
    into 128-lane shards; the model must take the XLA path silently, not
    trip the kernel's assert at trace time (ADVICE r2, medium)."""
    model = UNet3D(
        in_channels=1,
        out_channels=5,
        init_channel_number=48,
        compute_dtype=jnp.bfloat16,
        pallas_blocks=True,
    )
    assert not model._shard_widths_ok()
    x = jnp.zeros((1, 10, 10, 10, 1))
    params = model.init(jax.random.key(0), x, train=True)["params"]
    out = model.apply({"params": params}, x, train=True)
    assert out.shape == (1, 10, 10, 10, 5)
    # the flagship width remains eligible
    assert UNet3D(init_channel_number=64)._shard_widths_ok()


def test_forward_parity_transposed_conv_decoder():
    """interpolate=False: ConvTranspose3d upsampling parity with the torch
    oracle through the .mdsm name mapping (decoders.N.upsample.*), on odd
    and even extents (both crop cases of CONTRACTS.md §5)."""
    torch = pytest.importorskip("torch")
    from torch_oracle import UNet3DOracle

    torch.manual_seed(2)
    oracle = UNet3DOracle(1, 5, init_channel_number=16, interpolate=False)
    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    assert "decoders.0.upsample.weight" in state
    params = params_from_state_dict(state)

    model = UNet3D(
        in_channels=1,
        out_channels=5,
        init_channel_number=16,
        interpolate=False,
        compute_dtype=jnp.float32,
    )
    x = np.random.default_rng(8).normal(size=(1, 13, 14, 11, 1)).astype(
        np.float32
    )
    x[x < 0.5] = 0.0
    ours = np.asarray(
        model.apply({"params": params}, jnp.asarray(x), train=True)
    )
    theirs = _torch_forward(oracle, x, train=True)
    assert ours.shape == theirs.shape == (1, 13, 14, 11, 5)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_transposed_conv_decoder_roundtrip_and_grads(tmp_path):
    """interpolate=False params survive the .mdsm roundtrip (upsample keys
    in torch registration order) and the model trains (finite grads)."""
    model = UNet3D(
        in_channels=1,
        out_channels=5,
        init_channel_number=8,
        interpolate=False,
        compute_dtype=jnp.float32,
    )
    x = jnp.asarray(
        np.random.default_rng(9).normal(size=(1, 12, 12, 12, 1)).astype(
            np.float32
        )
    )
    params = model.init(jax.random.key(4), x, train=True)["params"]
    assert "upsample" in params["decoders_0"]
    state = state_dict_from_params(jax.tree.map(np.asarray, params))
    keys = list(state)
    # torch registers upsample before double_conv within each decoder
    assert keys.index("decoders.0.upsample.weight") < keys.index(
        "decoders.0.double_conv.conv1.weight"
    )
    p = str(tmp_path / "m.mdsm")
    write_state_dict(state, p)
    back = params_from_state_dict(read_state_dict(p))
    out_a = model.apply({"params": params}, x, train=True)
    out_b = model.apply({"params": back}, x, train=True)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)

    from unetsulc_tpu.ops.losses import cross_entropy_ignore

    labels = jnp.asarray(
        np.random.default_rng(10).integers(-1, 5, size=(1, 12, 12, 12)),
        dtype=jnp.int32,
    )

    def loss_fn(p):
        return cross_entropy_ignore(
            model.apply({"params": p}, x, train=True), labels
        )

    grads = jax.grad(loss_fn)(params)
    up = grads["decoders_0"]["upsample"]["kernel"]
    assert np.isfinite(np.asarray(up)).all() and float(
        jnp.abs(up).sum()
    ) > 0.0
