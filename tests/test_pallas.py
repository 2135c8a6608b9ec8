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
    import unetsulc_tpu.ops.groupnorm_pallas_chunked as gnc

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
