"""Explicit spatial-parallel 3D convolution with halo exchange.

The volumetric analogue of context/sequence parallelism (SURVEY.md §2.2b):
the volume's X axis is sharded over the mesh's ``space`` axis so a
full-resolution hemisphere that exceeds one chip's HBM trains across
chips.  Under plain pjit, XLA's SPMD partitioner already inserts the halo
collective-permutes for a spatially-sharded ``conv_general_dilated``; this
module is the *explicit* shard_map implementation of the same schedule —
useful (a) to pin the communication pattern in tests, (b) as the baseline
for a future pallas kernel that overlaps the face exchange with the
interior conv (the faces are 1-voxel slabs, tiny vs the interior compute).

Each shard sends its boundary planes to its neighbors over ICI
(``lax.ppermute``), zero-pads at the global volume edges (matching the
conv's padding=1), and convolves its extended slab with VALID padding on X.
"""

from __future__ import annotations

from functools import partial


import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def _local_conv(x, kernel, *, axis_name: str):
    """Per-shard body: halo exchange on X then local conv (NDHWC, 3x3x3)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    # faces to neighbors: my last X-plane goes right, my first goes left
    right_going = x[:, -1:]
    left_going = x[:, :1]
    from_left = lax.ppermute(
        right_going, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    from_right = lax.ppermute(
        left_going, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    # zero at the global edges (conv padding=1 semantics)
    from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
    from_right = jnp.where(
        idx == n - 1, jnp.zeros_like(from_right), from_right
    )
    xp = jnp.concatenate([from_left, x, from_right], axis=1)
    return lax.conv_general_dilated(
        xp,
        kernel,
        window_strides=(1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1)),  # X handled by the halo
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def conv3d_spatial(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "space",
) -> jnp.ndarray:
    """3x3x3 same-padding conv with X sharded over ``axis_name``.

    x: (N, X, Y, Z, Cin) with X divisible by the axis size;
    kernel: (3, 3, 3, Cin, Cout) replicated.
    """
    fn = shard_map(
        partial(_local_conv, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(None, axis_name), P()),
        out_specs=P(None, axis_name),
    )
    return fn(x, kernel)


def spatial_sharding(mesh: Mesh, axis_name: str = "space") -> NamedSharding:
    """Sharding for (N, X, Y, Z, C) arrays: X over the space axis."""
    return NamedSharding(mesh, P(None, axis_name))
