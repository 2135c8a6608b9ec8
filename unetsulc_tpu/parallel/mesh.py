"""Mesh + sharding helpers for data/spatial parallel training.

Design (SURVEY.md §2.2 "TPU-native mapping"):

* ``data`` axis — volumes/batch sharded across chips; under jit, XLA turns
  the per-shard gradients into one ``all-reduce`` over ICI. This is the only
  collective the workload fundamentally needs.
* ``space`` axis — the volume X axis sharded across chips for
  full-resolution hemispheres that exceed one chip's HBM; XLA SPMD
  partitions the 3x3x3 convolutions with automatic halo exchange
  (collective-permutes of 1-voxel faces), and GroupNorm's spatial
  reductions become cross-chip all-reduces.  An explicit shard_map/pallas
  halo implementation lives in :mod:`unetsulc_tpu.parallel.halo` for
  benchmarking against the SPMD partitioner.

Everything here is ordinary ``jax.sharding`` — there is no communication
"backend" to manage (no NCCL/MPI analogue; SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 0,
    space: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, space) mesh. data=0 means "all remaining devices"."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == 0:
        assert n % space == 0, (n, space)
        data = n // space
    assert data * space <= n, (data, space, n)
    arr = np.array(devices[: data * space]).reshape(data, space)
    return Mesh(arr, axis_names=("data", "space"))


def device_groups(
    n_groups: int, devices: Optional[Sequence] = None
) -> list:
    """Partition the visible devices into ``n_groups`` contiguous groups.

    The unit of experiment parallelism (SURVEY.md §2.2c): each concurrent
    CV fold runs on its own group (experiment/driver.py fold_parallel),
    building its data/spatial mesh from the group's devices — contiguous
    slices keep a group's collectives on neighboring ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert 1 <= n_groups <= n, (n_groups, n)
    assert n % n_groups == 0, (
        f"fold_parallel={n_groups} must divide the {n} visible devices"
    )
    per = n // n_groups
    return [tuple(devices[i * per:(i + 1) * per]) for i in range(n_groups)]


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (B, X, Y, Z, ...) batches: B over 'data', X over 'space'."""
    return NamedSharding(mesh, P("data", "space"))


def label_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data", "space"))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params, small states)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, inputs, labels):
    """Place a host batch onto the mesh with batch+spatial sharding."""
    bs = batch_sharding(mesh)
    return jax.device_put(inputs, bs), jax.device_put(labels, bs)
