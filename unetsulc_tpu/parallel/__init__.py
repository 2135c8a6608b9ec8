"""Parallelism layer: mesh construction + shardings (new; ref has none).

The reference is strictly single-process/single-device (SURVEY.md §2.2).
This package supplies the TPU-native mapping: a ``jax.sharding.Mesh`` with a
``data`` axis (batch data-parallelism; XLA inserts the grad all-reduce over
ICI) and an optional ``space`` axis (spatial sharding of the volume X axis;
XLA SPMD inserts halo exchanges for the 3x3x3 convs automatically).
"""

from unetsulc_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
)
