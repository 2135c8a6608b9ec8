"""Ops layer: custom numerics — GroupNorm, resize, losses, ESI, cutting.

Replaces the reference's external kernel/metric surface
(PyTorch/ATen kernels + ``deepsulci`` stats/cutting, SURVEY.md §2.3) with
JAX/Pallas implementations designed for the TPU memory hierarchy.
"""

from unetsulc_tpu.ops.esi import esi_score, esi_from_counts  # noqa: F401
from unetsulc_tpu.ops.cutting import cutting  # noqa: F401
