"""Dense voxelization of sulci point clouds (host side).

Rebuild of the reference's per-item tensor construction
(ref dataset.py:72-88): a binary occupancy volume plus an integer label
volume initialized to background (-1).  Differences, all TPU-motivated:

* channels-last ``(X, Y, Z, 1)`` layout (NDHWC convs map best onto the MXU);
* optional shape *bucketing*: sizes are rounded up to a small set of static
  shapes so XLA compiles a handful of executables instead of one per sample;
* an optional native C++ scatter kernel (``unetsulc_tpu.runtime``) for the
  host hot loop — the reference pays this cost in Python/torch per item
  (SURVEY.md §3 hot loop #2).

Zero-padding semantics: the reference pads with input=0 / label=background
whenever a fixed ``img_size`` is used (ref dataset.py:76-88), and GroupNorm
sees those zeros.  We reproduce exactly that (pad with zeros, keep GN
unmasked; only loss/metrics mask on label == -1) — see SURVEY.md §7 hard
part #2.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

_BACKGROUND = -1

# Default static shape buckets (multiples of 16 keep the deepest encoder
# level >= 2 voxels and play well with XLA tiling). A sample of extent e is
# padded up to the smallest bucket >= e per axis.
DEFAULT_BUCKET_SIZES = (32, 48, 64, 80, 96, 112, 128, 160, 192, 224, 256)


def bucket_size(extent: int, buckets: Sequence[int] = DEFAULT_BUCKET_SIZES) -> int:
    for b in buckets:
        if extent <= b:
            return b
    # beyond the largest bucket: round up to multiple of 32
    return int(np.ceil(extent / 32) * 32)


def bucket_shape(
    extents: Sequence[int], buckets: Sequence[int] = DEFAULT_BUCKET_SIZES
) -> Tuple[int, int, int]:
    return tuple(bucket_size(int(e), buckets) for e in extents)


def voxelize(
    bck2: np.ndarray,
    label_ids: np.ndarray,
    img_size: Optional[Sequence[int]] = None,
    background: int = _BACKGROUND,
    dtype=np.float32,
    use_native: Optional[bool] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Scatter points into (input, labels) dense volumes.

    ``bck2`` must already be translated to the origin (min coords == 0),
    as the reference guarantees before voxelizing (ref dataset.py:64-69).

    Returns:
      input:  (X, Y, Z, 1) float volume, 1.0 at point coords;
      labels: (X, Y, Z) int32 volume, ``background`` everywhere else.

    Later-scatter-wins on duplicate coords, matching torch index assignment
    (ref dataset.py:85-86).
    """
    bck2 = np.asarray(bck2, dtype=np.int64)
    if img_size is None:
        img_size = np.max(bck2, axis=0) + 1 if len(bck2) else np.ones(3, int)
    sx, sy, sz = (int(s) for s in img_size)
    if use_native is None:
        use_native = dtype == np.float32
    if use_native:
        from unetsulc_tpu import runtime

        if runtime.native_available():
            return runtime.voxelize_native(
                bck2, label_ids, (sx, sy, sz), background=background
            )
    vol_in = np.zeros((sx, sy, sz, 1), dtype=dtype)
    vol_lb = np.full((sx, sy, sz), background, dtype=np.int32)
    if len(bck2):
        x, y, z = bck2[:, 0], bck2[:, 1], bck2[:, 2]
        # Clip defensively: augmentation guarantees min==0 but a fixed
        # img_size smaller than the cloud would otherwise crash (the
        # reference would crash too; we clip and count instead).
        inb = (x < sx) & (y < sy) & (z < sz) & (x >= 0) & (y >= 0) & (z >= 0)
        x, y, z = x[inb], y[inb], z[inb]
        vol_in[x, y, z, 0] = 1.0
        vol_lb[x, y, z] = np.asarray(label_ids, dtype=np.int32)[inb]
    return vol_in, vol_lb


def names_to_ids(names: np.ndarray, dict_sulci: dict) -> np.ndarray:
    """Vectorized label-name -> id lookup (ref dataset.py:85-86)."""
    return np.asarray([dict_sulci[n] for n in names], dtype=np.int32)
