"""Geometry helpers: rotations and bounding boxes for point clouds.

Same math as the reference's transformations.py-derived helpers
(ref dataset.py:204-326) but written against ``numpy.random.Generator`` so
augmentation streams are *replayable by construction* (a seed fully
determines the stream) instead of the reference's global-seed discipline
(ref training.py:120-136).
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np


def unit_vector(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def rotation_matrix(angle: float, direction, point=None) -> np.ndarray:
    """4x4 homogeneous rotation about an axis through ``point``.

    Rodrigues form, identical semantics to ref dataset.py:260-301.
    """
    sina = math.sin(angle)
    cosa = math.cos(angle)
    d = unit_vector(np.asarray(direction, dtype=np.float64)[:3])
    r = np.diag([cosa, cosa, cosa])
    r += np.outer(d, d) * (1.0 - cosa)
    ds = d * sina
    r += np.array(
        [
            [0.0, -ds[2], ds[1]],
            [ds[2], 0.0, -ds[0]],
            [-ds[1], ds[0], 0.0],
        ]
    )
    m = np.identity(4)
    m[:3, :3] = r
    if point is not None:
        point = np.asarray(point, dtype=np.float64)[:3]
        m[:3, 3] = point - r @ point
    return m


def random_rotation(
    center, rot_angle: float, rng: np.random.Generator
) -> np.ndarray:
    """Random-axis rotation with N(0, rot_angle) magnitude around ``center``.

    Axis sampled uniformly on the sphere via (theta, z), angle sampled
    normal — exactly the reference's distribution (ref dataset.py:304-315),
    but drawn from an explicit Generator.
    """
    th = rng.uniform(0, 2 * math.pi)
    z = rng.uniform(-1, 1)
    direction = [
        math.sqrt(1 - z**2) * math.cos(th),
        math.sqrt(1 - z**2) * math.sin(th),
        z,
    ]
    return rotation_matrix(rng.normal(0, rot_angle), direction, np.asarray(center))


def rotate_points(points: np.ndarray, transrot: np.ndarray) -> np.ndarray:
    """Apply a 4x4 homogeneous transform to (n,3) points, truncating to int.

    Matches ref dataset.py:318-326 (``rotation_bck``) including the
    int truncation (``np.array(..., dtype=int)`` truncates toward zero).
    """
    pts = np.asarray(points, dtype=np.float64)
    out = pts @ transrot[:3, :3].T + transrot[:3, 3]
    return out.astype(int)


def augment_points(
    bck2: np.ndarray, rot_angle: float, rng: np.random.Generator
) -> np.ndarray:
    """Reference train-time augmentation (ref dataset.py:33-43).

    Rotate around the half-extent point, then translate so min coords = 0.
    """
    bck2 = np.asarray(bck2)
    center = (np.max(bck2, axis=0) - np.min(bck2, axis=0)) / 2
    transrot = random_rotation(center, rot_angle, rng)
    bck2 = rotate_points(bck2, transrot)
    return bck2 - np.min(bck2, axis=0)


def apply_bounding_box(
    points: np.ndarray, bb: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Keep points inside an inclusive per-axis [lo, hi] box.

    Returns (inside_points, inside_indices) — ref dataset.py:204-213.
    """
    bb = np.asarray(bb)
    points = np.asarray(points)
    inidx = np.all((bb[:, 0] <= points) & (points <= bb[:, 1]), axis=1)
    return points[inidx], np.nonzero(inidx)[0]


def rotation_size_bound(bck2: np.ndarray, rot_angle: float, quantile_sigma: float = 4.0) -> np.ndarray:
    """Analytic upper bound on the post-augmentation extent of a point cloud.

    The reference discovers the max augmented size empirically by replaying
    ``num_epochs`` full augmentation passes over the dataset
    (ref training.py:120-127) — O(epochs x dataset) wasted voxelizations.
    A rotation about the cloud's center cannot move any point further from
    the center than the cloud's circumradius, so after re-translation to the
    origin the extent per axis is bounded by ``2 * circumradius + 1``.
    This computes that bound directly (quantile_sigma is unused for the
    hard bound; kept for a future probabilistic mode).
    """
    bck2 = np.asarray(bck2, dtype=np.float64)
    center = (np.max(bck2, axis=0) - np.min(bck2, axis=0)) / 2
    shifted = bck2 - np.min(bck2, axis=0)
    radius = np.sqrt(((shifted - center) ** 2).sum(axis=1)).max()
    return np.ceil(2 * radius + 1) * np.ones(3)
