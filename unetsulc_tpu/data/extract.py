"""Point extraction from sulcal graphs — the ``extract_data`` contract.

Reimplements, vectorized over whole buckets, the per-point loop of the
reference (ref dataset.py:173-201; identical contract to
``deepsulci.deeptools.dataset.extract_data``, ref pattern_class.py:19,126).
For every voxel of every bucket (``aims_ss``/``aims_bottom``/``aims_other``)
of every vertex it emits:

* ``nbck``  — native integer voxel coordinates (x optionally flipped);
* ``bck``   — Talairach mm coordinates: ``tal.transform(point * voxel_size)``;
* ``bck2``  — half-scale rounded int coords ``round(bck / 2)`` — the
  reference's deliberate 2x spatial downsample (ref dataset.py:196-198,
  "FIXME: Why /2 ?"), kept because the pretrained BrainVISA models were
  trained at this scale;
* ``vert``  — the vertex ``index`` attribute;
* ``names`` — the vertex ``name`` (``'unknown'`` when absent).

Returns numpy arrays instead of Python lists (the reference's callers
immediately ``np.asarray`` the lists anyway, ref pattern_class.py:190-199).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from unetsulc_tpu.io.graph import BUCKET_TYPES, SulcalGraph


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """Python ``round()`` on floats coming from C double arithmetic.

    The reference uses builtin ``round`` (banker's rounding on exact .5
    ties, ref dataset.py:197).  Exact .5 values are measure-zero for real
    Talairach outputs; numpy's ``np.round`` (also round-half-even) matches
    builtin round semantics for these inputs.
    """
    return np.round(x)


def extract_data(graph: SulcalGraph, flip: bool = False) -> Dict[str, np.ndarray]:
    """Extract sulci point data from a sulcal graph.

    Parameters mirror the reference's signature (graph, flip); ``flip``
    negates native x before any transform (R-hemisphere mirroring,
    ref dataset.py:190-191).
    """
    tal = graph.talairach_transform()
    vs = np.asarray(graph["voxel_size"], dtype=np.float64)[:3]

    nbck_parts, bck_parts, vert_parts, name_parts = [], [], [], []
    for vertex in graph.vertices():
        name = vertex.name if vertex.name is not None else "unknown"
        for bck_type in BUCKET_TYPES:
            if bck_type not in vertex.buckets:
                continue
            pts = np.asarray(vertex.buckets[bck_type], dtype=np.float64)
            if pts.size == 0:
                continue
            pts = pts.reshape(-1, 3).copy()
            if flip:
                pts[:, 0] *= -1
            nbck_parts.append(pts.astype(np.int64))
            p0 = pts * vs
            p1 = tal.transform(p0)
            bck_parts.append(p1)
            n = len(pts)
            vert_parts.append(np.full(n, vertex.index, dtype=np.int64))
            name_parts.extend([name] * n)

    if nbck_parts:
        nbck = np.concatenate(nbck_parts)
        bck = np.concatenate(bck_parts)
        vert = np.concatenate(vert_parts)
    else:
        nbck = np.zeros((0, 3), np.int64)
        bck = np.zeros((0, 3), np.float64)
        vert = np.zeros((0,), np.int64)
    bck2 = _round_half_away(bck / 2.0).astype(np.int64)
    names = np.asarray(name_parts, dtype=object)
    return {"bck": bck, "nbck": nbck, "bck2": bck2, "vert": vert, "names": names}
