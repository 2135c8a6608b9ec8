"""Elementary-fold cutting: threshold-gated re-segmentation + majority vote.

Native equivalent of ``deepsulci.sulci_labeling.method.cutting.cutting``,
whose source is outside the reference repo.  The observable contract is
pinned at ref pattern_class.py:229-234 (SURVEY.md §2.3 + README.md:19-23):

    cutting(yscores, vert_notcut, bck2, threshold) -> per-voxel label ids

* ``yscores``     — (n_voxels, n_classes) per-voxel class scores from
  :meth:`labeling` (ref pattern_class.py:275-277);
* ``vert_notcut`` — elementary-fold vertex id per voxel, taken from the
  *uncut* graph aligned by lexicographic sort on native coords;
* ``bck2``        — voxel integer coordinates;
* ``threshold``   — minimum voxel count for a cut.

Semantics (README.md:22 "cutting threshold ... labellisation de chaque
elementary fold par vote"): within each elementary fold, voxels are grouped
by their argmax label; labels whose voxel count reaches ``threshold`` define
the fold's sub-parts (split along 26-connected components); voxels of
sub-threshold minority labels are merged into the nearest surviving part.
Every resulting part is relabelled by majority vote of the summed voxel
scores.  A fold with no second label above threshold is NOT cut and is
relabelled whole by score vote.

This is post-processing outside the jit hot loop, so it runs on host numpy/
scipy (per SURVEY.md §2.3 plan); the voxels-of-interest score gather that
feeds it is produced on-device.

Every semantic decision that the reference does not pin (threshold ``>=``,
score-vote vs count-vote, 26-connectivity, single-label folds, minority
absorption order, tie-breaking) is documented with evidence and divergence
risk in ``CONTRACTS.md`` §2 and enforced by hand-computed goldens
(tests/test_ops.py::test_contract_*).
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def _components(points: np.ndarray) -> np.ndarray:
    """26-connected component id per point (points: (n, 3) ints >= 0)."""
    if len(points) == 1:
        return np.zeros(1, dtype=np.int64)
    lo = points.min(axis=0)
    pts = points - lo
    dims = pts.max(axis=0) + 1
    vol = np.zeros(dims, dtype=bool)
    vol[pts[:, 0], pts[:, 1], pts[:, 2]] = True
    labeled, _ = ndimage.label(vol, structure=np.ones((3, 3, 3), dtype=int))
    return labeled[pts[:, 0], pts[:, 1], pts[:, 2]].astype(np.int64)


def _nearest_assignment(
    src: np.ndarray, dst: np.ndarray
) -> np.ndarray:
    """Index into ``dst`` of the nearest dst point for each src point.

    KD-tree for large folds (brute force is O(n*m) and real folds reach
    thousands of voxels); ties resolve to the lowest index either way.
    """
    if len(src) * len(dst) <= 4096:
        d2 = ((src[:, None, :] - dst[None, :, :]) ** 2).sum(-1)
        return np.argmin(d2, axis=1)
    from scipy.spatial import cKDTree

    _, idx = cKDTree(dst).query(src, k=1)
    return np.asarray(idx)


def cut_part_ids_multi(
    ypred,
    vert_notcut,
    bck2,
    thresholds,
) -> np.ndarray:
    """Per-voxel part id of the threshold-gated re-segmentation, for every
    threshold of a sweep at once: returns (T, n) dense part ids.

    This is the *geometry* half of :func:`cutting`: everything except the
    score vote depends only on the per-voxel argmax labels (``ypred``),
    the elementary-fold ids, the voxel coordinates and the threshold —
    NOT on the score magnitudes.  Splitting it out lets the threshold
    sweep keep the (n_voxels, n_classes) score matrix on device and vote
    there (train/step.py ``make_vote_fn``): the host only ever sees the
    small ``ypred`` fetch and the per-part vote results, instead of the
    ~4 MB/volume score transfer that dominates label latency through the
    axon tunnel.

    Computing all thresholds together shares the expensive per-(fold,
    label) connected-components pass (threshold-independent: components
    of a label's voxels within a fold are the same whatever the cut
    threshold); only the cheap big-label gating and minority attachment
    run per threshold.

    Part ids are dense and globally unique across folds per threshold row
    (0..n_parts_t-1).
    """
    ypred = np.asarray(ypred)
    vert = np.asarray(vert_notcut)
    bck2 = np.asarray(bck2, dtype=np.int64)
    n = len(ypred)
    assert len(vert) == n and len(bck2) == n, "misaligned cutting inputs"
    thresholds = list(thresholds)
    t_n = len(thresholds)
    if t_n == 0:
        return np.zeros((0, n), dtype=np.int64)
    th_min = min(thresholds)

    part = np.full((t_n, n), -1, dtype=np.int64)
    next_part = np.zeros(t_n, dtype=np.int64)

    for v in np.unique(vert):
        idx = np.nonzero(vert == v)[0]
        preds = ypred[idx]
        labels, counts = np.unique(preds, return_counts=True)
        pts = bck2[idx]

        # components once per label that any threshold can keep
        comps = {
            int(lab): _components(pts[preds == lab])
            for lab in labels[counts >= th_min]
        }

        for t, threshold in enumerate(thresholds):
            big = labels[counts >= threshold]

            if len(big) <= 1:
                # no cut: the whole fold is one part
                part[t, idx] = next_part[t]
                next_part[t] += 1
                continue

            is_big = np.isin(preds, big)
            part_id = np.full(len(idx), -1, dtype=np.int64)
            local_next = 0
            # split each surviving label's voxels into their components
            for lab in big:
                sel = np.nonzero(preds == lab)[0]
                comp = comps[int(lab)]
                for c in np.unique(comp):
                    part_id[sel[comp == c]] = local_next
                    local_next += 1
            # attach sub-threshold minority voxels to the nearest
            # surviving part
            small = np.nonzero(~is_big)[0]
            if len(small):
                anchors = np.nonzero(is_big)[0]
                nearest = _nearest_assignment(pts[small], pts[anchors])
                part_id[small] = part_id[anchors[nearest]]
            part[t, idx] = next_part[t] + part_id
            next_part[t] += local_next

    return part


def cut_part_ids(
    ypred,
    vert_notcut,
    bck2,
    threshold: int,
) -> np.ndarray:
    """Per-voxel part id of one threshold's re-segmentation (n,); see
    :func:`cut_part_ids_multi`."""
    return cut_part_ids_multi(ypred, vert_notcut, bck2, [threshold])[0]


def cutting(
    yscores,
    vert_notcut,
    bck2,
    threshold: int,
) -> np.ndarray:
    """Return per-voxel predicted label ids after fold cutting."""
    yscores = np.asarray(yscores, dtype=np.float64)
    n = len(yscores)

    ypred = np.argmax(yscores, axis=1)
    part = cut_part_ids(ypred, vert_notcut, bck2, threshold)

    # relabel each part by majority vote of summed scores
    out = np.empty(n, dtype=np.int64)
    for p in np.unique(part):
        sel = part == p
        out[sel] = int(np.argmax(yscores[sel].sum(axis=0)))
    return out
