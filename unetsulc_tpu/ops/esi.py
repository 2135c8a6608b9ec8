"""ESI (Error Similarity Index) — the reference's accuracy metric.

Contract (SURVEY.md §2.3, pinned from ref training.py:223-225 and
ref pattern_class.py:233-234; metric defined in Borne et al. 2020):

    esi_score(y_true, y_pred, labels)
      = mean over ``labels`` of  E_local(s) = (FP_s + FN_s) / (2*TP_s + FP_s + FN_s)

with labels that never occur (TP=FP=FN=0) contributing 0 error.  Reported
accuracy is ``1 - esi`` and threshold scores are ``(1 - esi) * 100``.

Every semantic decision (weighting, absent labels, background handling) is
documented with evidence and divergence risk in ``CONTRACTS.md`` §1 and
enforced by hand-computed goldens (tests/test_ops.py::test_contract_*).

The reference accumulates *every non-background voxel prediction of an
epoch in Python lists* (ref training.py:197,216-217) and scores at epoch
end — memory-heavy and host-bound (SURVEY.md §3 hot loop #4).  Here the
same numbers come from an on-device (TP, FP, FN) count tensor per class,
updated inside the jitted train step via one-hot matmuls/bincounts, then
reduced on host.  Counts are sufficient statistics for ESI, so the result
is exact, not an approximation.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def confusion_counts(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    num_classes: int,
    background: int = -1,
) -> jnp.ndarray:
    """On-device (3, num_classes) [TP, FP, FN] counts, background masked.

    y_true / y_pred: integer arrays of any (identical) shape.  Runs inside
    jit; voxels with ``y_true == background`` are excluded, matching the
    reference's ``labels != background`` filter (ref training.py:216-217).
    """
    t = y_true.reshape(-1)
    p = y_pred.reshape(-1)
    valid = t != background
    # One-hot weighted column sums instead of scatter-adds: scatters
    # serialize on TPU (~6 ms/step at 884k voxels, profiled); the one-hot
    # comparison + reduction fuses onto the VPU.
    classes = jax.lax.broadcasted_iota(t.dtype, (1, num_classes), 1)
    w = valid.astype(jnp.float32)
    t_oh = (t[:, None] == classes).astype(jnp.float32)
    p_oh = (p[:, None] == classes).astype(jnp.float32)
    match = w * (t == p).astype(jnp.float32)
    t_counts = jnp.sum(t_oh * w[:, None], axis=0)
    p_counts = jnp.sum(p_oh * w[:, None], axis=0)
    tp = jnp.sum(t_oh * match[:, None], axis=0)
    fp = p_counts - tp
    fn = t_counts - tp
    return jnp.stack([tp, fp, fn]).astype(jnp.int32)


def esi_from_counts(counts: np.ndarray, label_ids: Sequence[int]) -> float:
    """ESI from a (3, num_classes) count tensor restricted to ``label_ids``.

    ``label_ids`` = integer ids of the sslist labels (non-unknown,
    non-ventricle sulci), matching
    ``[dict_sulci[ss] for ss in sslist]`` (ref training.py:225).
    """
    counts = np.asarray(counts)
    label_ids = list(label_ids)
    if not label_ids:
        return 0.0
    tp = counts[0, label_ids].astype(np.float64)
    fp = counts[1, label_ids].astype(np.float64)
    fn = counts[2, label_ids].astype(np.float64)
    denom = 2 * tp + fp + fn
    elocal = np.where(denom > 0, (fp + fn) / np.where(denom > 0, denom, 1), 0.0)
    return float(elocal.mean())


def esi_score(y_true, y_pred, labels) -> float:
    """Drop-in host equivalent of ``deepsulci...stats.esi_score``.

    ``labels`` may be label *names* (when y_true/y_pred hold names, as in
    the threshold sweep, ref pattern_class.py:233) or integer ids (as in
    the train loop, ref training.py:225).
    """
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    labels = list(labels)
    if not labels:
        return 0.0
    total = 0.0
    for lab in labels:
        t = y_true == lab
        p = y_pred == lab
        tp = float(np.sum(t & p))
        fp = float(np.sum(~t & p))
        fn = float(np.sum(t & ~p))
        denom = 2 * tp + fp + fn
        if denom > 0:
            total += (fp + fn) / denom
    return total / len(labels)


def elocal_scores(y_true, y_pred, labels) -> dict:
    """Per-label local error dict (feeds the evaluation CSVs / figures)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    out = {}
    for lab in labels:
        t = y_true == lab
        p = y_pred == lab
        tp = float(np.sum(t & p))
        fp = float(np.sum(~t & p))
        fn = float(np.sum(t & ~p))
        denom = 2 * tp + fp + fn
        out[lab] = (fp + fn) / denom if denom > 0 else 0.0
    return out
