"""Losses: masked cross-entropy matching torch ``CrossEntropyLoss(ignore_index=-1)``.

The reference's criterion (ref training.py:141) takes raw logits, ignores
voxels labelled -1 and mean-reduces over the remaining voxels.  XLA has no
ignore_index, so the mask is explicit; the division uses the count of valid
voxels (torch 'mean' reduction semantics), NOT the volume size, and a
fully-background batch yields 0 loss instead of NaN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_ignore(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """Mean CE over voxels where labels != ignore_index.

    logits: (..., C) float; labels: (...) int.

    Written gather-free: ``take_along_axis`` would lower its backward to a
    scatter over the full (voxels, C) tensor — ~20 ms/step of HBM traffic
    at 96^3 x 63 on v5e (profiled).  The one-hot masked-sum formulation
    keeps both passes as fusable elementwise+reduce work.
    """
    nll_sum, count = cross_entropy_sum(logits, labels, ignore_index)
    return nll_sum / jnp.maximum(count, 1)


def cross_entropy_sum(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = -1,
):
    """Unreduced pieces of :func:`cross_entropy_ignore`: (NLL sum, valid
    voxel count).  Lets callers combine per-volume terms with the exact
    batch-mean semantics (sum of sums / sum of counts) — the batch-scan
    train step uses this so scanning volumes one at a time reproduces the
    batched loss bit-for-bit up to reduction order."""
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    logits32 = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits32, axis=-1)
    onehot = labels[..., None] == jax.lax.broadcasted_iota(
        labels.dtype, (1,) * labels.ndim + (num_classes,), labels.ndim
    )
    picked = jnp.sum(jnp.where(onehot, logits32, 0.0), axis=-1)
    nll = jnp.where(valid, lse - picked, 0.0)
    return nll.sum(), valid.sum()
