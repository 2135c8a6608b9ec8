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
    """
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe = jnp.clip(labels, 0, num_classes - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(valid.sum(), 1)
    return nll.sum() / count
