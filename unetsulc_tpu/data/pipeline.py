"""Host input pipeline: dataset -> static-shape device batches, prefetched.

Replaces the reference's ``torch.utils.data.DataLoader(..., shuffle=False,
num_workers=0)`` (ref training.py:92-94,116-118) with a TPU-appropriate
loader:

* every batch has the SAME static shape (one XLA executable per phase);
* a short last batch is padded with all-background samples — they carry
  zero weight in the masked loss and metrics, so epoch numbers are
  unchanged (``real`` in each batch reports the true sample count for the
  reference's ``running_loss += loss * B`` accounting);
* voxelization for the next batch overlaps device compute via a
  single background prefetch thread (the host is the reference's hot loop
  #2, SURVEY.md §3);
* batches are placed with an explicit sharding when provided, so data
  parallelism is just "hand pjit a sharded array".
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

import jax
import numpy as np


@dataclass
class Batch:
    inputs: np.ndarray  # (B, X, Y, Z, 1) float32
    labels: np.ndarray  # (B, X, Y, Z) int32
    real: int  # number of non-padding samples


def iterate_batches(
    dataset,
    batch_size: int,
    img_size: Optional[Sequence[int]] = None,
    epoch: int = 0,
    alloc_batch: Optional[int] = None,
) -> Iterator[Batch]:
    """Yield static-shape batches in dataset order (reference: shuffle=False).

    ``img_size=None``: per-sample *shape buckets* — each sample is
    voxelized at its exact extent and padded up to the nearest bucket
    (data.voxelize.DEFAULT_BUCKET_SIZES), so XLA compiles a handful of
    executables and small samples don't pay the cohort-max volume.  This is
    the TPU analogue of the reference's batch-1 dynamic shapes
    (ref dataset.py:74-77).  With ``batch_size > 1`` samples are GROUPED by
    bucket (see inline note).

    ``alloc_batch`` (>= batch_size) pads every batch's leading dim to a
    fixed allocation — data parallelism needs the batch axis divisible by
    the mesh's ``data`` axis; padding samples are all-background and
    therefore exactly neutral in the masked loss/metrics.
    """
    if hasattr(dataset, "set_epoch"):
        dataset.set_epoch(epoch)
    n = len(dataset)
    alloc = alloc_batch or batch_size
    assert alloc >= batch_size, (alloc, batch_size)
    if img_size is None:
        from unetsulc_tpu.data.voxelize import bucket_size

        if batch_size == 1 and alloc == 1:
            for i in range(n):
                vol_in, vol_lb = dataset[i]
                # CUBIC buckets: one bucket per max-extent keeps the set of
                # compiled shapes tiny (~2-3 per cohort); independent
                # per-axis buckets explode into up to len(buckets)^3
                # executables and the recompiles dominate (measured 200x
                # slowdown on the chip).
                b = bucket_size(max(vol_in.shape[:3]))
                inputs = np.zeros((1, b, b, b, 1), np.float32)
                labels = np.full((1, b, b, b), -1, np.int32)
                sx, sy, sz = vol_in.shape[:3]
                inputs[0, :sx, :sy, :sz] = vol_in
                labels[0, :sx, :sy, :sz] = vol_lb
                yield Batch(inputs=inputs, labels=labels, real=1)
            return
        # Bucket-GROUPED batching (batch_size > 1): group samples whose
        # cubic bucket matches into full batches, so data-parallel training
        # keeps the per-sample-bucket win instead of paying cohort-max
        # volumes.  Short groups are padded with all-background samples —
        # they contribute zero valid voxels, so the masked loss/metrics and
        # gradients are bit-identical to dropping them.  NOTE: grouping
        # reorders samples within the epoch; this path is used only for the
        # data-parallel configuration, which has no reference counterpart
        # (SURVEY.md §2.2 — new design).
        groups: dict = {}
        for i in range(n):
            b = bucket_size(dataset.sample_extent(i))
            groups.setdefault(b, []).append(i)
        for b in sorted(groups):
            idxs_all = groups[b]
            for start in range(0, len(idxs_all), batch_size):
                idxs = idxs_all[start : start + batch_size]
                inputs = np.zeros((alloc, b, b, b, 1), np.float32)
                labels = np.full((alloc, b, b, b), -1, np.int32)
                for bi, i in enumerate(idxs):
                    vol_in, vol_lb = dataset[i]
                    sx, sy, sz = vol_in.shape[:3]
                    inputs[bi, :sx, :sy, :sz] = vol_in
                    labels[bi, :sx, :sy, :sz] = vol_lb
                yield Batch(inputs=inputs, labels=labels, real=len(idxs))
        return
    sx, sy, sz = (int(s) for s in img_size)
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        inputs = np.zeros((alloc, sx, sy, sz, 1), np.float32)
        labels = np.full((alloc, sx, sy, sz), -1, np.int32)
        for bi, i in enumerate(idxs):
            vol_in, vol_lb = dataset[i]
            assert vol_in.shape[:3] == (sx, sy, sz), (
                f"sample {i} shape {vol_in.shape[:3]} != static {img_size}; "
                "choose img_size >= dataset.max_image_size()"
            )
            inputs[bi] = vol_in
            labels[bi] = vol_lb
        yield Batch(inputs=inputs, labels=labels, real=len(idxs))


def device_iterator(
    batches: Iterator[Batch],
    sharding=None,
    prefetch: int = 2,
):
    """Move batches to device ahead of compute via a prefetch thread.

    Yields (inputs_on_device, labels_on_device, real).
    """

    def put(batch: Batch):
        if sharding is not None:
            inp = jax.device_put(batch.inputs, sharding)
            lab = jax.device_put(batch.labels, sharding)
        else:
            inp = jax.device_put(batch.inputs)
            lab = jax.device_put(batch.labels)
        return inp, lab, batch.real

    if prefetch <= 0:
        for b in batches:
            yield put(b)
        return

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    _END = object()
    err = []

    def producer():
        try:
            for b in batches:
                q.put(put(b))
        except BaseException as e:  # surfaced in the consumer
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item


def choose_static_size(
    dataset,
    buckets: Optional[Sequence[int]] = None,
    num_epochs: Optional[int] = None,
) -> tuple:
    """Static (X, Y, Z) for a dataset: its max size, bucketed.

    ``num_epochs`` enables the exact replayable-stream scan for train
    datasets (see SulciDataset.max_image_size)."""
    from unetsulc_tpu.data.voxelize import DEFAULT_BUCKET_SIZES, bucket_shape

    size = dataset.max_image_size(num_epochs=num_epochs)
    return bucket_shape(size, buckets or DEFAULT_BUCKET_SIZES)
