"""Optional grain-based input pipeline.

SURVEY.md §7 planned a "grain/tf.data host input pipeline"; the default
loader (:mod:`unetsulc_tpu.data.pipeline`) is a dependency-free threadated
prefetcher sized for this host (1 core/chip).  This adapter exposes the
same datasets through `grain` for deployments that want its worker pools,
determinism bookkeeping and checkpointable iterators:

    loader = make_grain_loader(dataset, img_size, batch_size=2)
    for batch in loader:  # dict of numpy arrays
        ...

Imported lazily — grain is optional.
"""

from __future__ import annotations

from typing import Optional, Sequence


class _SulciDataSource:
    """grain RandomAccessDataSource over a SulciDataset."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, index: int):
        vol_in, vol_lb = self._dataset[int(index)]
        return {"inputs": vol_in, "labels": vol_lb}


def make_grain_loader(
    dataset,
    img_size: Sequence[int],
    batch_size: int = 1,
    num_epochs: int = 1,
    worker_count: int = 0,
    seed: Optional[int] = None,
):
    """Build a grain DataLoader over a SulciDataset (fixed static shape).

    Order is sequential like the reference's shuffle=False loaders
    (ref training.py:92-94); augmentation randomness lives inside the
    dataset's replayable per-index RNG, so grain's own shuffling stays off
    and worker processes produce identical streams.
    """
    import grain.python as grain

    dataset.img_size = list(img_size)
    source = _SulciDataSource(dataset)
    sampler = grain.IndexSampler(
        num_records=len(source),
        shard_options=grain.NoSharding(),
        shuffle=False,
        num_epochs=num_epochs,
        seed=seed,
    )
    return grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size, drop_remainder=False)],
        worker_count=worker_count,
    )
