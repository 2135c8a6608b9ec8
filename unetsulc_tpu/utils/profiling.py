"""Tracing / profiling utilities.

The reference's only tracing is wall-clock prints per epoch/run
(SURVEY.md §5).  This module upgrades that to:

* :class:`EpochTimer` — per-phase wall time + voxels/sec (the BASELINE.json
  north-star metric) reported every epoch and accumulated into
  ``results['voxels_per_sec_<phase>']``;
* :func:`trace` — a ``jax.profiler`` context writing xplane traces viewable
  in TensorBoard's profile plugin (set ``UNETSULC_TRACE_DIR`` or pass a
  path);
* :func:`summarize_xplane` — host-side aggregation of a captured trace by
  HLO op (used to produce the numbers in BASELINE.md without the
  TensorBoard UI).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional


class EpochTimer:
    """Accumulates wall time and voxel counts within one epoch phase."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._start = time.perf_counter()
        self.voxels = 0

    def add_batch(self, batch_voxels: int):
        self.voxels += int(batch_voxels)

    def finish(self) -> dict:
        elapsed = max(time.perf_counter() - self._start, 1e-9)
        return {
            "seconds": elapsed,
            "voxels": self.voxels,
            "voxels_per_sec": self.voxels / elapsed,
        }


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace context; no-op when no directory is configured."""
    log_dir = log_dir or os.environ.get("UNETSULC_TRACE_DIR")
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


def summarize_xplane(xplane_path: str, top: int = 20):
    """Aggregate device-op durations from an xplane trace.

    Returns a list of (total_us, op_name), most expensive first.  Requires
    the tensorflow xplane proto (present in this image); degrades with a
    clear error otherwise.
    """
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    xs = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        xs.ParseFromString(f.read())
    import collections

    agg = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name:
            continue
        names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                agg[names.get(ev.metadata_id, "?")] += ev.duration_ps / 1e6
    return [(us, name) for name, us in agg.most_common(top)]
