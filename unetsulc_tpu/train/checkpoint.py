"""Checkpoint / resume — the subsystem the reference lacks.

The reference keeps best weights in memory and writes artifacts only at
the end of the whole CV run, so a crash mid-CV loses everything
(SURVEY.md §5: "A crash mid-CV loses everything").  Here:

* **epoch level** — :class:`TrainCheckpointer` snapshots the full training
  state (trainable/frozen params, momentum buffers, lr, step) with orbax
  plus a JSON sidecar (epoch counter, controller states, best-so-far),
  every N epochs; ``learning()`` resumes from the latest snapshot.
* **fold level** — the CV driver persists results after every fold and
  skips already-completed folds on restart (experiment.driver).

``.mdsm`` + ``params.json`` stay the *interchange* format (reference
compatibility); orbax is the native in-training format.
"""

from __future__ import annotations

import json
import os
import os.path as op
import shutil
from typing import Any, Optional, Tuple

import jax
import numpy as np



class TrainCheckpointer:
    def __init__(self, directory: str, keep: int = 2):
        self.directory = op.abspath(directory)
        self.keep = keep
        os.makedirs(self.directory, exist_ok=True)

    def _epoch_dir(self, epoch: int) -> str:
        return op.join(self.directory, f"epoch_{epoch:05d}")

    def epochs(self):
        out = []
        for d in os.listdir(self.directory):
            if d.startswith("epoch_") and op.exists(
                op.join(self.directory, d, "meta.json")
            ):
                out.append(int(d.split("_")[1]))
        return sorted(out)

    def save(self, epoch: int, tree: Any, extra: Optional[dict] = None):
        """Snapshot an arbitrary pytree + JSON-serializable extra."""
        import orbax.checkpoint as ocp

        path = self._epoch_dir(epoch)
        tmp = path + ".tmp"
        if op.exists(tmp):
            shutil.rmtree(tmp)
        ckptr = ocp.StandardCheckpointer()
        host_tree = jax.tree.map(np.asarray, tree)
        ckptr.save(op.join(tmp, "state"), host_tree)
        ckptr.wait_until_finished()
        with open(op.join(tmp, "meta.json"), "w") as f:
            json.dump({"epoch": epoch, "extra": extra or {}}, f)
        if op.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        # retention
        for old in self.epochs()[: -self.keep]:
            shutil.rmtree(self._epoch_dir(old), ignore_errors=True)

    def latest(self) -> Optional[int]:
        eps = self.epochs()
        return eps[-1] if eps else None

    def restore(
        self, template: Any, epoch: Optional[int] = None
    ) -> Tuple[int, Any, dict]:
        """Restore (epoch, tree, extra); ``template`` fixes structure/shapes."""
        import orbax.checkpoint as ocp

        if epoch is None:
            epoch = self.latest()
        assert epoch is not None, "no checkpoint found"
        path = self._epoch_dir(epoch)
        ckptr = ocp.StandardCheckpointer()
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
            jax.tree.map(np.asarray, template),
        )
        tree = ckptr.restore(op.join(path, "state"), abstract)
        with open(op.join(path, "meta.json")) as f:
            meta = json.load(f)
        tree = jax.tree.map(jax.numpy.asarray, tree)
        return meta["epoch"], tree, meta.get("extra", {})
