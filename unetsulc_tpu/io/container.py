"""Graph serialization: ``.npz`` fast container + dispatching reader.

The reference reads graphs only through ``aims.read(gfile)``
(ref pattern_class.py:123, dataset.py:51).  Here ``read_graph`` is the single
entry point; it dispatches on extension:

* ``.npz``  — this framework's native container (fast, self-contained);
* ``.json`` — human-readable variant of the same schema (fixtures/debug);
* ``.arg``  — BrainVISA text graphs via :mod:`unetsulc_tpu.io.arg_reader`.

The ``.npz`` layout packs all buckets of all vertices into flat arrays
(structure-of-arrays), which loads in one mmap-able read — the right shape
for a host input pipeline feeding a TPU.
"""

from __future__ import annotations

import json
import os
from typing import List

import numpy as np

from unetsulc_tpu.io.graph import (
    BUCKET_TYPES,
    SulcalGraph,
    TalairachTransform,
    Vertex,
)


def save_graph_npz(graph: SulcalGraph, path: str) -> None:
    """Serialize a graph to ``.npz`` (structure-of-arrays)."""
    points, vert_index, vert_id, bucket_id = [], [], [], []
    names: List[str] = []
    for vi, v in enumerate(graph.vertices()):
        names.append(v.name if v.name is not None else "")
        for bt, bucket in v.buckets.items():
            b = np.asarray(bucket, dtype=np.int32).reshape(-1, 3)
            points.append(b)
            vert_index.append(np.full(len(b), v.index, dtype=np.int32))
            vert_id.append(np.full(len(b), vi, dtype=np.int32))
            bucket_id.append(
                np.full(len(b), BUCKET_TYPES.index(bt), dtype=np.int8)
            )
    points = (
        np.concatenate(points) if points else np.zeros((0, 3), np.int32)
    )
    cat = lambda xs, dt: (  # noqa: E731
        np.concatenate(xs) if xs else np.zeros((0,), dt)
    )
    tal = graph.talairach
    np.savez_compressed(
        path,
        points=points,
        vert_index=cat(vert_index, np.int32),
        vert_id=cat(vert_id, np.int32),
        bucket_id=cat(bucket_id, np.int8),
        vertex_names=np.array(names, dtype=object),
        vertex_indices=np.array(
            [v.index for v in graph.vertices()], dtype=np.int32
        ),
        voxel_size=np.asarray(graph.voxel_size, dtype=np.float64),
        tal_rotation=tal.rotation.astype(np.float64),
        tal_translation=tal.translation.astype(np.float64),
        tal_scale=(
            tal.scale.astype(np.float64)
            if tal.scale is not None
            else np.zeros((0,), np.float64)
        ),
        attributes=np.array(
            json.dumps(graph.attributes, default=str), dtype=object
        ),
    )


def load_graph_npz(path: str) -> SulcalGraph:
    with np.load(path, allow_pickle=True) as z:
        names = [str(n) for n in z["vertex_names"]]
        vindices = z["vertex_indices"]
        points = z["points"]
        vert_id = z["vert_id"]
        bucket_id = z["bucket_id"]
        vertices = []
        for vi, (name, index) in enumerate(zip(names, vindices)):
            buckets = {}
            vmask = vert_id == vi
            for bt_i, bt in enumerate(BUCKET_TYPES):
                sel = vmask & (bucket_id == bt_i)
                if np.any(sel):
                    buckets[bt] = points[sel]
            vertices.append(
                Vertex(
                    index=int(index),
                    name=name if name else None,
                    buckets=buckets,
                )
            )
        scale = z["tal_scale"]
        tal = TalairachTransform(
            rotation=z["tal_rotation"],
            translation=z["tal_translation"],
            scale=scale if scale.size else None,
        )
        attributes = json.loads(str(z["attributes"]))
        return SulcalGraph(
            voxel_size=tuple(z["voxel_size"]),
            vertices=vertices,
            talairach=tal,
            attributes=attributes,
        )


def save_graph_json(graph: SulcalGraph, path: str) -> None:
    """Human-readable fixture format (same schema as the npz container)."""
    tal = graph.talairach
    doc = {
        "voxel_size": list(graph.voxel_size),
        "talairach": {
            "rotation": tal.rotation.tolist(),
            "translation": tal.translation.tolist(),
            "scale": tal.scale.tolist() if tal.scale is not None else None,
        },
        "attributes": graph.attributes,
        "vertices": [
            {
                "index": v.index,
                "name": v.name,
                "buckets": {
                    bt: np.asarray(b).tolist() for bt, b in v.buckets.items()
                },
            }
            for v in graph.vertices()
        ],
    }
    with open(path, "w") as f:
        json.dump(doc, f)


def load_graph_json(path: str) -> SulcalGraph:
    with open(path, "r") as f:
        doc = json.load(f)
    tal_doc = doc.get("talairach", {})
    tal = TalairachTransform(
        rotation=np.asarray(tal_doc.get("rotation", np.eye(3).tolist())),
        translation=np.asarray(tal_doc.get("translation", [0, 0, 0])),
        scale=(
            np.asarray(tal_doc["scale"])
            if tal_doc.get("scale") is not None
            else None
        ),
    )
    vertices = [
        Vertex(
            index=int(v["index"]),
            name=v.get("name"),
            buckets={
                bt: np.asarray(b, dtype=np.int32).reshape(-1, 3)
                for bt, b in v.get("buckets", {}).items()
            },
        )
        for v in doc.get("vertices", [])
    ]
    return SulcalGraph(
        voxel_size=tuple(doc.get("voxel_size", (1.0, 1.0, 1.0))),
        vertices=vertices,
        talairach=tal,
        attributes=doc.get("attributes", {}),
    )


def read_graph(path: str) -> SulcalGraph:
    """Read a graph from any supported format (the ``aims.read`` equivalent)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npz":
        return load_graph_npz(path)
    if ext == ".json":
        return load_graph_json(path)
    if ext == ".arg":
        from unetsulc_tpu.io.arg_reader import load_graph_arg

        return load_graph_arg(path)
    raise ValueError(f"Unsupported graph format: {path}")
