"""In-memory model of a BrainVISA cortical fold graph.

The reference accesses graphs exclusively through ``soma.aims`` C++ bindings
(ref pattern_class.py:18,123; dataset.py:5,51).  The observable API used
there is small and is what this class provides natively:

* ``graph['voxel_size']``                       (ref dataset.py:178)
* ``graph.vertices()`` iterator                 (ref dataset.py:180)
* per-vertex attrs ``'name'``, ``'index'`` and bucket keys
  ``aims_ss`` / ``aims_bottom`` / ``aims_other`` whose value behaves like
  ``vertex[bck_type][0].keys()`` = integer voxel coordinates
  (ref dataset.py:186-200)
* ``talairach_transform()`` — equivalent of
  ``aims.GraphManip.talairach(graph)`` (ref dataset.py:177)

Buckets are stored as ``(n, 3)`` int32 numpy arrays, which is both the
natural numpy representation and what the host-side voxelizer consumes.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Optional

import numpy as np

BUCKET_TYPES = ("aims_ss", "aims_bottom", "aims_other")


@dataclasses.dataclass
class Vertex:
    """One elementary fold: a labelled set of voxels.

    Mirrors the attribute surface the reference reads off an AIMS vertex
    (ref dataset.py:181-200): optional ``name``, integer ``index`` and up to
    three bucket point-sets.
    """

    index: int
    name: Optional[str] = None
    buckets: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)

    def __contains__(self, key: str) -> bool:
        if key == "name":
            return self.name is not None
        if key == "index":
            return True
        return key in self.buckets

    def __getitem__(self, key: str):
        if key == "name":
            if self.name is None:
                raise KeyError("name")
            return self.name
        if key == "index":
            return self.index
        return self.buckets[key]

    def npoints(self) -> int:
        return int(sum(len(b) for b in self.buckets.values()))


@dataclasses.dataclass
class TalairachTransform:
    """Affine ``p -> scale * (R @ (p + t))`` — TRANSLATION FIRST.

    ``aims.GraphManip.talairach`` composes the graph attributes into
    ``scale_motion * rotation_motion * translation_motion`` (AIMS
    graphmanip.cc: the rotation motion is multiplied by the translation
    motion on the right, then the diagonal scale motion is applied last).
    Semantically this is the classic Talairach normalisation pipeline:
    translate the anterior commissure to the origin
    (``Talairach_translation`` stores that shift), rotate into AC-PC
    alignment (``Talairach_rotation``, row-major 3x3), then normalise
    (``Talairach_scale`` diagonal).  The reference itself only ever calls
    ``.transform(p)`` (ref dataset.py:177,194).

    Composition order is pinned in CONTRACTS.md §3 (decision T1) and
    enforced by a hand-computed fixture
    (tests/test_io.py::test_contract_talairach_composition_order) — with
    identity rotation or unit scale the two plausible orders coincide, so
    the fixture uses a non-trivial R, t AND s.
    """

    rotation: np.ndarray  # (3, 3) float64
    translation: np.ndarray  # (3,) float64
    scale: Optional[np.ndarray] = None  # (3,) float64 diagonal or None

    @classmethod
    def identity(cls) -> "TalairachTransform":
        return cls(np.eye(3), np.zeros(3))

    def matrix(self) -> np.ndarray:
        """Return the 4x4 homogeneous matrix (scale @ rotation @ translation)."""
        m = np.eye(4)
        m[:3, :3] = self.rotation
        m[:3, 3] = self.rotation @ self.translation
        if self.scale is not None:
            s = np.eye(4)
            s[:3, :3] = np.diag(self.scale)
            m = s @ m
        return m

    def transform(self, p) -> np.ndarray:
        """Apply to one point (3,) or a batch (n, 3)."""
        p = np.asarray(p, dtype=np.float64)
        out = (p + self.translation) @ self.rotation.T
        if self.scale is not None:
            out = out * self.scale
        return out


class SulcalGraph:
    """A cortical fold graph: global attributes + vertices.

    Behaves like the subset of ``aims`` Graph the reference uses:
    ``graph['voxel_size']``, ``graph.vertices()``; everything else lives in
    ``attributes``.
    """

    def __init__(
        self,
        voxel_size=(1.0, 1.0, 1.0),
        vertices: Optional[List[Vertex]] = None,
        talairach: Optional[TalairachTransform] = None,
        attributes: Optional[dict] = None,
    ):
        self.voxel_size = tuple(float(v) for v in voxel_size)
        self._vertices: List[Vertex] = list(vertices or [])
        self.talairach = talairach or TalairachTransform.identity()
        self.attributes = dict(attributes or {})

    def __getitem__(self, key: str):
        if key == "voxel_size":
            return list(self.voxel_size)
        return self.attributes[key]

    def __contains__(self, key: str) -> bool:
        return key == "voxel_size" or key in self.attributes

    def vertices(self) -> Iterable[Vertex]:
        return list(self._vertices)

    def add_vertex(self, vertex: Vertex) -> None:
        self._vertices.append(vertex)

    def talairach_transform(self) -> TalairachTransform:
        return self.talairach

    def npoints(self) -> int:
        return int(sum(v.npoints() for v in self._vertices))

    def label_set(self) -> List[str]:
        return sorted({v.name for v in self._vertices if v.name is not None})


def make_synthetic_graph(
    rng: np.random.Generator,
    labels: List[str],
    n_folds_per_label: int = 1,
    points_per_fold: int = 40,
    extent: float = 64.0,
    voxel_size=(1.0, 1.0, 1.0),
    unknown_fraction: float = 0.0,
    structured: bool = True,
) -> SulcalGraph:
    """Generate a random but structurally valid graph for tests/benchmarks.

    Each fold is a random-walk blob of voxels (so folds are spatially
    connected, which the cutting post-processing tests rely on).  Stands in
    for real ``.arg`` cohorts which are not redistributable (SURVEY.md §4
    test plan: "synthetic-graph fixtures ... standing in for aims I/O").

    ``structured=True`` anchors each label's folds near a label-specific
    canonical location (stable across subjects, like real sulcal anatomy)
    with per-subject jitter — making the labelling task *learnable* so
    training demos/tests show real accuracy gains.  ``structured=False``
    places folds uniformly at random (unlearnable; prior-only).
    """
    import zlib

    vertices: List[Vertex] = []
    index = 1
    for label in labels:
        if structured:
            label_rng = np.random.default_rng(zlib.crc32(label.encode()))
            canonical = label_rng.uniform(0.15, 0.85, size=3) * extent
        for _ in range(n_folds_per_label):
            name = label
            if unknown_fraction and rng.random() < unknown_fraction:
                name = "unknown"
            if structured:
                start = canonical + rng.normal(0, extent * 0.04, size=3)
                start = np.clip(start, 4, extent - 4)
            else:
                start = rng.uniform(8, extent - 8, size=3)
            steps = rng.integers(-1, 2, size=(points_per_fold, 3))
            pts = np.cumsum(steps, axis=0) + np.round(start)
            pts = np.clip(pts, 0, extent - 1).astype(np.int32)
            pts = np.unique(pts, axis=0)
            vertices.append(
                Vertex(index=index, name=name, buckets={"aims_ss": pts})
            )
            index += 1
    tal = TalairachTransform(
        rotation=np.eye(3),
        translation=rng.uniform(-2, 2, size=3),
        scale=None,
    )
    return SulcalGraph(voxel_size=voxel_size, vertices=vertices, talairach=tal)
