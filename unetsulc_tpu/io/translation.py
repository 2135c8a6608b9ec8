"""Fold label translation — native equivalent of ``sigraph.FoldLabelsTranslator``.

The reference uses the C++ translator in exactly three calls
(ref dataset.py:53-55, transfer_learning/transfer_learning.py:102-104):

    flt = sigraph.FoldLabelsTranslator()
    flt.readLabels(translation_file)
    flt.translate(graph)          # renames vertex 'name' attrs in place

The translation file is a whitespace-separated two-column text file mapping
source label -> target label (one pair per line, ``#`` comments allowed).
Labels absent from the table are left unchanged by default; pass
``default='unknown'`` to map unlisted labels to ``unknown`` instead
(both behaviors exist in BrainVISA depending on configuration — the default
here is the conservative pass-through).
"""

from __future__ import annotations

from typing import Dict, Optional

from unetsulc_tpu.io.graph import SulcalGraph


class FoldLabelsTranslator:
    def __init__(self, default: Optional[str] = None):
        self.table: Dict[str, str] = {}
        self.default = default

    def readLabels(self, translation_file: str) -> None:  # noqa: N802
        """Load the two-column translation table (API name kept verbatim)."""
        table = {}
        with open(translation_file, "r") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                if len(parts) >= 2:
                    table[parts[0]] = parts[1]
        self.table = table

    read_labels = readLabels

    def translate(self, graph: SulcalGraph) -> None:
        """Rename vertex labels in place."""
        for v in graph.vertices():
            if v.name is None:
                continue
            if v.name in self.table:
                v.name = self.table[v.name]
            elif self.default is not None:
                v.name = self.default
