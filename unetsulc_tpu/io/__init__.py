"""Native I/O layer: BrainVISA graph reading, label translation, checkpoints.

TPU-native replacement for the reference's L0 layer (``soma.aims`` +
``sigraph`` C++ bindings; see SURVEY.md §2.3): a pure-Python ``.arg`` parser
plus an ``.npz`` graph container used as the fast interchange format, and a
torch-free reader/writer for ``.mdsm`` (PyTorch state_dict) checkpoints.
"""

from unetsulc_tpu.io.graph import SulcalGraph, Vertex  # noqa: F401
from unetsulc_tpu.io.container import (  # noqa: F401
    read_graph,
    save_graph_npz,
    load_graph_npz,
)
from unetsulc_tpu.io.translation import FoldLabelsTranslator  # noqa: F401
