"""Data layer: graph -> point clouds -> dense voxel volumes -> device batches.

TPU-first rebuild of the reference's data path (ref dataset.py).  The key
departure from the reference: volumes are padded to *static shape buckets*
so every training step hits the same compiled executable (XLA traces once),
instead of the reference's per-sample dynamic ``max(bck2)+1`` sizes
(ref dataset.py:74-77) and its epoch-replaying size pre-scan
(ref training.py:120-136).
"""

from unetsulc_tpu.data.extract import extract_data  # noqa: F401
from unetsulc_tpu.data.dataset import SulciDataset, PatternDataset  # noqa: F401
from unetsulc_tpu.data.voxelize import voxelize  # noqa: F401
