"""Model layer: flax UNet3D + PyTorch checkpoint interop.

TPU-native rebuild of ``deepsulci.deeptools.models.UNet3D`` (external to the
reference repo; observable contract pinned in SURVEY.md §2.3 from
ref pattern_class.py:20,352-365 and ref training.py:65-74).
"""

from unetsulc_tpu.models.unet3d import UNet3D, make_unet  # noqa: F401
from unetsulc_tpu.models.torch_interop import (  # noqa: F401
    params_from_state_dict,
    state_dict_from_params,
)
