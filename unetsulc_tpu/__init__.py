"""unetsulc_tpu — a TPU-native (JAX/XLA/Pallas/pjit) sulci-labelling framework.

A ground-up rebuild of the capabilities of the reference research codebase
``neurospin-projects/2022_pauriau_unetsulc`` (3D U-Net cortical sulci
labelling with transfer learning, K-fold cross-validation and
cutting-threshold post-processing), re-designed for TPU hardware:

* model + train step are pure functions compiled once with ``jax.jit``/``pjit``
  over a ``jax.sharding.Mesh`` (data parallelism + optional spatial sharding);
* volumes are voxelized host-side into *static* shape buckets (XLA
  requirement) with background label ``-1`` masked out of the loss;
* the metric path is an on-device confusion-matrix accumulator instead of
  per-voxel Python lists;
* the public artifact surface of the reference is preserved:
  ``parameters.json`` in; ``data/*_data.json``, ``results/*_results.json``,
  ``models/*.mdsm`` (PyTorch state_dict zip format, read/written without
  torch) and ``models/*_params.json`` out.

Package map (reference counterparts cited in each module):

* :mod:`unetsulc_tpu.io`       — BrainVISA ``.arg`` graph I/O, label
  translation, Talairach transforms, ``.mdsm`` checkpoints (ref L0).
* :mod:`unetsulc_tpu.data`     — extraction, augmentation, voxelization,
  input pipeline (ref dataset.py).
* :mod:`unetsulc_tpu.models`   — flax UNet3D + torch checkpoint import
  (ref deepsulci.deeptools.models.UNet3D).
* :mod:`unetsulc_tpu.ops`      — ESI score, cutting, pallas kernels
  (ref deepsulci stats/cutting).
* :mod:`unetsulc_tpu.train`    — train step, optimizer, controllers
  (ref training.py, divide_lr.py, fine_tunning.py).
* :mod:`unetsulc_tpu.parallel` — mesh/sharding helpers (new; ref has none).
* :mod:`unetsulc_tpu.method`   — method-layer classes (ref pattern_class.py,
  training.py, transfer_learning/).
* :mod:`unetsulc_tpu.experiment` — CV driver, results, tensorboard
  (ref main.py).
* :mod:`unetsulc_tpu.tools` / :mod:`unetsulc_tpu.figures` — cohort tooling
  and analysis figures (ref tools/, create_figures/).
"""

__version__ = "0.1.0"

from unetsulc_tpu.config import Parameters  # noqa: F401


def __getattr__(name):
    """Lazy top-level API (keeps `import unetsulc_tpu` light)."""
    lazy = {
        "UNet3D": ("unetsulc_tpu.models.unet3d", "UNet3D"),
        "SulciDataset": ("unetsulc_tpu.data.dataset", "SulciDataset"),
        "PatternDataset": ("unetsulc_tpu.data.dataset", "PatternDataset"),
        "SulciLabeller": ("unetsulc_tpu.method.base", "SulciLabeller"),
        "TrainingSulciLabeller": (
            "unetsulc_tpu.method.training",
            "TrainingSulciLabeller",
        ),
        "TransferSulciLabeller": (
            "unetsulc_tpu.method.transfer",
            "TransferSulciLabeller",
        ),
        "run_experiment": ("unetsulc_tpu.experiment.driver", "run_experiment"),
        "read_graph": ("unetsulc_tpu.io.container", "read_graph"),
        "extract_data": ("unetsulc_tpu.data.extract", "extract_data"),
        "esi_score": ("unetsulc_tpu.ops.esi", "esi_score"),
        "cutting": ("unetsulc_tpu.ops.cutting", "cutting"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(name)
