"""Typed configuration — the ``parameters.json`` public API.

Parses the exact schema the reference's CLI consumes (ref main.py:24-63,
README.md:26-57) into dataclasses, reproducing the layered defaulting of
``UnetPatternSulciLabelling.__init__`` (ref pattern_class.py:64-99) and
``fill_dict_model`` (ref pattern_class.py:141-175).  TPU-specific knobs live
in the optional ``tpu`` sub-dict and default sensibly, so a reference
``parameters.json`` is accepted verbatim.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence, Union

# Hardcoded BrainVISA container fallback paths for the pretrained human
# model (ref pattern_class.py:152-172).  Kept for drop-in compatibility;
# they simply won't exist outside the container.
_BV_SHARE = "/casa/host/build/share/brainvisa-share-5.1/models/models_2019/cnn_models"
_DEFAULT_PARAMS = {
    "L": f"{_BV_SHARE}/sulci_unet_model_params_left.json",
    "R": f"{_BV_SHARE}/sulci_unet_model_params_right.json",
}
_DEFAULT_MODELS = {
    "L": f"{_BV_SHARE}/sulci_unet_model_left.mdsm",
    "R": f"{_BV_SHARE}/sulci_unet_model_right.mdsm",
}


@dataclasses.dataclass
class ModelConfig:
    """``dict_model`` — architecture + transfer-freezing config.

    Field-by-field defaults mirror ref pattern_class.py:64-99 and
    transfer_learning/transfer_learning.py:58-77.
    """

    name: str = "UnknownModel"
    num_filter: int = 64            # init_channel_number
    num_channel: int = 1            # in_channels
    interpolate: bool = True
    final_sigmoid: bool = False
    conv_layer_order: str = "crg"
    num_conv: int = 1
    dropout: float = 0.0  # deepsulci UNet3D exposes it (ref training.py:66)
    training_layers: List[str] = dataclasses.field(
        default_factory=lambda: ["final_conv"]
    )
    fine_tunning_layers: List[str] = dataclasses.field(
        default_factory=lambda: ["decoders.2", "decoders.1", "decoders.0"]
    )

    @classmethod
    def from_dict(cls, d: dict, hemi: str = "L") -> "ModelConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        cfg = cls(**kwargs)
        if "name" not in d:
            cfg.name = "UnknownModel_hemi" + hemi  # ref pattern_class.py:70
        return cfg

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


@dataclasses.dataclass
class TrainedModelConfig:
    """``dict_trained_model`` — the pretrained checkpoint to transfer from.

    Auto-completion semantics of ``fill_dict_model``
    (ref pattern_class.py:141-175): ``out_channels`` given as a str is a
    path to a params.json whose ``sulci_side_list`` length is used; missing
    fields fall back to BrainVISA container defaults.
    """

    in_channels: int = 1
    out_channels: Optional[Union[int, str]] = None
    final_sigmoid: bool = False
    interpolate: bool = True
    conv_layer_order: str = "crg"
    init_channel_number: int = 64
    model_file: Optional[str] = None
    num_conv: int = 1

    @classmethod
    def from_dict(cls, d: dict, hemi: str = "L") -> "TrainedModelConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        cfg = cls(**{k: v for k, v in d.items() if k in known})
        if isinstance(cfg.out_channels, str):
            with open(cfg.out_channels, "r") as f:
                param = json.load(f)
            cfg.out_channels = len(param["sulci_side_list"])
        elif cfg.out_channels is None:
            path = _DEFAULT_PARAMS[hemi]
            if os.path.exists(path):
                with open(path, "r") as f:
                    cfg.out_channels = len(json.load(f)["sulci_side_list"])
        if cfg.model_file is None:
            cfg.model_file = _DEFAULT_MODELS[hemi]
        return cfg

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


@dataclasses.dataclass
class TpuConfig:
    """TPU-specific knobs (new; no reference counterpart)."""

    # compute dtype for conv/matmul ('bfloat16' or 'float32'); GroupNorm
    # statistics and params stay float32 either way.
    compute_dtype: str = "bfloat16"
    # data-parallel axis size; 0 = use all visible devices
    data_parallel: int = 0
    # spatial-parallel axis size for sharding the X axis of volumes
    spatial_parallel: int = 1
    # static shape bucketing for single-sample (batch 1) training; when
    # False, one fixed max size is used like the reference's batch>1 path.
    shape_buckets: bool = True
    # use Pallas fused GroupNorm kernel where profitable
    pallas_groupnorm: bool = True
    # run eligible batch-1 volumes through the fused conv+ReLU+GN Pallas
    # pipeline (models/unet3d.py pallas_blocks); composes with remat
    # (bit-exact, test_pallas_remat_grads_bit_exact); auto-disabled for
    # any ineligible input shape
    pallas_blocks: bool = True
    # allow the spatially-sharded Pallas steps on the CPU (interpret-mode)
    # backend.  Off by default: interpret mode emulates the kernels
    # op-by-op, which only tiny test volumes can afford — real CPU runs
    # with spatial_parallel > 1 keep the pjit auto-SPMD XLA path.  Tests
    # flip this to exercise the sp shard_map wiring on the virtual mesh.
    sp_pallas_cpu: bool = False
    # shard the pooled middle level (encoder 1 + decoder 1) over the space
    # axis too (models/unet3d.py sp_shard_middle; slab+E layout): lifts
    # sp's compute coverage from ~53% to ~80% of FLOPs while keeping every
    # collective pooled-size.  False = replicate everything past encoder
    # 1's pool (the round-4 layout).
    sp_shard_middle: bool = True
    # recurse the slab+E layout to level 2 too (encoder 2 + decoder 0;
    # models/unet3d.py sp_shard_deep): ~97% of step FLOPs on the sp axis,
    # only level 3 replicated.  Per-shape gated — buckets whose slab
    # cannot split twice keep the mid-only layout for that executable.
    sp_shard_deep: bool = True
    # run this many CV folds CONCURRENTLY, each on its own device group
    # (experiment/driver.py): jax.devices() is partitioned into
    # `fold_parallel` contiguous groups and fold i runs on group
    # i % fold_parallel in its own thread — the TPU-native mapping of the
    # reference's embarrassingly-parallel fold loop (ref main.py:131-145;
    # SURVEY.md §2.2c experiment parallelism).  Each fold's own
    # data/spatial parallelism (dp x sp <= group size) builds its mesh
    # from the group's devices.  1 = the reference's sequential loop.
    # transfer_learning always runs sequentially (loud fallback): its
    # fine-tuning unfreeze mutates training_layers ACROSS folds — a
    # deliberate reference-parity behavior (method/transfer.py
    # _post_epoch) that concurrent fresh-method folds would change.
    fold_parallel: int = 1
    # host->device prefetch depth
    prefetch: int = 2
    # threshold sweep votes on device (train/step.py make_vote_fn): only
    # the small ypred + per-part vote tables cross the link instead of
    # the full (n_voxels x classes) score matrix per volume.  False =
    # reference-shaped path (fetch scores, ops/cutting.py on host).
    device_vote: bool = True
    # reference parity: rebuild optimizer (reset momentum) on lr division
    reset_momentum_on_divide: bool = True
    # rematerialize U-Net blocks in backward (memory for FLOPs trade)
    remat: bool = False
    # orbax epoch snapshots every N epochs (0 = off)
    checkpoint_every: int = 0
    # resume: skip completed CV folds and restore mid-fold epoch snapshots
    resume: bool = False
    # write per-fold evaluation CSVs (evaluations/<model>/<model>_cvK/...)
    evaluate: bool = False
    # train-time rotation augmentation (reference always augments,
    # ref dataset.py:33-43; off is used for torch-parity experiments)
    augment: bool = True

    @classmethod
    def from_dict(cls, d: dict) -> "TpuConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclasses.dataclass
class Parameters:
    """Top-level parameters.json (ref main.py:33-63, README.md:26-57)."""

    working_path: str = "."
    learning: str = "training"       # 'transfer_learning' or anything else
    cuda: int = -1                   # kept for schema compat; ignored on TPU
    cohort_name: str = ""
    hemi: str = "L"
    batch_size: int = 1
    lr: float = 0.01
    momentum: float = 0.9
    n_cvinner: int = 3
    n_epochs: int = 2
    th_range: List[int] = dataclasses.field(default_factory=list)
    dict_model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    dict_trained_model: Optional[TrainedModelConfig] = None
    patience: Dict[str, int] = dataclasses.field(default_factory=dict)
    translation_file: Optional[str] = None
    tpu: TpuConfig = dataclasses.field(default_factory=TpuConfig)

    @classmethod
    def from_dict(cls, d: dict) -> "Parameters":
        hemi = d.get("hemi", "L")
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name not in d:
                continue
            v = d[f.name]
            if f.name == "dict_model":
                v = ModelConfig.from_dict(v, hemi)
            elif f.name == "dict_trained_model":
                v = TrainedModelConfig.from_dict(v, hemi)
            elif f.name == "tpu":
                v = TpuConfig.from_dict(v)
            kwargs[f.name] = v
        return cls(**kwargs)

    @classmethod
    def from_file(cls, path: str) -> "Parameters":
        with open(path, "r") as f:
            return cls.from_dict(json.load(f))

    def cohort_file(self) -> str:
        # ref main.py:71
        return f"cohort-{self.cohort_name}_hemi-{self.hemi}"
