"""From-scratch training method (ref training.py:33-299, TPU-native).

``learning()`` keeps the reference's observable behavior — results schema,
tensorboard tags, best-weights-by-val-acc tracking, DivideLr/EarlyStopping
hooks, optimizer-rebuild-on-divide semantics — while the execution model is
TPU-first:

* ONE static volume shape per dataset (train: analytic rotation bound;
  val: exact max), bucketed so XLA executables are reused across folds.
  This replaces the reference's num_epochs-replay size pre-scan
  (ref training.py:120-136) with the same guarantee and zero extra passes.
* the per-batch hot loop is a single donated jit'd step (forward bf16,
  masked CE, backward, SGD+momentum, confusion counts) — no host sync
  except the scalar loss fetch used for the running average;
* epoch metrics come from the on-device confusion accumulator
  (exact ESI; SURVEY.md §3 hot loop #4);
* with ``tpu.data_parallel > 1`` batches are sharded over the mesh's
  ``data`` axis and XLA all-reduces the gradients over ICI.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from unetsulc_tpu.data.dataset import SulciDataset
from unetsulc_tpu.data.pipeline import (
    choose_static_size,
    device_iterator,
    iterate_batches,
)
from unetsulc_tpu.experiment.tensorboard import SummaryWriter
from unetsulc_tpu.method.base import SulciLabeller
from unetsulc_tpu.models.unet3d import init_params, make_apply_fn
from unetsulc_tpu.ops.esi import esi_from_counts
from unetsulc_tpu.train.controllers import DivideLr, EarlyStopping
from unetsulc_tpu.train.step import (
    TrainState,
    make_eval_step,
    make_train_step,
)

import os


@functools.lru_cache(maxsize=32)
def _cached_steps(model_def, num_classes: int, momentum: float,
                  dp: int = 1, spatial: int = 1, sp_cpu: bool = False,
                  devices=None):
    """One (train_step, eval_step, execution_path) triple per
    (model config, mesh shape, device group).

    ``devices`` (hashable tuple, default all visible) is the fold's
    device group under experiment parallelism (TpuConfig.fold_parallel,
    experiment/driver.py): the dp/sp mesh is built from it so concurrent
    folds' collectives never cross groups.

    ``execution_path`` is the statically-resolved routing record the
    method layer writes into the results JSON ``tpu`` key (VERDICT r3
    item 7), so post-hoc analysis can see which path a fold actually
    ran — in particular when a ``spatial_parallel`` request silently
    fell back to the pjit auto-SPMD XLA path.  ``kernels: "pallas"``
    means the fused pipeline is statically eligible; per-shape dynamic
    gates (min extent, interpret-mode size) are in
    models/unet3d.py::_pallas_eligible.

    flax modules are frozen (hashable) dataclasses, so this memoizes the
    jit wrappers across CV folds — without it every ``learning()`` call
    would rebuild the closures and recompile identical executables
    (the reference pays a fresh optimizer+model per fold instead,
    ref main.py:131-137).

    With ``dp > 1`` (and no spatial sharding) the steps are the explicit
    shard_map variants: each device applies the model to its LOCAL batch,
    so one volume per device stays on the batch-1 Pallas pipeline and
    gradients meet in one psum over ICI — the pjit auto-sharded step
    would trace the GLOBAL batch and fall back to the XLA path."""

    apply_fn = make_apply_fn(model_def)
    # batch>1 (global, or local under DP when batch_size > devices) would
    # silently fall off the batch-1 Pallas pipeline; scanning per-volume
    # forwards keeps the fused kernels with exact batch-mean loss
    # (train/step.py scan_batch).  Only worth it when the model would
    # actually take the pipeline per volume.
    # ... including the static half of the model's _pallas_eligible: f32
    # compute on real TPU hardware and unshardable channel widths keep the
    # XLA path per volume, so scanning the batch would serialize it for
    # nothing.
    scan_batch = bool(
        model_def.pallas_blocks
        and model_def.dropout == 0
        and model_def.interpolate
        and model_def.conv_layer_order == "crg"
        and (
            model_def.compute_dtype != jnp.float32
            or jax.default_backend() != "tpu"
        )
        and model_def._shard_widths_ok()
    )

    # The sp_axis model RAISES on ineligible configs rather than silently
    # falling back, so every static gate must hold before building the sp
    # step: pipeline eligibility (scan_batch above), a mesh size whose
    # slabs are valid for every bucketed extent (sp_static_shapes_ok),
    # and — off-TPU — the interpret-mode kernels only suit tiny test
    # volumes, so the sp Pallas path is opt-in there
    # (TpuConfig.sp_pallas_cpu).
    from unetsulc_tpu.parallel.sp_pallas import sp_static_shapes_ok

    sp_eligible = (
        scan_batch
        and sp_static_shapes_ok(spatial)
        and (jax.default_backend() == "tpu" or sp_cpu)
    )
    if spatial > 1 and not sp_eligible:
        # loud fallback (round-2 precedent: no silent path cliffs) — fires
        # once per model config thanks to the lru_cache
        print(
            f"spatial_parallel={spatial}: config ineligible for the "
            "spatially-sharded Pallas pipeline (needs bf16 'crg' "
            "interpolate dropout=0, shardable widths, space axis in "
            "{2,4,8}); using the pjit auto-SPMD XLA path"
        )

    path = {
        "step": (
            "sp_pallas_shard_map" if spatial > 1 and sp_eligible
            else "pjit_auto_spmd" if spatial > 1
            else "dp_shard_map" if dp > 1
            else "single_device"
        ),
        "kernels": "pallas" if (sp_eligible or scan_batch) else "xla",
        "data_parallel": dp,
        "spatial_parallel": spatial,
        "sp_fallback": bool(spatial > 1 and not sp_eligible),
    }

    if spatial > 1 and sp_eligible:
        # spatial sharding on the fused Pallas pipeline: the model clone
        # with sp_axis='space' runs halo-mode kernels on local slabs
        # inside shard_map (parallel/sp_pallas.py; VERDICT r2 item 2).
        # scan_batch here doubles as the pipeline-eligibility predicate —
        # ineligible configs (f32-on-TPU, dropout, interpolate=False)
        # keep the pjit auto-SPMD XLA path below.
        from unetsulc_tpu.parallel.mesh import make_mesh
        from unetsulc_tpu.train.step import (
            make_eval_step_sp,
            make_train_step_sp,
        )

        mesh = make_mesh(data=dp, space=spatial, devices=devices)
        sp_apply = make_apply_fn(model_def.clone(sp_axis="space"))
        return (
            make_train_step_sp(
                sp_apply, num_classes, mesh, momentum=momentum,
                scan_batch=True,
            ),
            make_eval_step_sp(
                sp_apply, num_classes, mesh,
                final_sigmoid=model_def.final_sigmoid, scan_batch=True,
            ),
            path,
        )

    if dp > 1 and spatial <= 1:
        from unetsulc_tpu.parallel.mesh import make_mesh
        from unetsulc_tpu.train.step import (
            make_eval_step_dp,
            make_train_step_dp,
        )

        mesh = make_mesh(data=dp, space=1, devices=devices)
        return (
            make_train_step_dp(
                apply_fn,
                num_classes,
                mesh,
                momentum=momentum,
                use_dropout=model_def.dropout > 0,
                scan_batch=scan_batch,
            ),
            make_eval_step_dp(
                apply_fn, num_classes, mesh,
                final_sigmoid=model_def.final_sigmoid,
                scan_batch=scan_batch,
            ),
            path,
        )

    return (
        make_train_step(
            apply_fn,
            num_classes,
            momentum=momentum,
            use_dropout=model_def.dropout > 0,
            scan_batch=scan_batch,
        ),
        make_eval_step(
            apply_fn, num_classes, final_sigmoid=model_def.final_sigmoid,
            scan_batch=scan_batch,
        ),
        path,
    )


class TrainingSulciLabeller(SulciLabeller):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.results = self._results_schema()

    @staticmethod
    def _results_schema() -> dict:
        # ref training.py:41-57
        return {
            "lr": [],
            "momentum": [],
            "batch_size": [],
            "num_epochs": [],
            "graphs_train": [],
            "graphs_test": [],
            "patience": {},
            "epoch_loss_val": [],
            "epoch_acc_val": [],
            "epoch_loss_train": [],
            "epoch_acc_train": [],
            "best_acc": [],
            "best_epoch": [],
            "divide_lr_epoch": [],
            "duration": [],
            "threshold_scores": {},
        }

    def reset_results(self) -> None:
        self.results = self._results_schema()

    # ------------------------------------------------------------------
    def load_network(self, rng_seed: int = 0) -> None:
        """Fresh UNet3D (ref training.py:60-74)."""
        print("Network initialization...")
        self.model_def = self._make_model(len(self.sulci_side_list))
        # minimal example shape for init; params are shape-independent
        self.params = init_params(
            self.model_def, jax.random.key(rng_seed), (1, 8, 8, 8, self.num_channel)
        )
        self._predict_fns = {}

    def _training_layers(self) -> Optional[Sequence[str]]:
        return None  # from-scratch: everything trainable

    # ------------------------------------------------------------------
    def _epoch_pass(
        self,
        phase: str,
        state: TrainState,
        step_fn,
        dataset,
        img_size,
        batch_size: int,
        epoch: int,
        sharding=None,
        alloc_batch=None,
    ):
        """One phase of one epoch. Returns (state, epoch_loss, counts, perf).

        Loss and confusion counts are accumulated ON DEVICE and fetched
        once at epoch end: a per-batch ``float(loss)`` host sync costs a
        full device round-trip (~27 ms through the axon tunnel,
        BASELINE.md) and would serialize dispatch against compute.  The
        epoch numbers are identical — the weighted loss sum is associative.
        """
        from unetsulc_tpu.utils.profiling import EpochTimer

        timer = EpochTimer()
        loss_terms = []  # device scalars; summed lazily, fetched once
        count_terms = []
        batches = iterate_batches(
            dataset, batch_size, img_size, epoch=epoch, alloc_batch=alloc_batch
        )
        for inputs, labels, real in device_iterator(
            batches, sharding=sharding, prefetch=self.tpu.prefetch
        ):
            if phase == "train":
                state, loss, c = step_fn(state, inputs, labels)
            else:
                loss, c = step_fn(state.params, inputs, labels)
            loss_terms.append(loss * real)
            count_terms.append(c)
            timer.add_batch(real * int(np.prod(inputs.shape[1:4])))
        running_loss = float(sum(loss_terms))
        counts = np.asarray(sum(count_terms), np.int64)
        epoch_loss = running_loss / len(dataset)
        return state, epoch_loss, counts, timer.finish()

    def _controllers(self, patience: Dict[str, int]):
        ctrl = {}
        if "early_stopping" in patience:
            ctrl["early_stopping"] = EarlyStopping(
                patience=patience["early_stopping"]
            )
        if "divide_lr" in patience:
            ctrl["divide_lr"] = DivideLr(patience=patience["divide_lr"])
        return ctrl

    # ------------------------------------------------------------------
    def learning(
        self,
        lr: float,
        momentum: float,
        num_epochs: int,
        gfile_list_train: Sequence[str],
        gfile_list_test: Sequence[str],
        batch_size: int = 1,
        patience: Optional[Dict[str, int]] = None,
        save_results: bool = True,
    ):
        patience = patience or {}
        if (
            self.sulci_side_list is None
            or self.dict_bck2 is None
            or self.dict_names is None
        ):
            print("Error : extract data from graphs before learning")
            return 1

        # # DATASETS (static shapes) # #
        # batch 1 + shape_buckets: per-sample bucketed shapes (the TPU
        # analogue of the reference's batch-1 dynamic sizes).  Under data
        # parallelism, same-bucket samples are GROUPED into sharded batches
        # so multi-chip keeps the ~6x bucketing win instead of falling back
        # to cohort-max volumes.  Single-chip batch>1 keeps the reference's
        # fixed-size path (and its recorded train/val_image_size).
        dp = max(1, self.tpu.data_parallel)
        per_sample = self.tpu.shape_buckets and (batch_size == 1 or dp > 1)
        # data-parallel batches must have their leading dim divisible by the
        # mesh's data axis; pad the allocation (padding = all-background
        # samples, exactly neutral in the masked loss/metrics)
        alloc_batch = -(-batch_size // dp) * dp if dp > 1 else None

        print("Extract validation dataloader...")
        valdataset = SulciDataset(
            gfile_list_test,
            self.dict_sulci,
            train=False,
            translation_file=self.trfile,
            dict_bck2=self.dict_bck2,
            dict_names=self.dict_names,
        )
        if per_sample:
            val_img_size = None
            print("Val dataset image size: per-sample buckets")
        else:
            val_img_size = choose_static_size(valdataset)
            valdataset.img_size = list(val_img_size)
            print("Val dataset image size:", list(val_img_size))

        print("Extract train dataloader...")
        traindataset = SulciDataset(
            gfile_list_train,
            self.dict_sulci,
            train=self.tpu.augment,
            translation_file=self.trfile,
            dict_bck2=self.dict_bck2,
            dict_names=self.dict_names,
            seed=42,  # the reference's fixed augmentation seed discipline
        )
        if per_sample:
            train_img_size = None
            print("Train dataset image size: per-sample buckets")
        else:
            train_img_size = choose_static_size(
                traindataset, num_epochs=num_epochs
            )
            traindataset.img_size = list(train_img_size)
            print("Train dataset image size:", list(train_img_size))

        # # MODEL + STATE # #
        self._prepare_model_and_state(lr)
        num_classes = len(self.sulci_side_list)
        train_step, eval_step, exec_path = _cached_steps(
            self.model_def, num_classes, momentum,
            dp=dp, spatial=self.tpu.spatial_parallel,
            sp_cpu=self.tpu.sp_pallas_cpu,
            devices=self.devices,
        )
        state = self._state

        sharding = None
        if dp > 1 or self.tpu.spatial_parallel > 1:
            from unetsulc_tpu.parallel.mesh import (
                batch_sharding,
                make_mesh,
                replicate,
            )

            mesh = make_mesh(
                data=dp, space=self.tpu.spatial_parallel,
                devices=self.devices,
            )
            sharding = batch_sharding(mesh)
            # params/opt state replicated across the mesh; XLA then lowers
            # the grad reduction to one all-reduce over ICI per step
            state = jax.device_put(state, replicate(mesh))

        # # RESULTS / TENSORBOARD # #
        writer = None
        num_training = len(self.results["lr"])
        if save_results:
            self.results["lr"].append(lr)
            self.results["momentum"].append(momentum)
            self.results["batch_size"].append(batch_size)
            self._append_epoch_count(num_epochs)
            self.results["graphs_test"].append(list(gfile_list_test))
            self.results["graphs_train"].append(list(gfile_list_train))
            self.results["patience"] = patience
            # resolved execution-path record, one per training (VERDICT r3
            # item 7): which step/kernel path this fold actually ran,
            # including silent spatial_parallel -> XLA fallbacks
            self.results.setdefault("tpu", []).append(dict(exec_path))
            if batch_size > 1 and train_img_size is not None:
                # ref training.py:152-158 records the fixed sizes
                if num_training == 0:
                    self.results["train_image_size"] = [
                        int(i) for i in train_img_size
                    ]
                    self.results["val_image_size"] = [
                        int(i) for i in val_img_size
                    ]
                else:
                    self.results["train_image_size"].append(
                        [int(i) for i in train_img_size]
                    )
                    self.results["val_image_size"].append(
                        [int(i) for i in val_img_size]
                    )
            log_dir = os.path.join(
                self.working_path, "tensorboard", self.model_name
            )
            os.makedirs(log_dir, exist_ok=True)
            # under fold_parallel each fold runs in a FRESH method whose
            # results start empty (num_training == 0); cv_index_offset
            # restores the fold's true index for on-disk names
            writer = SummaryWriter(
                log_dir=os.path.join(
                    log_dir, "cv" + str(self.cv_index_offset + num_training)
                )
            )

        ctrl = self._controllers(patience)

        # # TRAINING # #
        print("training...")
        since = time.time()
        best_params = jax.tree.map(np.asarray, state.params)
        best_acc, best_epoch = 0.0, 0
        sslist_ids = [self.dict_sulci[ss] for ss in self.sslist]
        epoch_loss = 0.0

        # epoch-level checkpointing / resume (no reference counterpart;
        # SURVEY.md §5 plan)
        ckptr = None
        start_epoch = 0
        curve_keys = [
            f"epoch_{m}_{p}" for m in ("loss", "acc") for p in ("train", "val")
        ]
        if self.tpu.checkpoint_every > 0:
            from unetsulc_tpu.train.checkpoint import TrainCheckpointer

            ckptr = TrainCheckpointer(
                os.path.join(
                    self.working_path,
                    "checkpoints",
                    self.model_name,
                    f"cv{self.cv_index_offset + num_training}",
                )
            )
            if self.tpu.resume and ckptr.latest() is not None:
                _, tree, extra = ckptr.restore(
                    {"state": state, "best": best_params}
                )
                state = tree["state"]
                best_params = jax.tree.map(np.asarray, tree["best"])
                start_epoch = extra["epoch"] + 1
                best_acc = extra["best_acc"]
                best_epoch = extra["best_epoch"]
                for k, cstate in extra.get("controllers", {}).items():
                    if k in ctrl:
                        ctrl[k].__dict__.update(cstate)
                if save_results:
                    for key in curve_keys:
                        fold_curve = extra["fold_results"].get(key, [])
                        if len(self.results[key]) <= num_training:
                            self.results[key].append(list(fold_curve))
                        else:
                            self.results[key][num_training] = list(fold_curve)
                    for key in ("divide_lr_epoch", "fine_tunning_epoch"):
                        if key in extra and key in self.results:
                            self.results[key] = extra[key]
                print(f"Resumed from checkpoint at epoch {start_epoch - 1}")

        stop = False
        for epoch in range(start_epoch, num_epochs):
            print("Epoch {}/{}".format(epoch, num_epochs - 1))
            print("-" * 10)
            start_time = time.time()

            for phase in ["train", "val"]:
                step_fn = train_step if phase == "train" else eval_step
                dataset = traindataset if phase == "train" else valdataset
                img_size = (
                    train_img_size if phase == "train" else val_img_size
                )
                state, epoch_loss, counts, perf = self._epoch_pass(
                    phase,
                    state,
                    step_fn,
                    dataset,
                    img_size,
                    batch_size,
                    epoch,
                    sharding,
                    alloc_batch,
                )
                epoch_acc = 1 - esi_from_counts(counts, sslist_ids)
                print(
                    "{} Loss: {:.4f} Acc: {:.4f} ({:,.0f} voxels/s)".format(
                        phase, epoch_loss, epoch_acc, perf["voxels_per_sec"]
                    )
                )
                if save_results:
                    self.results.setdefault(
                        "voxels_per_sec_" + phase, []
                    ).append(perf["voxels_per_sec"])

                if save_results:
                    writer.add_scalar("Loss/" + phase, epoch_loss, epoch)
                    writer.add_scalar("Accuracy/" + phase, epoch_acc, epoch)
                    # first epoch of this fold opens a new per-fold list
                    # (handles resume: restored lists are appended to)
                    for key, val in (
                        ("epoch_loss_" + phase, epoch_loss),
                        ("epoch_acc_" + phase, epoch_acc),
                    ):
                        if len(self.results[key]) <= num_training:
                            self.results[key].append([val])
                        else:
                            self.results[key][num_training].append(val)

                if phase == "val" and epoch_acc > best_acc:
                    best_acc = epoch_acc
                    best_epoch = epoch
                    best_params = jax.tree.map(np.asarray, state.params)

            # controllers run on the val loss (the reference's epoch_loss
            # variable holds the val phase's value here)
            state, stop = self._post_epoch(
                ctrl, epoch, num_epochs, epoch_loss, state, save_results
            )
            if ckptr is not None and (epoch + 1) % self.tpu.checkpoint_every == 0:
                extra = {
                    "epoch": epoch,
                    "best_acc": float(best_acc),
                    "best_epoch": int(best_epoch),
                    "controllers": {
                        k: {
                            kk: vv
                            for kk, vv in c.__dict__.items()
                            if isinstance(vv, (int, float, bool, type(None)))
                        }
                        for k, c in ctrl.items()
                    },
                    "fold_results": {
                        key: self.results[key][num_training]
                        for key in curve_keys
                        if save_results and len(self.results[key]) > num_training
                    },
                }
                for key in ("divide_lr_epoch", "fine_tunning_epoch"):
                    if key in self.results:
                        extra[key] = self.results[key]
                ckptr.save(epoch, {"state": state, "best": best_params}, extra)
            print("Epoch took %i s." % (time.time() - start_time))
            print("\n")
            if stop:
                break

        time_elapsed = time.time() - since
        print(
            "Training complete in {:.0f}m {:.0f}s".format(
                time_elapsed // 60, time_elapsed % 60
            )
        )
        print("Best val Acc: {:4f}, Epoch {}".format(best_acc, best_epoch))

        if save_results:
            self.results["best_acc"].append(best_acc)
            self.results["best_epoch"].append(best_epoch)
            self.results["duration"].append(time_elapsed)
            writer.close()

        # load best model weights (ref training.py:276)
        self.params = best_params
        self._state = None
        return 0

    # hooks overridden by the transfer subclass -------------------------
    def _append_epoch_count(self, num_epochs: int) -> None:
        self.results["num_epochs"].append(num_epochs)

    def _prepare_model_and_state(self, lr: float) -> None:
        self.load_network()
        self._state = TrainState.create(
            self.params, lr=lr, training_layers=self._training_layers()
        )

    def _post_epoch(
        self, ctrl, epoch, num_epochs, epoch_loss, state, save_results
    ):
        stop = False
        if "divide_lr" in ctrl:
            ctrl["divide_lr"](epoch_loss)
            if ctrl["divide_lr"].divide_lr:
                state = state.divide_lr(
                    10.0,
                    reset_momentum=self.tpu.reset_momentum_on_divide,
                )
                print(
                    "\tDivide learning rate. New value: {}".format(
                        float(state.lr)
                    )
                )
                self.results["divide_lr_epoch"].append(epoch)
        if "early_stopping" in ctrl:
            ctrl["early_stopping"](epoch_loss)
            if ctrl["early_stopping"].early_stop:
                print("Early stopping")
                stop = True
        return state, stop
