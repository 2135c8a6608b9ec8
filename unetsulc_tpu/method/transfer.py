"""Transfer-learning method (ref transfer_learning/transfer_learning.py:27-610).

Starts from a pretrained ``.mdsm`` checkpoint, swaps ``final_conv`` for the
new label set, trains only ``training_layers`` (default ``['final_conv']``),
and unfreezes ``fine_tunning_layers`` (default ``decoders.{2,1,0}``) with
lr/10 when the FineTunning plateau trigger fires — or unconditionally at
``epoch == int(0.8 * num_epochs)`` (ref :384-386).

TPU-native freezing: the trainable set is a *partition* of the parameter
pytree, so final_conv-only training backpropagates through nothing but the
head (XLA removes the dead backward graph), instead of the reference's
per-batch ``requires_grad`` toggling (ref :330-335).  The unfreeze
repartitions the state (one retrace) and restarts momentum at zero —
exactly what the reference's optimizer rebuild does (ref :392).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax

from unetsulc_tpu.method.training import TrainingSulciLabeller
from unetsulc_tpu.models.torch_interop import (
    params_from_state_dict,
    swap_final_conv,
)
from unetsulc_tpu.io.mdsm import read_state_dict
from unetsulc_tpu.train.controllers import FineTunning
from unetsulc_tpu.train.step import TrainState


class TransferSulciLabeller(TrainingSulciLabeller):
    def __init__(
        self,
        graphs,
        hemi,
        cuda: int = -1,
        working_path=None,
        dict_model=None,
        dict_trained_model=None,
        dict_names=None,
        dict_bck2=None,
        sulci_side_list=None,
        translation_file=None,
        tpu=None,
    ):
        super().__init__(
            graphs,
            hemi,
            cuda=cuda,
            working_path=working_path,
            dict_model=dict_model or {},
            dict_names=dict_names,
            dict_bck2=dict_bck2,
            sulci_side_list=sulci_side_list,
            translation_file=translation_file,
            tpu=tpu,
        )
        dict_model = dict_model or {}
        # freeze config (ref transfer_learning/transfer_learning.py:62-69)
        self.training_layers = list(
            dict_model.get("training_layers", ["final_conv"])
        )
        self.fine_tunning_layers = list(
            dict_model.get(
                "fine_tunning_layers", ["decoders.2", "decoders.1", "decoders.0"]
            )
        )
        self.dict_trained_model = dict(dict_trained_model or {})
        self.results = self._results_schema()

    @staticmethod
    def _results_schema() -> dict:
        # ref transfer_learning/transfer_learning.py:82-97 ('num_epoch',
        # 'fine_tunning_epoch' replace the training schema's fields)
        return {
            "lr": [],
            "momentum": [],
            "batch_size": [],
            "epoch_loss_val": [],
            "epoch_loss_train": [],
            "epoch_acc_val": [],
            "epoch_acc_train": [],
            "best_acc": [],
            "best_epoch": [],
            "num_epoch": [],
            "duration": [],
            "fine_tunning_epoch": [],
            "threshold_scores": {},
            "graphs_train": [],
            "graphs_test": [],
            "patience": {},
        }

    def _append_epoch_count(self, num_epochs: int) -> None:
        self.results["num_epoch"].append(num_epochs)

    # ------------------------------------------------------------------
    def load_model(self, rng_seed: int = 42) -> None:
        """Pretrained trunk + fresh head (ref :145-168; seed 42 mirrors the
        reference's ``torch.manual_seed(42)`` head init)."""
        print("Network initialization...")
        self.dict_trained_model = self.fill_dict_model(self.dict_trained_model)
        print("Model_file: ", self.dict_trained_model["model_file"])

        state = read_state_dict(self.dict_trained_model["model_file"])
        params = params_from_state_dict(state)
        init_ch = self.dict_trained_model["init_channel_number"]
        params = swap_final_conv(
            params,
            rng=rng_seed,
            init_channels=init_ch,
            out_channels=len(self.sulci_side_list),
            num_conv=self.num_conv,
        )
        self.params = params
        self.model_def = self._make_model(
            out_channels=len(self.sulci_side_list),
            in_channels=self.dict_trained_model["in_channels"],
            final_sigmoid=self.dict_trained_model["final_sigmoid"],
            interpolate=self.dict_trained_model["interpolate"],
            conv_layer_order=self.dict_trained_model["conv_layer_order"],
            init_channel_number=init_ch,
            num_conv=self.num_conv,
        )
        self._predict_fns = {}

    # hooks ------------------------------------------------------------
    def _training_layers(self) -> Optional[Sequence[str]]:
        return list(self.training_layers)

    def _prepare_model_and_state(self, lr: float) -> None:
        self.load_model()
        self._state = TrainState.create(
            self.params, lr=lr, training_layers=self._training_layers()
        )

    def _controllers(self, patience):
        ctrl = super()._controllers(patience)
        ctrl.pop("divide_lr", None)  # transfer uses fine_tunning instead
        if "fine_tunning" in patience:
            ctrl["fine_tunning"] = FineTunning(
                patience=patience["fine_tunning"], save=False
            )
        return ctrl

    def _post_epoch(
        self, ctrl, epoch, num_epochs, epoch_loss, state, save_results
    ):
        stop = False
        if "fine_tunning" in ctrl:
            ft = ctrl["fine_tunning"]
            ft(epoch_loss)
            if epoch == int(0.8 * num_epochs):  # forced unfreeze (ref :384)
                ft.ft_start = True
                ft.stop = True
            if ft.ft_start:
                print("\nFine tunning")
                # NOTE: mutating the instance list reproduces the
                # reference's cross-fold behavior exactly (ref :389 on a
                # method object reused across CV folds, main.py:131-137):
                # after the first fold fine-tunes, subsequent folds train
                # the decoder layers from epoch 0.
                self.training_layers += self.fine_tunning_layers
                state = state.repartition(self.training_layers).divide_lr(
                    10.0, reset_momentum=True
                )
                print(
                    "Divide learning rate. New value: {}\n".format(
                        float(state.lr)
                    )
                )
                if save_results:
                    self.results["fine_tunning_epoch"].append(epoch)
        if "early_stopping" in ctrl:
            ctrl["early_stopping"](epoch_loss)
            if ctrl["early_stopping"].early_stop:
                print("\nEarly stopping")
                stop = True
        return state, stop
