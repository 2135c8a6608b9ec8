"""End-to-end TRANSFER-learning parity: framework vs the torch reference
transfer loop on the same trunk ``.mdsm``, cohort, and hyperparameters.

VERDICT r2 missing #2 / next-round item 4: PARITY_TRAIN.md certified the
from-scratch loop only; the transfer loop (head swap, frozen-trunk
training, FineTunning unfreeze + lr/10 + momentum reset, forced at
``int(0.8 * num_epochs)``) had step-level freeze tests but no torch-oracle
run through the FULL loop.  This test drives both stacks end-to-end:

* trunk: a deterministic UNet3D(1, 7, init 8) checkpoint written to
  ``.mdsm`` — the transfer contract does not care whether the trunk was
  trained, only that both stacks start from the same weights;
* head swap: the framework's ``load_model()`` (seed-42 torch-style
  kaiming head init, models/torch_interop.swap_final_conv) runs first and
  its swapped params seed the torch oracle, so initial weights are
  identical by construction;
* torch side reproduces the reference transfer semantics exactly
  (ref transfer_learning/transfer_learning.py:330-394): per-batch
  ``requires_grad`` freeze by ``name.startswith(layer)``, CE on logits in
  train / eval-mode activated outputs in val, forced unfreeze at
  ``epoch == int(0.8 * num_epochs)`` with ``training_layers +=
  fine_tunning_layers``, lr/10, and a REBUILT optimizer (momentum reset);
* ``patience={'fine_tunning': 100}`` pins the unfreeze to the forced
  epoch in both stacks (the plateau trigger can't fire in 6 epochs).

Pass criteria mirror test_parity_train.py: near-exact parity through the
frozen-head epochs (the trunk is fixed, so trajectories stay numerically
coupled), continued loss tracking ACROSS the unfreeze boundary, and
aggregate accuracy agreement.  Measured curves for a longer run are in
PARITY_TRAIN.md §Transfer.
"""

import json
import os.path as op
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, op.dirname(__file__))
from torch_oracle import UNet3DOracle  # noqa: E402

import jax  # noqa: E402

from unetsulc_tpu.config import TpuConfig  # noqa: E402
from unetsulc_tpu.data.dataset import SulciDataset  # noqa: E402
from unetsulc_tpu.data.pipeline import choose_static_size  # noqa: E402
from unetsulc_tpu.io.mdsm import write_state_dict  # noqa: E402
from unetsulc_tpu.method.transfer import TransferSulciLabeller  # noqa: E402
from unetsulc_tpu.models.torch_interop import (  # noqa: E402
    state_dict_from_params,
)
from unetsulc_tpu.models.unet3d import UNet3D, init_params  # noqa: E402
from unetsulc_tpu.ops.esi import esi_score  # noqa: E402

LR = 0.05
MOMENTUM = 0.9
EPOCHS = 6  # forced unfreeze at int(0.8 * 6) = 4 -> 2 fine-tuning epochs
NUM_FILTER = 8
TRUNK_CLASSES = 7


def _torch_transfer_loop(
    state_dict, n_classes, train_ds, val_ds, sslist_ids, epochs,
    training_layers, fine_tunning_layers,
):
    """The reference transfer loop semantics on the torch oracle
    (ref transfer_learning/transfer_learning.py:304-394)."""
    model = UNet3DOracle(1, n_classes, init_channel_number=NUM_FILTER)
    model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in state_dict.items()}
    )
    lr = LR
    training_layers = list(training_layers)
    opt = torch.optim.SGD(model.parameters(), lr=lr, momentum=MOMENTUM)
    crit = torch.nn.CrossEntropyLoss(ignore_index=-1)

    curves = {
        "loss_train": [], "loss_val": [], "acc_train": [], "acc_val": [],
        "ft_epoch": [],
    }
    for epoch in range(epochs):
        for phase, ds in (("train", train_ds), ("val", val_ds)):
            model.train() if phase == "train" else model.eval()
            running, y_true, y_pred = 0.0, [], []
            for i in range(len(ds)):
                vol_in, vol_lb = ds[i]
                x = torch.from_numpy(vol_in).permute(3, 0, 1, 2)[None]
                y = torch.from_numpy(vol_lb.astype(np.int64))[None]
                opt.zero_grad()
                if phase == "train":
                    # the reference's per-batch requires_grad freeze
                    # (ref :330-335): trainable iff the torch name starts
                    # with any training layer
                    for name, p in model.named_parameters():
                        p.requires_grad = any(
                            name.startswith(layer)
                            for layer in training_layers
                        )
                    out = model(x)
                    loss = crit(out, y)
                    loss.backward()
                    opt.step()
                else:
                    with torch.no_grad():
                        out = model(x)  # eval mode -> activated
                        loss = crit(out, y)
                running += float(loss)
                preds = out.argmax(dim=1)
                mask = y != -1
                y_true.extend(y[mask].tolist())
                y_pred.extend(preds[mask].tolist())
            epoch_loss = running / len(ds)
            curves["loss_" + phase].append(epoch_loss)
            curves["acc_" + phase].append(
                1 - esi_score(y_true, y_pred, sslist_ids)
            )
        # forced fine-tuning unfreeze (ref :381-394); the plateau trigger
        # is pinned off via patience in this test
        if epoch == int(0.8 * epochs):
            training_layers += list(fine_tunning_layers)
            lr = lr / 10
            opt = torch.optim.SGD(
                model.parameters(), lr=lr, momentum=MOMENTUM
            )
            curves["ft_epoch"].append(epoch)
    return curves


def test_transfer_parity_vs_torch(cohort_dir, tmp_path):
    with open(
        op.join(str(cohort_dir), "cohorts", "cohort-Synth6_hemi-L.json")
    ) as f:
        graphs = [s["graph"] for s in json.load(f)["subjects"]]
    train_files, val_files = graphs[:4], graphs[4:]

    # deterministic trunk checkpoint (out_channels != cohort classes, so
    # the head swap is a real shape change)
    trunk = UNet3D(
        in_channels=1, out_channels=TRUNK_CLASSES,
        init_channel_number=NUM_FILTER,
    )
    trunk_params = init_params(trunk, jax.random.key(1), (1, 8, 8, 8, 1))
    mdsm = str(tmp_path / "trunk.mdsm")
    write_state_dict(
        state_dict_from_params(jax.tree.map(np.asarray, trunk_params)), mdsm
    )

    m = TransferSulciLabeller(
        graphs,
        "L",
        working_path=str(tmp_path),
        dict_model={"name": "TransferParity", "num_filter": NUM_FILTER},
        dict_trained_model={
            "model_file": mdsm,
            "out_channels": TRUNK_CLASSES,
            "init_channel_number": NUM_FILTER,
        },
        tpu=TpuConfig(
            compute_dtype="float32",
            prefetch=0,
            shape_buckets=False,
            augment=False,
        ),
    )
    m.extract_data_from_graphs()
    n_classes = len(m.sulci_side_list)
    sslist_ids = [m.dict_sulci[s] for s in m.sslist]

    # the seed-42 head swap is deterministic: load_model() here produces
    # exactly the params learning() will re-create, and they seed torch
    m.load_model()
    init_sd = state_dict_from_params(jax.tree.map(np.asarray, m.params))
    training_layers = list(m.training_layers)
    ft_layers = list(m.fine_tunning_layers)

    rc = m.learning(
        lr=LR,
        momentum=MOMENTUM,
        num_epochs=EPOCHS,
        gfile_list_train=train_files,
        gfile_list_test=val_files,
        batch_size=1,
        patience={"fine_tunning": 100},  # plateau off -> forced epoch only
        save_results=True,
    )
    assert rc == 0
    fw = {
        "loss_train": m.results["epoch_loss_train"][0],
        "loss_val": m.results["epoch_loss_val"][0],
        "acc_train": m.results["epoch_acc_train"][0],
        "acc_val": m.results["epoch_acc_val"][0],
    }
    # the forced unfreeze fired where the reference's would
    assert m.results["fine_tunning_epoch"] == [int(0.8 * EPOCHS)]

    def fixed_ds(files):
        ds = SulciDataset(
            files,
            m.dict_sulci,
            train=False,
            dict_bck2=m.dict_bck2,
            dict_names=m.dict_names,
        )
        ds.img_size = list(choose_static_size(ds))
        return ds

    tc = _torch_transfer_loop(
        init_sd, n_classes, fixed_ds(train_files), fixed_ds(val_files),
        sslist_ids, EPOCHS, training_layers, ft_layers,
    )
    assert tc["ft_epoch"] == [int(0.8 * EPOCHS)]

    print("\nframework:", {k: [round(v, 4) for v in c] for k, c in fw.items()})
    print("torch ref:", {k: [round(v, 4) for v in c] for k, c in tc.items()})

    ft = int(0.8 * EPOCHS)
    # (1) frozen-head epochs: the trunk is FIXED, so the two fp32
    # trajectories stay numerically coupled — near-exact parity
    for k in ("loss_train", "loss_val"):
        np.testing.assert_allclose(fw[k][:ft], tc[k][:ft], rtol=3e-3)
    for k in ("acc_train", "acc_val"):
        assert np.max(np.abs(np.subtract(fw[k][:ft], tc[k][:ft]))) <= 0.01, k

    # (2) ACROSS the unfreeze boundary (decoders train at lr/10 with fresh
    # momentum): losses keep tracking
    np.testing.assert_allclose(fw["loss_train"], tc["loss_train"], rtol=0.05)
    np.testing.assert_allclose(fw["loss_val"], tc["loss_val"], rtol=0.02)

    # (3) aggregate accuracy parity
    assert abs(np.mean(fw["acc_val"]) - np.mean(tc["acc_val"])) <= 0.08
