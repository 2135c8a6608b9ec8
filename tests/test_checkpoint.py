"""Checkpoint/resume: orbax epoch snapshots + fold-level driver resume."""

import json
import os.path as op

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unetsulc_tpu.train.checkpoint import TrainCheckpointer
from unetsulc_tpu.train.step import TrainState


def _tiny_state(seed=0, lr=0.1):
    rng = np.random.default_rng(seed)
    params = {
        "final_conv": {
            "conv": {
                "kernel": jnp.asarray(
                    rng.normal(size=(1, 1, 1, 4, 3)).astype(np.float32)
                ),
                "bias": jnp.zeros(3),
            }
        }
    }
    return TrainState.create(params, lr=lr)


def test_checkpointer_roundtrip(tmp_path):
    state = _tiny_state()
    best = jax.tree.map(np.asarray, state.params)
    ck = TrainCheckpointer(str(tmp_path / "ck"), keep=2)
    ck.save(0, {"state": state, "best": best}, {"epoch": 0, "note": "a"})
    state2 = state.replace(lr=state.lr / 10, step=state.step + 5)
    ck.save(1, {"state": state2, "best": best}, {"epoch": 1, "note": "b"})

    assert ck.epochs() == [0, 1]
    epoch, tree, extra = ck.restore({"state": state, "best": best})
    assert epoch == 1 and extra["note"] == "b"
    assert float(tree["state"].lr) == pytest.approx(0.01)
    assert int(tree["state"].step) == 5
    for a, b in zip(
        jax.tree.leaves(tree["state"].trainable),
        jax.tree.leaves(state2.trainable),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpointer_retention(tmp_path):
    state = _tiny_state()
    ck = TrainCheckpointer(str(tmp_path / "ck"), keep=2)
    for e in range(5):
        ck.save(e, {"state": state}, {"epoch": e})
    assert ck.epochs() == [3, 4]


def test_fold_level_resume(cohort_dir, tmp_path):
    """Driver skips completed folds when tpu.resume is on."""
    import shutil

    from unetsulc_tpu.config import Parameters
    from unetsulc_tpu.experiment.driver import run_experiment

    wp = str(tmp_path / "wp")
    shutil.copytree(str(cohort_dir / "cohorts"), op.join(wp, "cohorts"))
    base = {
        "working_path": wp,
        "learning": "training",
        "cuda": -1,
        "cohort_name": "Synth6",
        "hemi": "L",
        "batch_size": 2,
        "lr": 0.05,
        "momentum": 0.9,
        "n_cvinner": 3,
        "n_epochs": 1,
        "th_range": [],
        "dict_model": {"name": "ResumeModel", "num_filter": 8},
        "tpu": {"compute_dtype": "float32", "prefetch": 0, "resume": True},
    }
    params = Parameters.from_dict(base)
    # simulate a prior run that completed 2 of 3 folds
    results = run_experiment(params)
    assert len(results["best_acc"]) == 3
    results_path = op.join(wp, "results", "ResumeModel_results.json")
    with open(results_path) as f:
        r = json.load(f)
    for key in ("lr", "best_acc", "epoch_loss_train"):
        r[key] = r[key][:2]
    with open(results_path, "w") as f:
        json.dump(r, f)

    results2 = run_experiment(Parameters.from_dict(base))
    # only the third fold re-ran; first two kept verbatim
    assert len(results2["best_acc"]) == 3
    assert results2["best_acc"][:2] == r["best_acc"][:2]


def test_epoch_level_resume(cohort_dir, tmp_path):
    """learning() restores mid-fold epoch snapshots and re-produces the
    same results as an uninterrupted run."""
    import shutil

    from unetsulc_tpu.config import Parameters, TpuConfig
    from unetsulc_tpu.method.training import TrainingSulciLabeller

    wp = str(tmp_path / "wp")
    shutil.copytree(str(cohort_dir / "cohorts"), op.join(wp, "cohorts"))
    with open(op.join(wp, "cohorts", "cohort-Synth6_hemi-L.json")) as f:
        graphs = [s["graph"] for s in json.load(f)["subjects"]]

    def make_method():
        m = TrainingSulciLabeller(
            graphs,
            "L",
            working_path=wp,
            dict_model={"name": "EpochResume", "num_filter": 8},
            tpu=TpuConfig(
                compute_dtype="float32",
                prefetch=0,
                checkpoint_every=1,
                resume=True,
            ),
        )
        m.extract_data_from_graphs()
        return m

    m1 = make_method()
    m1.learning(
        lr=0.05,
        momentum=0.9,
        num_epochs=2,
        gfile_list_train=graphs[:4],
        gfile_list_test=graphs[4:],
        batch_size=2,
    )
    full_curve = m1.results["epoch_loss_val"][0]
    assert len(full_curve) == 2

    # wipe epoch-1 snapshot so a "crashed-after-epoch-0" state remains
    import shutil as sh

    ckdir = op.join(wp, "checkpoints", "EpochResume", "cv0")
    sh.rmtree(op.join(ckdir, "epoch_00001"))

    m2 = make_method()
    m2.learning(
        lr=0.05,
        momentum=0.9,
        num_epochs=2,
        gfile_list_train=graphs[:4],
        gfile_list_test=graphs[4:],
        batch_size=2,
    )
    resumed_curve = m2.results["epoch_loss_val"][0]
    assert len(resumed_curve) == 2
    # epoch 0 came from the snapshot, epoch 1 recomputed deterministically
    np.testing.assert_allclose(resumed_curve, full_curve, rtol=1e-5)
