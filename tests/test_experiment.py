"""End-to-end: full CV experiment on a synthetic cohort + artifact schemas.

SURVEY.md §7 minimum end-to-end slice: cohort of >=3 graphs -> extract ->
voxelize -> from-scratch UNet3D (shrunk) -> 3-fold CV, 2 epochs ->
_results.json / _model.mdsm / _params.json with correct schemas ->
labeling() returns ytrue/ypred/yscores.
"""

import json
import os.path as op

import numpy as np
import pytest

from unetsulc_tpu.config import Parameters
from unetsulc_tpu.experiment.driver import run_experiment, threshold_vote


@pytest.fixture(scope="module")
def experiment_results(cohort_dir):
    params = Parameters.from_dict(
        {
            "working_path": str(cohort_dir),
            "learning": "training",
            "cuda": -1,
            "cohort_name": "Synth6",
            "hemi": "L",
            "batch_size": 2,
            "lr": 0.05,
            "momentum": 0.9,
            "n_cvinner": 3,
            "n_epochs": 2,
            "th_range": [10, 50],
            "dict_model": {"name": "SmokeModel", "num_filter": 8},
            "patience": {},
            "tpu": {"compute_dtype": "float32", "prefetch": 0},
        }
    )
    results = run_experiment(params)
    return params, results


def test_results_schema(experiment_results):
    params, results = experiment_results
    # ref training.py:41-57 schema
    for key in [
        "lr",
        "momentum",
        "batch_size",
        "num_epochs",
        "graphs_train",
        "graphs_test",
        "patience",
        "epoch_loss_val",
        "epoch_acc_val",
        "epoch_loss_train",
        "epoch_acc_train",
        "best_acc",
        "best_epoch",
        "divide_lr_epoch",
        "duration",
        "threshold_scores",
    ]:
        assert key in results, key
    assert results["lr"] == [0.05] * 3
    assert results["num_epochs"] == [2] * 3
    assert len(results["epoch_loss_train"]) == 3
    assert all(len(e) == 2 for e in results["epoch_loss_train"])
    assert len(results["best_acc"]) == 3
    # threshold scores: one list per fold per threshold
    assert set(results["threshold_scores"].keys()) == {"10", "50"} or set(
        results["threshold_scores"].keys()
    ) == {10, 50}
    for sc in results["threshold_scores"].values():
        assert len(sc) == 3
    # execution-path record, one per fold (VERDICT r3 item 7)
    assert len(results["tpu"]) == 3
    for rec in results["tpu"]:
        assert rec["step"] == "single_device"
        assert rec["kernels"] in ("pallas", "xla")
        assert rec["sp_fallback"] is False


def test_artifacts_on_disk(experiment_results):
    params, _ = experiment_results
    wp = params.working_path
    # data cache (ref pattern_class.py:281-293)
    data_path = op.join(wp, "data", "cohort-Synth6_hemi-L_data.json")
    with open(data_path) as f:
        data = json.load(f)
    assert set(data) == {"dict_bck2", "dict_names", "sulci_side_list"}
    assert len(data["sulci_side_list"]) >= 3
    # per-fold models (ref main.py:145)
    for cvi in range(3):
        assert op.exists(
            op.join(
                wp, "models", "SmokeModel", f"SmokeModel_cv{cvi}_model.mdsm"
            )
        )
        assert op.exists(
            op.join(
                wp, "models", "SmokeModel", f"SmokeModel_cv{cvi}_params.json"
            )
        )
    # global params with the voted threshold (ref main.py:184)
    with open(op.join(wp, "models", "SmokeModel", "SmokeModel_params.json")) as f:
        gparams = json.load(f)
    assert "cutting_threshold" in gparams
    assert gparams["dict_model"]["out_channels"] == len(
        data["sulci_side_list"]
    )
    # results file
    assert op.exists(op.join(wp, "results", "SmokeModel_results.json"))
    # tensorboard event files per fold (ref training.py:160-162)
    for cvi in range(3):
        d = op.join(wp, "tensorboard", "SmokeModel", f"cv{cvi}")
        assert op.exists(d)


def test_tensorboard_readable(experiment_results):
    """Event files parse with the real tensorboard reader."""
    tb = pytest.importorskip("tensorboard.backend.event_processing.event_accumulator")
    params, _ = experiment_results
    d = op.join(params.working_path, "tensorboard", "SmokeModel", "cv0")
    acc = tb.EventAccumulator(d)
    acc.Reload()
    tags = acc.Tags()["scalars"]
    assert set(tags) == {
        "Loss/train",
        "Loss/val",
        "Accuracy/train",
        "Accuracy/val",
    }
    vals = acc.Scalars("Loss/train")
    assert len(vals) == 2 and vals[0].step == 0


def test_model_reload_and_label(experiment_results, cohort_dir):
    """load_saved_model + labeling on a saved fold model."""
    params, _ = experiment_results
    from unetsulc_tpu.method.training import TrainingSulciLabeller

    wp = params.working_path
    with open(op.join(wp, "data", "cohort-Synth6_hemi-L_data.json")) as f:
        data = json.load(f)
    with open(
        op.join(wp, "models", "SmokeModel", "SmokeModel_cv0_params.json")
    ) as f:
        saved = json.load(f)

    method = TrainingSulciLabeller(
        [],
        "L",
        working_path=wp,
        dict_model={"name": "SmokeModel", "num_filter": 8},
        dict_names=data["dict_names"],
        dict_bck2=data["dict_bck2"],
        sulci_side_list=data["sulci_side_list"],
    )
    method.tpu.compute_dtype = "float32"
    method.load_saved_model(
        {
            "model_file": saved["dict_model"]["model_file"],
            "out_channels": len(data["sulci_side_list"]),
            "init_channel_number": 8,
        }
    )
    gfile = sorted(data["dict_bck2"].keys())[0]
    ytrue, ypred, yscores = method.labeling(gfile)
    n = len(data["dict_bck2"][gfile])
    assert len(ytrue) == len(ypred) == n
    assert yscores.shape == (n, len(data["sulci_side_list"]))
    # ytrue matches the stored names mapping
    names = data["dict_names"][gfile]
    dict_sulci = {s: i for i, s in enumerate(data["sulci_side_list"])}
    # later-scatter-wins at duplicate coords; check a majority agreement
    expected = np.array([dict_sulci[nm] for nm in names])
    agree = float(np.mean(np.asarray(ytrue) == expected))
    assert agree > 0.9


def test_threshold_vote_semantics():
    results = {
        "threshold_scores": {
            10: [[50.0, 60.0], [70.0], [10.0]],
            50: [[55.0, 55.0], [70.0], [20.0]],
        }
    }
    per_fold, best = threshold_vote(results)
    assert per_fold[0] in (10, 50)  # mean 55 vs 55 -> tie
    assert per_fold[1] in (10, 50)  # exact tie
    assert per_fold[2] == 50
    # flattened tie lists: [10, 50, 10, 50, 50] -> majority 50
    assert best == 50


def test_evaluate_option_writes_csvs(cohort_dir, tmp_path):
    """tpu.evaluate=true emits per-fold evaluation CSVs from the driver."""
    import shutil

    from unetsulc_tpu.config import Parameters
    from unetsulc_tpu.experiment.driver import run_experiment

    wp = str(tmp_path / "wp")
    shutil.copytree(str(cohort_dir / "cohorts"), op.join(wp, "cohorts"))
    params = Parameters.from_dict(
        {
            "working_path": wp,
            "cohort_name": "Synth6",
            "hemi": "L",
            "batch_size": 2,
            "lr": 0.05,
            "momentum": 0.9,
            "n_cvinner": 2,
            "n_epochs": 1,
            "th_range": [],
            "dict_model": {"name": "EvalDriver", "num_filter": 8},
            "tpu": {"compute_dtype": "float32", "prefetch": 0, "evaluate": True},
        }
    )
    run_experiment(params)
    import pandas as pd

    for cvi in range(2):
        csv = op.join(
            wp,
            "evaluations",
            "EvalDriver",
            f"EvalDriver_cv{cvi}",
            "cohort-Synth6_hemi-L.csv",
        )
        assert op.exists(csv)
        df = pd.read_csv(csv)
        assert "ESI" in df.columns and len(df) == 3


def test_fold_parallel_matches_sequential(cohort_dir, tmp_path):
    """tpu.fold_parallel=2 runs the CV folds concurrently on 4+4 device
    groups (SURVEY.md §2.2c experiment parallelism; VERDICT r4 item 6) and
    reproduces the sequential driver's results EXACTLY — folds are
    numerically independent by construction (fixed per-fold init seed,
    replayable augmentation RNG; ref main.py:131-145 is the same
    embarrassingly-parallel loop run serially)."""
    import shutil

    from unetsulc_tpu.config import Parameters
    from unetsulc_tpu.experiment.driver import run_experiment

    def run(wp, fold_parallel):
        shutil.copytree(str(cohort_dir / "cohorts"), op.join(wp, "cohorts"))
        params = Parameters.from_dict(
            {
                "working_path": wp,
                "cohort_name": "Synth6",
                "hemi": "L",
                "batch_size": 2,
                "lr": 0.05,
                "momentum": 0.9,
                "n_cvinner": 2,
                "n_epochs": 2,
                "th_range": [10, 50],
                "dict_model": {"name": "FoldPar", "num_filter": 8},
                "tpu": {
                    "compute_dtype": "float32",
                    "prefetch": 0,
                    "fold_parallel": fold_parallel,
                },
            }
        )
        return run_experiment(params)

    seq = run(str(tmp_path / "seq"), 1)
    par = run(str(tmp_path / "par"), 2)

    # group layout recorded in the results JSON
    layout = par.pop("fold_parallel")
    assert layout["n_groups"] == 2 and len(layout["groups"]) == 2
    assert layout["folds"] == {"0": 0, "1": 1}

    # wall-time keys differ by construction; everything else is exact
    timing = {"duration", "voxels_per_sec_train", "voxels_per_sec_val"}
    assert set(seq) - timing == set(par) - timing
    for key in set(seq) - timing:
        assert seq[key] == par[key], key

    # per-fold artifacts land under the fold's true index
    for cvi in range(2):
        assert op.exists(
            op.join(
                str(tmp_path / "par"), "models", "FoldPar",
                f"FoldPar_cv{cvi}_model.mdsm",
            )
        )
        assert op.exists(
            op.join(
                str(tmp_path / "par"), "tensorboard", "FoldPar", f"cv{cvi}"
            )
        )

    # saved fold models carry identical weights across the two drivers
    # (the .mdsm zip container embeds timestamps, so compare tensors,
    # not bytes)
    from unetsulc_tpu.io.mdsm import read_state_dict

    for cvi in range(2):
        a = read_state_dict(
            op.join(str(tmp_path / "seq"), "models", "FoldPar",
                    f"FoldPar_cv{cvi}_model.mdsm"))
        b = read_state_dict(
            op.join(str(tmp_path / "par"), "models", "FoldPar",
                    f"FoldPar_cv{cvi}_model.mdsm"))
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k
            )


def test_run_both_hemispheres(cohort_dir, tmp_path):
    import shutil

    from unetsulc_tpu.config import Parameters
    from unetsulc_tpu.experiment.driver import run_both_hemispheres

    wp = str(tmp_path / "wp")
    shutil.copytree(str(cohort_dir / "cohorts"), op.join(wp, "cohorts"))
    # mirror the L cohort as R for the test
    shutil.copy(
        op.join(wp, "cohorts", "cohort-Synth6_hemi-L.json"),
        op.join(wp, "cohorts", "cohort-Synth6_hemi-R.json"),
    )
    params = Parameters.from_dict(
        {
            "working_path": wp,
            "cohort_name": "Synth6",
            "hemi": "L",
            "batch_size": 2,
            "lr": 0.05,
            "momentum": 0.9,
            "n_cvinner": 2,
            "n_epochs": 1,
            "th_range": [],
            "dict_model": {"name": "BothH", "num_filter": 8},
            "tpu": {"compute_dtype": "float32", "prefetch": 0},
        }
    )
    results = run_both_hemispheres(params)
    assert set(results) == {"L", "R"}
    for hemi in ("L", "R"):
        assert op.exists(
            op.join(wp, "results", f"BothH_hemi{hemi}_results.json")
        )


def test_transfer_learning_experiment(experiment_results, cohort_dir, tmp_path):
    """Full transfer-learning CV (pretrained .mdsm -> head swap -> fine
    tuning) through run_experiment, starting from the SmokeModel fold-0
    checkpoint (multi-conv head variant: num_conv=2)."""
    import shutil

    params, _ = experiment_results
    wp_src = params.working_path
    wp = str(tmp_path / "wp")
    shutil.copytree(op.join(wp_src, "cohorts"), op.join(wp, "cohorts"))

    tparams = Parameters.from_dict(
        {
            "working_path": wp,
            "learning": "transfer_learning",
            "cohort_name": "Synth6",
            "hemi": "L",
            "batch_size": 2,
            "lr": 0.05,
            "momentum": 0.9,
            "n_cvinner": 2,
            "n_epochs": 2,
            "th_range": [10],
            "dict_model": {
                "name": "TransferSmoke",
                "num_filter": 8,
                "training_layers": ["final_conv"],
                "fine_tunning_layers": ["decoders.2"],
                "num_conv": 2,
            },
            "dict_trained_model": {
                "model_file": op.join(
                    wp_src, "models", "SmokeModel", "SmokeModel_cv0_model.mdsm"
                ),
                "out_channels": op.join(
                    wp_src, "models", "SmokeModel", "SmokeModel_cv0_params.json"
                ),
                "init_channel_number": 8,
            },
            "patience": {"fine_tunning": 1},
            "tpu": {"compute_dtype": "float32", "prefetch": 0},
        }
    )
    results = run_experiment(tparams)
    # transfer schema (ref transfer_learning.py:82-97)
    assert "num_epoch" in results and results["num_epoch"] == [2, 2]
    assert "fine_tunning_epoch" in results
    # forced unfreeze at int(0.8*2)=1 -> at least one trigger per fold
    assert len(results["fine_tunning_epoch"]) >= 1
    assert len(results["best_acc"]) == 2
    assert op.exists(
        op.join(wp, "models", "TransferSmoke", "TransferSmoke_cv0_model.mdsm")
    )


def test_fold_parallel_transfer_falls_back_sequential(
    experiment_results, cohort_dir, tmp_path, capsys
):
    """Transfer folds carry state ACROSS folds by reference semantics
    (the fine-tuning unfreeze extends the method's training_layers, so
    folds after the first train the decoder layers from epoch 0 —
    method/transfer.py _post_epoch, ref transfer_learning.py:389).
    fold_parallel therefore falls back to the sequential loop for
    transfer_learning, loudly, and reproduces it exactly."""
    import shutil

    params, _ = experiment_results
    wp_src = params.working_path

    def run(wp, fold_parallel):
        shutil.copytree(op.join(wp_src, "cohorts"), op.join(wp, "cohorts"))
        tparams = Parameters.from_dict(
            {
                "working_path": wp,
                "learning": "transfer_learning",
                "cohort_name": "Synth6",
                "hemi": "L",
                "batch_size": 2,
                "lr": 0.05,
                "momentum": 0.9,
                "n_cvinner": 2,
                "n_epochs": 2,
                "th_range": [10],
                "dict_model": {
                    "name": "TransferFoldPar",
                    "num_filter": 8,
                    "training_layers": ["final_conv"],
                    "fine_tunning_layers": ["decoders.2"],
                },
                "dict_trained_model": {
                    "model_file": op.join(
                        wp_src, "models", "SmokeModel",
                        "SmokeModel_cv0_model.mdsm",
                    ),
                    "out_channels": op.join(
                        wp_src, "models", "SmokeModel",
                        "SmokeModel_cv0_params.json",
                    ),
                    "init_channel_number": 8,
                },
                "patience": {"fine_tunning": 1},
                "tpu": {
                    "compute_dtype": "float32",
                    "prefetch": 0,
                    "fold_parallel": fold_parallel,
                },
            }
        )
        return run_experiment(tparams)

    seq = run(str(tmp_path / "seq"), 1)
    par = run(str(tmp_path / "par"), 2)
    out = capsys.readouterr().out
    assert "running folds sequentially" in out
    # sequential fallback: no group layout recorded, results exact
    assert "fold_parallel" not in par
    timing = {"duration", "voxels_per_sec_train", "voxels_per_sec_val"}
    assert set(seq) - timing == set(par) - timing
    for key in set(seq) - timing:
        assert seq[key] == par[key], key


def test_missing_cohort_error(tmp_path):
    params = Parameters.from_dict(
        {"working_path": str(tmp_path), "cohort_name": "Nope", "hemi": "L"}
    )
    with pytest.raises(FileNotFoundError, match="cohort file not found"):
        run_experiment(params)


def _make_cut_uncut_pair(tmp_path, seed=0):
    """Uncut graph: 3 big folds. Cut graph: same voxels, folds split in two,
    vertices shuffled — exercises the lexicographic voxel alignment of
    test_thresholds (ref pattern_class.py:204-227)."""
    from unetsulc_tpu.io.container import save_graph_npz
    from unetsulc_tpu.io.graph import SulcalGraph, Vertex

    rng = np.random.default_rng(seed)
    labels = ["S.C._left", "S.T.s._left", "F.C.M._left"]
    uncut_vertices, cut_vertices = [], []
    for vi, label in enumerate(labels):
        start = rng.integers(5, 25, size=3)
        steps = rng.integers(-1, 2, size=(60, 3))
        pts = np.unique(
            np.clip(np.cumsum(steps, axis=0) + start, 0, 39), axis=0
        ).astype(np.int32)
        uncut_vertices.append(
            Vertex(index=vi + 1, name=label, buckets={"aims_ss": pts})
        )
        half = len(pts) // 2
        cut_vertices.append(
            Vertex(index=100 + vi, name=label, buckets={"aims_ss": pts[:half]})
        )
        cut_vertices.append(
            Vertex(index=200 + vi, name=label, buckets={"aims_ss": pts[half:]})
        )
    rng.shuffle(cut_vertices)
    cut = SulcalGraph(vertices=cut_vertices)
    uncut = SulcalGraph(vertices=uncut_vertices)
    pc = str(tmp_path / f"cut{seed}.npz")
    pu = str(tmp_path / f"uncut{seed}.npz")
    save_graph_npz(cut, pc)
    save_graph_npz(uncut, pu)
    return pc, pu


def test_threshold_sweep_with_distinct_uncut_graphs(tmp_path):
    """test_thresholds aligns cut<->uncut voxel orders correctly."""
    from unetsulc_tpu.config import TpuConfig
    from unetsulc_tpu.method.training import TrainingSulciLabeller

    pairs = [_make_cut_uncut_pair(tmp_path, seed=s) for s in range(3)]
    cut_files = [c for c, _ in pairs]
    uncut_files = [u for _, u in pairs]

    m = TrainingSulciLabeller(
        cut_files,
        "L",
        working_path=str(tmp_path),
        dict_model={"name": "CutModel", "num_filter": 8},
        tpu=TpuConfig(compute_dtype="float32", prefetch=0),
    )
    m.extract_data_from_graphs()
    m.load_network()
    m.results = m._results_schema()
    m.test_thresholds(cut_files, uncut_files, threshold_range=[5, 1000])
    scores = m.results["threshold_scores"]
    assert set(scores) == {5, 1000}
    # every graph scored (no alignment skips)
    assert len(scores[5][0]) == 3 and len(scores[1000][0]) == 3
    for sc in scores[5][0] + scores[1000][0]:
        assert 0.0 <= sc <= 100.0


def test_threshold_sweep_skips_mismatched_graphs(tmp_path, capsys):
    """A cut/uncut pair with different voxel counts is skipped with the
    reference's error message (ref pattern_class.py:220-225)."""
    from unetsulc_tpu.config import TpuConfig
    from unetsulc_tpu.io.container import save_graph_npz
    from unetsulc_tpu.io.graph import make_synthetic_graph
    from unetsulc_tpu.method.training import TrainingSulciLabeller

    g1 = make_synthetic_graph(np.random.default_rng(1), ["S.C._left"], 2, 40, 30)
    g2 = make_synthetic_graph(np.random.default_rng(2), ["S.C._left"], 2, 55, 30)
    p1, p2 = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    save_graph_npz(g1, p1)
    save_graph_npz(g2, p2)

    m = TrainingSulciLabeller(
        [p1],
        "L",
        working_path=str(tmp_path),
        dict_model={"name": "MisModel", "num_filter": 8},
        tpu=TpuConfig(compute_dtype="float32", prefetch=0),
    )
    m.extract_data_from_graphs()
    m.load_network()
    m.results = m._results_schema()
    m.test_thresholds([p1], [p2], threshold_range=[5])
    assert "ERROR no matches" in capsys.readouterr().out
    assert m.results["threshold_scores"][5] == [[]]


def test_batch1_per_sample_buckets(cohort_dir, tmp_path):
    """batch_size=1 + shape_buckets trains with per-sample bucketed shapes
    (the reference's primary batch-1 configuration)."""
    import shutil

    from unetsulc_tpu.config import Parameters
    from unetsulc_tpu.experiment.driver import run_experiment

    wp = str(tmp_path / "wp")
    shutil.copytree(str(cohort_dir / "cohorts"), op.join(wp, "cohorts"))
    params = Parameters.from_dict(
        {
            "working_path": wp,
            "cohort_name": "Synth6",
            "hemi": "L",
            "batch_size": 1,
            "lr": 0.05,
            "momentum": 0.9,
            "n_cvinner": 2,
            "n_epochs": 2,
            "th_range": [10],
            "dict_model": {"name": "B1Model", "num_filter": 8},
            "tpu": {
                "compute_dtype": "float32",
                "prefetch": 0,
                "shape_buckets": True,
            },
        }
    )
    results = run_experiment(params)
    assert len(results["best_acc"]) == 2
    assert all(np.isfinite(v) for curve in results["epoch_loss_val"] for v in curve)
    # no fixed image sizes recorded for batch 1 (reference schema)
    assert "train_image_size" not in results


def test_dropout_learning_and_labeling(cohort_dir, tmp_path):
    """dict_model dropout>0 trains AND evaluates/labels end-to-end.

    Round-1 regression: eval/labeling ran the model in train mode, so any
    dropout>0 config crashed at val time (the reference disables dropout
    via model.eval(), ref training.py:185)."""
    import shutil

    wp = str(tmp_path / "wp")
    shutil.copytree(str(cohort_dir / "cohorts"), op.join(wp, "cohorts"))
    params = Parameters.from_dict(
        {
            "working_path": wp,
            "cohort_name": "Synth6",
            "hemi": "L",
            "batch_size": 2,
            "lr": 0.05,
            "momentum": 0.9,
            "n_cvinner": 2,
            "n_epochs": 1,
            "th_range": [10],
            "dict_model": {
                "name": "DropModel",
                "num_filter": 8,
                "dropout": 0.1,
            },
            "tpu": {"compute_dtype": "float32", "prefetch": 0},
        }
    )
    results = run_experiment(params)
    assert len(results["best_acc"]) == 2
    assert all(
        np.isfinite(v) for curve in results["epoch_loss_val"] for v in curve
    )
    # threshold sweep exercised labeling() with dropout>0
    th_key = 10 if 10 in results["threshold_scores"] else "10"
    assert len(results["threshold_scores"][th_key]) == 2


def test_sslist_excludes_unknown_and_ventricle():
    """sslist filters unknown*/ventricle* (ref pattern_class.py:49-50) so
    they never count in the ESI metric."""
    from unetsulc_tpu.method.base import SulciLabeller

    m = SulciLabeller(
        [],
        "L",
        dict_model={"name": "T"},
        sulci_side_list=[
            "S.C._left",
            "unknown",
            "unknown_2",
            "ventricle_left",
            "F.C.M._left",
        ],
    )
    assert m.sslist == ["S.C._left", "F.C.M._left"]
    assert m.dict_sulci["background"] == -1
    assert m.dict_sulci["S.C._left"] == 0


def test_label_cli_in_process(cohort_dir, tmp_path, monkeypatch, capsys):
    """label.py main(): params.json + graphs -> CSVs + summary."""
    import shutil
    import sys

    wp = str(tmp_path / "wp")
    shutil.copytree(str(cohort_dir / "cohorts"), op.join(wp, "cohorts"))
    # quick 1-fold training to produce a model
    params = Parameters.from_dict(
        {
            "working_path": wp,
            "cohort_name": "Synth6",
            "hemi": "L",
            "batch_size": 1,
            "lr": 0.05,
            "momentum": 0.9,
            "n_cvinner": 2,
            "n_epochs": 1,
            "th_range": [5],
            "dict_model": {"name": "CliModel", "num_filter": 8},
            "tpu": {"compute_dtype": "float32", "prefetch": 0},
        }
    )
    run_experiment(params)
    with open(op.join(wp, "cohorts", "cohort-Synth6_hemi-L.json")) as f:
        graphs = [s["graph"] for s in json.load(f)["subjects"]][:2]

    sys.path.insert(0, "/root/repo")
    import label as label_cli

    out_dir = op.join(wp, "labelout")
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "label.py",
            "-m",
            op.join(wp, "models", "CliModel", "CliModel_cv0_params.json"),
            "-g",
            *graphs,
            "-o",
            out_dir,
            "--threshold",
            "5",
        ],
    )
    label_cli.main()
    with open(op.join(out_dir, "labeling_summary.json")) as f:
        summary = json.load(f)
    assert len(summary) == 2
    for g in graphs:
        assert 0.0 <= summary[g]["esi_accuracy"] <= 1.0
        csv = op.join(
            out_dir, op.splitext(op.basename(g))[0] + "_labels.csv"
        )
        with open(csv) as f:
            header = f.readline().strip()
        assert header == "x,y,z,true_label,pred_label"


def test_interpolate_false_learning_and_reload(cohort_dir, tmp_path):
    """dict_model interpolate=False trains, sweeps, and reloads end-to-end.

    The transposed-conv decoder is part of the pinned UNet3D ctor contract
    (ref pattern_class.py:85 default True; ref training.py:65-67 passes
    ``dict_model.interpolate`` through) — a user flipping the documented
    parameters.json key must get a working model, not a crash (VERDICT r2
    missing #1).  Forward parity and .mdsm interop for this decoder are
    pinned in test_model.py; this covers the learning()/labeling path."""
    import shutil

    wp = str(tmp_path / "wp")
    shutil.copytree(str(cohort_dir / "cohorts"), op.join(wp, "cohorts"))
    params = Parameters.from_dict(
        {
            "working_path": wp,
            "cohort_name": "Synth6",
            "hemi": "L",
            "batch_size": 2,
            "lr": 0.05,
            "momentum": 0.9,
            "n_cvinner": 2,
            "n_epochs": 1,
            "th_range": [10],
            "dict_model": {
                "name": "TConvModel",
                "num_filter": 8,
                "interpolate": False,
            },
            "tpu": {"compute_dtype": "float32", "prefetch": 0},
        }
    )
    results = run_experiment(params)
    assert len(results["best_acc"]) == 2
    assert all(
        np.isfinite(v) for curve in results["epoch_loss_val"] for v in curve
    )
    th_key = 10 if 10 in results["threshold_scores"] else "10"
    assert len(results["threshold_scores"][th_key]) == 2
    # the saved params.json must round-trip the decoder flag so reloads
    # rebuild the transposed-conv decoder (ref pattern_class.py:348-368)
    pj = op.join(wp, "models", "TConvModel", "TConvModel_cv0_params.json")
    with open(pj) as f:
        saved = json.load(f)
    assert saved["dict_model"]["interpolate"] is False


def test_threshold_sweep_device_vote_matches_host(cohort_dir, tmp_path):
    """test_thresholds with the device-side vote (tpu.device_vote, default)
    must produce exactly the host cutting path's scores — same partition,
    same summed-score vote, only computed where the scores already live."""
    import dataclasses

    from unetsulc_tpu.config import TpuConfig
    from unetsulc_tpu.method.training import TrainingSulciLabeller

    with open(
        op.join(str(cohort_dir), "cohorts", "cohort-Synth6_hemi-L.json")
    ) as f:
        graphs = [s["graph"] for s in json.load(f)["subjects"]]

    def sweep(device_vote):
        m = TrainingSulciLabeller(
            graphs,
            "L",
            working_path=str(tmp_path),
            dict_model={"name": "VoteModel", "num_filter": 8},
            tpu=TpuConfig(
                compute_dtype="float32", prefetch=0, device_vote=device_vote
            ),
        )
        m.extract_data_from_graphs()
        m.load_network()  # deterministic init: both paths see the same net
        m.test_thresholds(graphs[:2], graphs[:2], [5, 30], save_results=False)
        return {th: list(v) for th, v in m.dict_scores.items()}

    assert sweep(True) == sweep(False)
