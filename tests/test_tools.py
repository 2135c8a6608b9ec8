"""Tools & figures: cohort builders, .hie colors, evaluation CSVs, plots."""

import json
import os
import os.path as op

import numpy as np
import pytest

from unetsulc_tpu.tools import select_subjects as ss
from unetsulc_tpu.tools.create_sulcal_root_colors import (
    sulcus_metric_from_csv,
    write_hie,
)


@pytest.fixture()
def fake_bv_db(tmp_path):
    """Minimal BrainVISA-like tree with 3 subjects (one missing a graph)."""
    db = tmp_path / "db"
    for i in range(3):
        subj = f"chimp{i}"
        acq = db / "center" / subj / "t1mri" / "acq1"
        folds = acq / "default_analysis" / "folds" / "3.1"
        seg = acq / "default_analysis" / "segmentation"
        (folds / "base2018_manual").mkdir(parents=True)
        seg.mkdir(parents=True)
        (acq / f"{subj}.nii.gz").write_text("t1")
        (seg / f"Lroots_{subj}.nii.gz").write_text("r")
        (seg / f"Lskeleton_{subj}.nii.gz").write_text("s")
        if i != 2:  # subject 2 has no graph
            (
                folds / "base2018_manual" / f"L{subj}_base2018_manual.arg"
            ).write_text("# graph 1.0\n*BEGIN GRAPH CorticalFoldArg\n*END\n")
    return str(db)


def test_select_subjects(fake_bv_db, capsys):
    subs = ss.select_subjects(fake_bv_db, "center", exclusion_list=["chimp1", "ghost"])
    assert subs == ["chimp0", "chimp2"]
    assert "ghost" in capsys.readouterr().out


def test_create_cohort(fake_bv_db, tmp_path):
    out = ss.create_cohort(
        fake_bv_db, "center", "TestC", out_dir=str(tmp_path), hemis=("L",)
    )
    with open(out["L"]) as f:
        cohort = json.load(f)
    names = [s["name"] for s in cohort["subjects"]]
    assert names == ["chimp0", "chimp1"]  # chimp2 lacks a graph
    s0 = cohort["subjects"][0]
    assert s0["graph"].endswith("Lchimp0_base2018_manual.arg")
    assert s0["t1"] and s0["roots"] and s0["skeleton"]


def test_cohort_manipulation(fake_bv_db, tmp_path):
    out = ss.create_cohort(
        fake_bv_db, "center", "TestC", out_dir=str(tmp_path), hemis=("L",)
    )["L"]
    short = ss.create_short_cohort(out, str(tmp_path / "short.json"), 1)
    assert len(short["subjects"]) == 1

    sel = ss.select_subjects_from_cohort(
        out, str(tmp_path / "sel.json"), ["chimp1"]
    )
    assert [s["name"] for s in sel["subjects"]] == ["chimp1"]

    comp = ss.create_composed_cohort(
        [out, str(tmp_path / "sel.json")], str(tmp_path / "comp.json"), "Comp"
    )
    assert len(comp["subjects"]) == 2  # deduped

    ss.change_path_cohort(out, str(fake_bv_db), "/new/root")
    with open(out) as f:
        moved = json.load(f)
    assert moved["subjects"][0]["graph"].startswith("/new/root")


def test_write_hie_random_and_metric(tmp_path):
    sulci = ["S.C._left", "S.T.s._left"]
    p1 = write_hie(str(tmp_path / "rand.hie"), sulci, seed=3)
    text = open(p1).read()
    assert "*BEGIN TREE hierarchy" in text
    for s in sulci:
        assert f"name {s}" in text
    # metric mode
    p2 = write_hie(
        str(tmp_path / "metric.hie"), sulci, {"S.C._left": 0.1, "S.T.s._left": 0.9}
    )
    assert "color" in open(p2).read()


def test_evaluation_csv_and_figures(cohort_dir, tmp_path):
    """evaluation CSV producer -> figures -> .hie metric colors."""
    import pandas as pd

    from unetsulc_tpu.config import TpuConfig
    from unetsulc_tpu.experiment.evaluation import evaluate_cohort
    from unetsulc_tpu.figures.plot_cohort_features import plot_cohort_features
    from unetsulc_tpu.figures.plot_results import (
        plot_elocal_bars,
        plot_threshold_scores,
        plot_training_curves,
    )
    from unetsulc_tpu.method.training import TrainingSulciLabeller

    with open(op.join(str(cohort_dir), "cohorts", "cohort-Synth6_hemi-L.json")) as f:
        graphs = [s["graph"] for s in json.load(f)["subjects"]]
    m = TrainingSulciLabeller(
        graphs,
        "L",
        working_path=str(tmp_path),
        dict_model={"name": "EvalModel", "num_filter": 8},
        tpu=TpuConfig(compute_dtype="float32", prefetch=0),
    )
    m.extract_data_from_graphs()
    m.load_network()
    csv = evaluate_cohort(m, graphs[:2], "EvalModel", "EvalModel_cv0", "synth")
    df = pd.read_csv(csv)
    assert "ESI" in df.columns
    assert any(c.startswith("Elocal_") for c in df.columns)
    assert len(df) == 2

    fig = plot_elocal_bars(csv, out_dir=str(tmp_path))
    assert op.exists(fig)

    # training-curve + threshold figures from a results file
    results = {
        "epoch_loss_train": [[1.0, 0.5]],
        "epoch_loss_val": [[1.1, 0.7]],
        "epoch_acc_train": [[0.2, 0.5]],
        "epoch_acc_val": [[0.1, 0.4]],
        "threshold_scores": {"10": [[50.0]], "50": [[60.0]]},
    }
    rpath = str(tmp_path / "EvalModel_results.json")
    with open(rpath, "w") as f:
        json.dump(results, f)
    for p in plot_training_curves(rpath, out_dir=str(tmp_path)):
        assert op.exists(p)
    assert op.exists(plot_threshold_scores(rpath, out_dir=str(tmp_path)))

    # cohort features figure from the data json
    m.save_data(name="synthc")
    figs = plot_cohort_features(
        op.join(str(tmp_path), "data", "synthc_data.json"), out_dir=str(tmp_path)
    )
    assert all(op.exists(p) for p in figs)

    # metric-colored .hie from the evaluation csv
    metric = sulcus_metric_from_csv(csv)
    hie = write_hie(str(tmp_path / "m.hie"), sorted(metric), metric)
    assert op.exists(hie)


def test_model_comparison_figures(tmp_path):
    from unetsulc_tpu.figures.model_comparison import (
        compare_curves,
        compare_evaluations,
    )
    import pandas as pd

    ra = {
        "epoch_loss_train": [[1.0, 0.6], [0.9]],
        "epoch_loss_val": [[1.0, 0.8]],
        "epoch_acc_train": [[0.1, 0.3]],
        "epoch_acc_val": [[0.2, 0.3]],
    }
    rb = {
        "epoch_loss_train": [[0.8, 0.5, 0.4]],
        "epoch_loss_val": [[0.9, 0.6, 0.5]],
        "epoch_acc_train": [[0.3, 0.4, 0.6]],
        "epoch_acc_val": [[0.2, 0.5, 0.6]],
    }
    pa, pb = str(tmp_path / "a.json"), str(tmp_path / "b.json")
    json.dump(ra, open(pa, "w"))
    json.dump(rb, open(pb, "w"))
    figs = compare_curves(pa, pb, out_dir=str(tmp_path))
    assert len(figs) == 4 and all(op.exists(p) for p in figs)

    dfa = pd.DataFrame(
        {"ESI": [0.3, 0.4], "Elocal_S.C.": [0.2, 0.3], "Elocal_F.C.": [0.1, 0.2]}
    )
    dfb = pd.DataFrame(
        {"ESI": [0.25, 0.35], "Elocal_S.C.": [0.15, 0.25], "Elocal_F.C.": [0.12, 0.22]}
    )
    ca, cb = str(tmp_path / "a.csv"), str(tmp_path / "b.csv")
    dfa.to_csv(ca, index=False)
    dfb.to_csv(cb, index=False)
    out = compare_evaluations(ca, cb, out_dir=str(tmp_path))
    assert op.exists(out["figure"])
    assert out["wilcoxon_esi"] is not None


def test_regenerate_data_from_graphs(cohort_dir):
    """Figures can re-extract cohort data when no cache exists
    (ref create_figures/plot_cohort_features.py:38-82)."""
    import json

    from unetsulc_tpu.figures.plot_cohort_features import (
        cohort_features,
        regenerate_data,
    )

    with open(op.join(str(cohort_dir), "cohorts", "cohort-Synth6_hemi-L.json")) as f:
        graphs = [s["graph"] for s in json.load(f)["subjects"]][:2]
    data = regenerate_data(graphs)
    assert set(data) == {"dict_bck2", "dict_names"}
    assert all(len(data["dict_bck2"][g]) > 0 for g in graphs)
    feats = cohort_features(data["dict_bck2"], data["dict_names"])
    assert feats["sizes"] and feats["occurrences"]


def test_convert_graphs_cli(graph, tmp_path):
    """.arg -> .npz converter preserves the extraction contract and
    rewrites cohort files."""
    from unetsulc_tpu.data.extract import extract_data
    from unetsulc_tpu.io.arg_writer import save_graph_arg
    from unetsulc_tpu.io.container import read_graph
    from unetsulc_tpu.tools.convert_graphs import convert_cohort, convert_one

    src = str(tmp_path / "g.arg")
    save_graph_arg(graph, src)
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    npz = convert_one(src, out_dir)
    a = extract_data(read_graph(src))
    b = extract_data(read_graph(npz))
    np.testing.assert_array_equal(a["bck2"], b["bck2"])
    assert list(a["names"]) == list(b["names"])

    cohort = {
        "name": "C",
        "subjects": [
            {"name": "s0", "graph": src, "notcut_graph": src, "t1": None}
        ],
    }
    cpath = str(tmp_path / "cohort-C_hemi-L.json")
    with open(cpath, "w") as f:
        json.dump(cohort, f)
    out_cohort = convert_cohort(cpath, out_dir)
    with open(out_cohort) as f:
        new = json.load(f)
    assert new["subjects"][0]["graph"].endswith(".npz")
    assert new["subjects"][0]["graph"] == new["subjects"][0]["notcut_graph"]
