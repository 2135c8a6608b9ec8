#!/usr/bin/env python
"""Quickstart: full workflow on a generated synthetic cohort.

No BrainVISA data needed — generates structured synthetic sulcal graphs,
runs the reference-compatible CV training via the same code path as
``main.py``, then labels a held-out graph with the trained model.

    python examples/synthetic_quickstart.py [workdir]

Takes ~2 minutes on CPU (JAX_PLATFORMS=cpu) with a persistent compile
cache, a few minutes cold; on a TPU chip the training itself is seconds.
"""

import json
import os
import os.path as op
import sys

sys.path.insert(0, op.dirname(op.dirname(op.abspath(__file__))))

import numpy as np  # noqa: E402

from unetsulc_tpu.config import Parameters  # noqa: E402
from unetsulc_tpu.experiment.driver import run_experiment  # noqa: E402
from unetsulc_tpu.io.container import save_graph_npz  # noqa: E402
from unetsulc_tpu.io.graph import make_synthetic_graph  # noqa: E402
from unetsulc_tpu.utils.cache import enable_compilation_cache  # noqa: E402


def build_cohort(root: str, n_subjects: int = 6):
    os.makedirs(op.join(root, "cohorts"), exist_ok=True)
    labels = ["S.C._left", "S.T.s._left", "F.C.M._left", "unknown"]
    subjects = []
    for i in range(n_subjects):
        g = make_synthetic_graph(
            np.random.default_rng(100 + i),
            labels,
            n_folds_per_label=2,
            points_per_fold=60,
            extent=48,
            unknown_fraction=0.15,
        )
        path = op.join(root, f"subj{i}.npz")
        save_graph_npz(g, path)
        subjects.append(
            {
                "name": f"subj{i}",
                "t1": None,
                "roots": None,
                "skeleton": None,
                "graph": path,
                "notcut_graph": path,
            }
        )
    with open(
        op.join(root, "cohorts", "cohort-Quickstart_hemi-L.json"), "w"
    ) as f:
        json.dump({"name": "Quickstart", "subjects": subjects}, f)


def main():
    enable_compilation_cache()
    root = op.abspath(sys.argv[1] if len(sys.argv) > 1 else "quickstart_run")
    build_cohort(root)

    params = Parameters.from_dict(
        {
            "working_path": root,
            "learning": "training",
            "cohort_name": "Quickstart",
            "hemi": "L",
            "batch_size": 1,
            "lr": 0.02,
            "momentum": 0.9,
            "n_cvinner": 3,
            "n_epochs": 4,
            "th_range": [10, 50],
            "dict_model": {"name": "QuickModel", "num_filter": 16},
            "patience": {"early_stopping": 6},
        }
    )
    results = run_experiment(params)
    print("\nMean best val accuracy:", float(np.mean(results["best_acc"])))

    # label a graph with the trained fold-0 model
    from unetsulc_tpu.method.training import TrainingSulciLabeller

    with open(
        op.join(root, "data", "cohort-Quickstart_hemi-L_data.json")
    ) as f:
        data = json.load(f)
    method = TrainingSulciLabeller(
        [],
        "L",
        working_path=root,
        dict_model={"name": "QuickModel", "num_filter": 16},
        dict_names=data["dict_names"],
        dict_bck2=data["dict_bck2"],
        sulci_side_list=data["sulci_side_list"],
    )
    method.load_saved_model(
        {
            "model_file": op.join(
                root, "models", "QuickModel", "QuickModel_cv0_model.mdsm"
            ),
            "out_channels": len(data["sulci_side_list"]),
            "init_channel_number": 16,
        }
    )
    gfile = sorted(data["dict_bck2"])[0]
    ytrue, ypred, yscores = method.labeling(gfile)
    acc = float(np.mean(np.asarray(ytrue) == np.asarray(ypred)))
    print(f"Labelled {gfile}: per-voxel agreement {acc:.3f}")
    print(f"\nArtifacts under {root}/: data/ results/ models/ tensorboard/")


if __name__ == "__main__":
    main()
