"""Flagship e2e on TPU: 12 subjects, init 64, 13 classes, 3-fold CV x 8 epochs."""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from unetsulc_tpu.config import Parameters
from unetsulc_tpu.experiment.driver import run_experiment
from unetsulc_tpu.io.container import save_graph_npz
from unetsulc_tpu.io.graph import make_synthetic_graph
from unetsulc_tpu.utils.cache import enable_compilation_cache

root = "/tmp/flagship_run"
os.makedirs(os.path.join(root, "cohorts"), exist_ok=True)
labels = [f"S.{c}._left" for c in "ABCDEFGHIJKL"] + ["unknown"]
subjects = []
for i in range(12):
    g = make_synthetic_graph(
        np.random.default_rng(300 + i), labels, n_folds_per_label=2,
        points_per_fold=80, extent=76, unknown_fraction=0.15)
    p = os.path.join(root, f"subj{i}.npz")
    save_graph_npz(g, p)
    subjects.append({"name": f"subj{i}", "t1": None, "roots": None,
                     "skeleton": None, "graph": p, "notcut_graph": p})
json.dump({"name": "Flagship", "subjects": subjects},
          open(os.path.join(root, "cohorts", "cohort-Flagship_hemi-L.json"), "w"))

params = Parameters.from_dict({
    "working_path": root, "learning": "training", "cuda": -1,
    "cohort_name": "Flagship", "hemi": "L", "batch_size": 1,
    "lr": 0.01, "momentum": 0.9, "n_cvinner": 3, "n_epochs": int(os.environ.get("EPOCHS", "8")),
    "th_range": [20, 100],
    "dict_model": {"name": "FlagshipModel" + os.environ.get("TAG", ""), "num_filter": 64},
    "tpu": {"pallas_blocks": os.environ.get("NOPALLAS", "") != "1"},
})
enable_compilation_cache()
t0 = time.time()
run_experiment(params)
print(f"TOTAL WALL: {time.time()-t0:.0f}s", flush=True)
res = json.load(open(os.path.join(root, "results", "FlagshipModel" + os.environ.get("TAG", "") + "_results.json")))
print("best_acc per fold:", res["best_acc"])
print("mean val acc:", float(np.mean(res["best_acc"])))
