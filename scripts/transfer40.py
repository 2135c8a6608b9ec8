"""Transfer continuation for the flagship evidence refresh: load the
converged Pallas trunk (TAG env, default the 100-epoch run), swap the
head, freeze, train, fine-tune (20 ep)."""
import glob, json, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from unetsulc_tpu.config import Parameters
from unetsulc_tpu.experiment.driver import run_experiment
from unetsulc_tpu.utils.cache import enable_compilation_cache

root = "/tmp/flagship_run"
tag = os.environ.get("TAG", "_p100")
mdsm = sorted(glob.glob(os.path.join(root, "models", "FlagshipModel" + tag,
                                     "*_cv0_model.mdsm")))[0]
params = Parameters.from_dict({
    "working_path": root, "learning": "transfer_learning", "cuda": -1,
    "cohort_name": "Flagship", "hemi": "L", "batch_size": 1,
    "lr": 0.01, "momentum": 0.9, "n_cvinner": 2, "n_epochs": 20,
    "th_range": [20],
    "dict_model": {"name": "TransferModel40", "num_filter": 64,
                   "training_layers": ["final_conv"],
                   "fine_tunning_layers": ["decoders_2", "decoders_1"]},
    "dict_trained_model": {"in_channels": 1, "out_channels": 13,
                           "conv_layer_order": "crg", "interpolate": True,
                           "final_sigmoid": False,
                           "init_channel_number": 64,
                           "model_file": mdsm},
})
enable_compilation_cache()
t0 = time.time()
run_experiment(params)
print(f"TRANSFER WALL: {time.time()-t0:.0f}s", flush=True)
res = json.load(open(os.path.join(root, "results", "TransferModel40_results.json")))
print("best_acc per fold:", res["best_acc"])
print("mean val acc:", float(np.mean(res["best_acc"])))
