#!/usr/bin/env python
"""CLI: label sulcal graphs with a trained model.

Serving-side companion to main.py (the reference exposes labeling only as
a method call, ref pattern_class.py:247-279; this wraps it as a CLI with
optional cutting post-processing):

    python label.py -m models/MyModel/MyModel_cv0_params.json \
        -g subject1.arg subject2.arg -o out_dir [--threshold 50]

Writes one CSV per graph (voxel coords nbck/bck2, true and predicted label
names) plus a summary JSON with per-graph ESI accuracy.
"""

import argparse
import json
import os
import os.path as op


def main():
    ap = argparse.ArgumentParser(description="Label sulcal graphs")
    ap.add_argument("-m", dest="params", required=True,
                    help="path to a <model>_params.json")
    ap.add_argument("-g", dest="graphs", nargs="+", required=True)
    ap.add_argument("-o", dest="out_dir", default=".")
    ap.add_argument("--threshold", type=int, default=None,
                    help="cutting threshold (default: the params file's "
                         "cutting_threshold if present; 0 disables)")
    ap.add_argument("--hemi", default="L")
    args = ap.parse_args()

    import numpy as np

    from unetsulc_tpu.data.extract import extract_data
    from unetsulc_tpu.io.container import read_graph
    from unetsulc_tpu.method.base import SulciLabeller
    from unetsulc_tpu.ops.cutting import cutting
    from unetsulc_tpu.ops.esi import esi_score
    from unetsulc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    with open(args.params) as f:
        saved = json.load(f)
    dict_model = saved["dict_model"]
    method = SulciLabeller(
        [],
        args.hemi,
        working_path=args.out_dir,
        dict_model=dict_model,
        dict_bck2={},
        dict_names={},
        sulci_side_list=saved["sulci_side_list"],
    )
    method.load_saved_model(dict(dict_model))
    threshold = args.threshold
    if threshold is None:
        threshold = saved.get("cutting_threshold", 0)

    os.makedirs(args.out_dir, exist_ok=True)
    summary = {}

    def finish(item):
        """Fetch one dispatched graph's scores and write its outputs.

        Runs one graph BEHIND the dispatch loop: the device computes
        graph k+1's forward while this blocks on graph k's device->host
        score transfer and does the host-side cutting/CSV work (same
        software pipeline as the threshold sweep, method/base.py
        test_thresholds).
        """
        gfile, data, names, handle = item
        bck2 = np.asarray(data["bck2"])
        if threshold and method.tpu.device_vote:
            # score matrix stays on device: fetch ypred, vote there
            ypred = method._cut_labels_device(
                handle, data["vert"], bck2, [threshold]
            )[0]
        elif threshold:
            _, _, yscores = method._labeling_fetch(handle)
            ypred = cutting(yscores, data["vert"], bck2, threshold)
        else:
            _, ypred, _ = method._labeling_fetch(handle, fetch_scores=False)
            ypred = np.asarray(ypred)
        pred_names = [method.sulci_side_list[y] for y in ypred]
        acc = 1 - esi_score(names, pred_names, method.sslist)
        summary[gfile] = {"esi_accuracy": acc, "n_voxels": len(bck2)}

        out_csv = op.join(
            args.out_dir, op.splitext(op.basename(gfile))[0] + "_labels.csv"
        )
        with open(out_csv, "w") as f:
            f.write("x,y,z,true_label,pred_label\n")
            for (x, y, z), t, p in zip(data["nbck"], names, pred_names):
                f.write(f"{x},{y},{z},{t},{p}\n")
        print(f"{gfile}: acc={acc:.4f} -> {out_csv}")

    pending = None
    for gfile in args.graphs:
        graph = read_graph(gfile)
        data = extract_data(graph)
        bck2 = np.asarray(data["bck2"])
        names = np.asarray(data["names"])
        # dispatch first: the device works on this graph while finish()
        # fetches + post-processes the previous one
        handle = method._labeling_dispatch(gfile, bck2=bck2, names=names)
        if pending is not None:
            finish(pending)
        pending = (gfile, data, names, handle)
    if pending is not None:
        finish(pending)

    with open(op.join(args.out_dir, "labeling_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
