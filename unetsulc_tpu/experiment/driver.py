"""Experiment driver: cohort -> K-fold CV -> threshold vote -> artifacts.

Function-ized rebuild of the reference CLI's inline experiment layer
(ref main.py:65-185): cohort/cached-data loading, method construction,
``KFold(n_cvinner, shuffle=True, random_state=0)`` (sklearn, identical
split sequence), per-fold learning + threshold sweep + model save, then
the cross-fold best-threshold majority vote.

Returns the results dict so tests/benchmarks can assert on it; all
artifacts of SURVEY.md §2.4 are written under ``working_path``.
"""

from __future__ import annotations

import json
import os
import os.path as op
import time
from typing import Optional

import numpy as np
from sklearn.model_selection import KFold

from unetsulc_tpu.config import Parameters
from unetsulc_tpu.method.training import TrainingSulciLabeller
from unetsulc_tpu.method.transfer import TransferSulciLabeller


def load_cohort(params: Parameters):
    """Read the cohort JSON -> (graphs, notcut_graphs|None) (ref main.py:71-84)."""
    cohort_file = params.cohort_file()
    path = op.join(params.working_path, "cohorts", cohort_file + ".json")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"cohort file not found: {path}\n"
            f"Expected working_path/cohorts/{cohort_file}.json "
            "(build one with unetsulc_tpu.tools.select_subjects.create_cohort)"
        )
    with open(path, "r") as f:
        cohort = json.load(f)
    graphs, notcut_graphs = [], []
    for s in cohort["subjects"]:
        graphs.append(s["graph"])
        if notcut_graphs is not None:
            if s.get("notcut_graph") is not None:
                notcut_graphs.append(s["notcut_graph"])
            else:
                notcut_graphs = None
                print("No not cut graphs")
    print(len(graphs), "graph loaded")
    return graphs, notcut_graphs


def build_method(params: Parameters, graphs):
    """Construct the method object, reusing cached extracted data if present
    (ref main.py:87-118)."""
    cohort_file = params.cohort_file()
    path_to_data = op.join(
        params.working_path, "data", cohort_file + "_data.json"
    )
    data = {}
    if os.path.exists(path_to_data):
        with open(path_to_data, "r") as f:
            data = json.load(f)
        print("Data Loaded")
    else:
        print("No Data Found")

    common = dict(
        cuda=params.cuda,
        working_path=params.working_path,
        dict_model=params.dict_model.to_dict(),
        translation_file=params.translation_file,
        tpu=params.tpu,
    )
    cached = (
        dict(
            dict_names=data["dict_names"],
            dict_bck2=data["dict_bck2"],
            sulci_side_list=data["sulci_side_list"],
        )
        if data
        else {}
    )
    if params.learning == "transfer_learning":
        method = TransferSulciLabeller(
            graphs,
            params.hemi,
            dict_trained_model=(
                params.dict_trained_model.to_dict()
                if params.dict_trained_model
                else {}
            ),
            **common,
            **cached,
        )
    else:
        method = TrainingSulciLabeller(graphs, params.hemi, **common, **cached)

    if not data:
        method.extract_data_from_graphs()
        method.save_data(name=cohort_file)
    return method


def threshold_vote(results: dict, rng: Optional[np.random.Generator] = None):
    """Cross-fold best-threshold selection (ref main.py:158-185).

    Returns (best_thresholds_per_fold, global_best_th).  Ties within a fold
    collect into lists; a fold's saved threshold is drawn from the tie list;
    the global threshold is the majority vote over the flattened lists.
    """
    rng = rng or np.random.default_rng(0)
    best_thresholds, best_means = [], []
    for th, scores in results["threshold_scores"].items():
        mean_scores = [np.mean(scores[i]) for i in range(len(scores))]
        for n, sc in enumerate(mean_scores):
            if len(best_means) < n + 1:
                best_means.append(sc)
                best_thresholds.append(th)
            elif sc > best_means[n]:
                best_thresholds[n] = th
                best_means[n] = sc
            elif sc == best_means[n]:
                if isinstance(best_thresholds[n], list):
                    best_thresholds[n].append(th)
                else:
                    best_thresholds[n] = [best_thresholds[n], th]

    per_fold = []
    for th in best_thresholds:
        per_fold.append(int(rng.choice(th)) if isinstance(th, list) else int(th))

    flat = []
    for th in best_thresholds:
        flat.extend(th if isinstance(th, list) else [th])
    best_th = int(max(set(flat), key=flat.count)) if flat else None
    return per_fold, best_th


def merge_fold_results(canonical: dict, fold: dict) -> None:
    """Merge one fold's results (from a fresh per-fold method) into the
    canonical dict IN FOLD ORDER, reproducing the sequential method's
    accumulation exactly (pinned by
    tests/test_experiment.py::test_fold_parallel_matches_sequential).

    Every per-fold quantity the method layer records is list-appended
    fold-major in a sequential run, so extending reproduces it; the two
    exceptions are the reference's image-size quirk (fold 0 stores a FLAT
    [x, y, z], later folds append nested lists — ref training.py:152-158)
    and ``threshold_scores`` (a dict of per-threshold per-fold lists).
    """
    for key, val in fold.items():
        if key in ("train_image_size", "val_image_size"):
            if key not in canonical:
                canonical[key] = val
            else:
                canonical[key].append(val)
        elif key == "threshold_scores":
            tgt = canonical.setdefault(key, {})
            for th, scores in val.items():
                tgt.setdefault(th, []).extend(scores)
        elif isinstance(val, list):
            canonical.setdefault(key, []).extend(val)
        else:
            canonical[key] = val


def _fold_worker(
    params: Parameters,
    graphs,
    cvi: int,
    glist_train,
    glist_test,
    glist_notcut_test,
    group,
    model_name: str,
):
    """Run ONE CV fold on its own device group; returns the fold's
    results dict (merged by the driver in fold order).

    The worker builds a fresh method instance (cached extracted data is
    re-read from the data JSON the canonical method just wrote) so
    concurrent folds share no mutable state; folds are numerically
    independent by construction — fixed init seed per fold
    (training.py load_network), replayable per-(seed, epoch, index)
    augmentation RNG — so this reproduces the sequential loop exactly.
    ``jax.default_device`` is thread-local, pinning the single-device
    fold's computation to the group's first device; dp/sp folds build
    their mesh from the group (training.py _cached_steps ``devices``).
    """
    import jax

    method = build_method(params, graphs)
    method.devices = tuple(group)
    method.cv_index_offset = cvi
    with jax.default_device(group[0]):
        method.learning(
            lr=params.lr,
            momentum=params.momentum,
            num_epochs=params.n_epochs,
            gfile_list_train=glist_train,
            gfile_list_test=glist_test,
            batch_size=params.batch_size,
            patience=params.patience,
            save_results=True,
        )
        if glist_notcut_test is not None:
            print("\nCutting")
            method.test_thresholds(
                gfile_list_test=glist_test,
                gfile_list_notcut_test=glist_notcut_test,
                threshold_range=params.th_range,
            )
        method.save_model(name=model_name + "_cv" + str(cvi))
        if params.tpu.evaluate:
            from unetsulc_tpu.experiment.evaluation import evaluate_cohort

            evaluate_cohort(
                method,
                glist_test,
                model_name,
                f"{model_name}_cv{cvi}",
                params.cohort_file(),
            )
    return method.results


def _run_folds_parallel(
    params: Parameters,
    method,
    folds,
    graphs,
    notcut_agraphs,
    completed_folds: int,
    model_name: str,
) -> None:
    """Experiment parallelism (SURVEY.md §2.2c; TpuConfig.fold_parallel):
    run the remaining CV folds concurrently, one per device group.

    The reference's fold loop is embarrassingly parallel (ref
    main.py:131-145: a fresh model/optimizer per fold, results only
    appended); here ``jax.devices()`` is partitioned into contiguous
    groups (parallel/mesh.py device_groups) and each fold trains on its
    own group in a thread — dispatch is asynchronous, so device compute
    overlaps across groups while the host interleaves Python.  Results
    merge back IN FOLD ORDER (merge_fold_results) and persist after each
    in-order merge (crash drops only out-of-order completions; their
    fold models are already on disk).  The group layout is recorded in
    the results JSON under ``fold_parallel``.
    """
    from concurrent.futures import ThreadPoolExecutor

    from unetsulc_tpu.parallel.mesh import device_groups

    groups = device_groups(params.tpu.fold_parallel)
    print(
        f"fold_parallel={len(groups)}: running folds concurrently on "
        f"device groups {[[str(d) for d in g] for g in groups]}"
    )
    layout = {
        "n_groups": len(groups),
        "groups": [[str(d) for d in g] for g in groups],
        "folds": {},
    }
    futures = {}
    with ThreadPoolExecutor(max_workers=len(groups)) as ex:
        for cvi, (train, test) in folds:
            gi = (cvi - completed_folds) % len(groups)
            layout["folds"][str(cvi)] = gi
            futures[cvi] = ex.submit(
                _fold_worker,
                params,
                graphs,
                cvi,
                list(np.asarray(graphs)[train]),
                list(np.asarray(graphs)[test]),
                (
                    list(notcut_agraphs[test])
                    if notcut_agraphs is not None
                    else None
                ),
                groups[gi],
                model_name,
            )
        for cvi in sorted(futures):
            merge_fold_results(method.results, futures[cvi].result())
            method.results["fold_parallel"] = layout
            method.save_results()  # crash-safe per in-order fold


def run_experiment(params: Parameters):
    """Full CV run (the reference's __main__ block, ref main.py:65-185)."""
    print("working directory: ", params.working_path)
    print("cohort: ", params.cohort_name)
    print("hemi: ", params.hemi)

    graphs, notcut_graphs = load_cohort(params)
    method = build_method(params, graphs)
    model_name = params.dict_model.name

    print("\n----- Learning -----\n")
    start_time = time.time()
    kf = KFold(n_splits=params.n_cvinner, shuffle=True, random_state=0)
    agraphs = np.asarray(graphs)
    notcut_agraphs = (
        np.asarray(notcut_graphs) if notcut_graphs is not None else None
    )

    # fold-level resume (no reference counterpart; the reference writes
    # results only at the very end, main.py:147, so a crash loses the run)
    completed_folds = 0
    results_path = op.join(
        params.working_path, "results", model_name + "_results.json"
    )
    if params.tpu.resume and os.path.exists(results_path):
        with open(results_path, "r") as f:
            prior = json.load(f)
        if prior.get("lr"):
            # JSON stringifies threshold keys; restore ints so
            # test_thresholds appends to the same buckets
            ts = prior.get("threshold_scores", {})
            prior["threshold_scores"] = {
                (int(k) if str(k).lstrip("-").isdigit() else k): v
                for k, v in ts.items()
            }
            method.results = prior
            completed_folds = len(prior["lr"])
            print(f"Resuming: {completed_folds} fold(s) already complete")

    fold_par = params.tpu.fold_parallel
    if fold_par > 1 and params.learning == "transfer_learning":
        # transfer folds are NOT embarrassingly parallel: the fine-tuning
        # unfreeze mutates the method's training_layers across folds (a
        # deliberate reference-parity quirk — after fold 0 fine-tunes,
        # later folds train the decoder layers from epoch 0; method/
        # transfer.py _post_epoch, ref transfer_learning.py:389 on a
        # method object reused across CV folds).  Concurrent fresh-method
        # folds would silently change those semantics, so fall back loudly.
        print(
            "fold_parallel: transfer_learning folds carry state across "
            "folds (fine-tuning unfreeze extends training_layers for "
            "subsequent folds, reference semantics) — running folds "
            "sequentially"
        )
        fold_par = 1
    if fold_par > 1:
        remaining = [
            (cvi, split)
            for cvi, split in enumerate(kf.split(graphs))
            if cvi >= completed_folds
        ]
        _run_folds_parallel(
            params, method, remaining, graphs, notcut_agraphs,
            completed_folds, model_name,
        )

    for cvi, (train, test) in enumerate(kf.split(graphs)):
        if cvi < completed_folds or fold_par > 1:
            continue
        print(
            "\n== Cross Validation {}/{} ==\n".format(cvi, params.n_cvinner - 1)
        )
        glist_train = agraphs[train]
        glist_test = agraphs[test]
        method.learning(
            lr=params.lr,
            momentum=params.momentum,
            num_epochs=params.n_epochs,
            gfile_list_train=glist_train,
            gfile_list_test=glist_test,
            batch_size=params.batch_size,
            patience=params.patience,
            save_results=True,
        )
        if notcut_agraphs is not None:
            print("\nCutting")
            method.test_thresholds(
                gfile_list_test=glist_test,
                gfile_list_notcut_test=notcut_agraphs[test],
                threshold_range=params.th_range,
            )
        method.save_model(name=model_name + "_cv" + str(cvi))
        method.save_results()  # crash-safe: persist after every fold
        if params.tpu.evaluate:
            from unetsulc_tpu.experiment.evaluation import evaluate_cohort

            evaluate_cohort(
                method,
                glist_test,
                model_name,
                f"{model_name}_cv{cvi}",
                params.cohort_file(),
            )

    method.save_results()
    cv_time = time.time() - start_time
    print(
        "Cross Validation complete in {:.0f}h {:.0f}m {:.0f}s".format(
            cv_time // 3600, (cv_time % 3600) // 60, (cv_time % 3600) % 60
        )
    )

    with open(
        op.join(params.working_path, "results", model_name + "_results.json"),
        "r",
    ) as f:
        results = json.load(f)

    mean_acc = np.mean(results["best_acc"])
    print("\nFinal Results")
    print("Mean accuracy: ", mean_acc)

    if notcut_agraphs is not None:
        per_fold, best_th = threshold_vote(results)
        for n, th in enumerate(per_fold):
            print("Training n°", n, " | Best threshold:", th)
            method.save_params(
                best_threshold=int(th), name=model_name + "_cv" + str(n)
            )
        method.save_params(best_threshold=best_th)
        print("\nBest Threshold: ", best_th)
    return results


def run_both_hemispheres(params: Parameters):
    """BASELINE.json config #5: the full L+R study as one call.

    The reference runs one hemisphere per invocation (main.py reads a
    single `hemi`); this helper runs both.  Each hemisphere is an
    independent experiment (own cohort file / model / artifacts) — the
    experiment-level parallelism unit of SURVEY.md §2.2c; on a multi-slice
    deployment each call maps to its own device group.
    """
    import copy as _copy

    results = {}
    for hemi in ("L", "R"):
        p = _copy.deepcopy(params)
        p.hemi = hemi
        if not p.dict_model.name.endswith(f"_hemi{hemi}"):
            p.dict_model.name = f"{p.dict_model.name}_hemi{hemi}"
        results[hemi] = run_experiment(p)
    return results
