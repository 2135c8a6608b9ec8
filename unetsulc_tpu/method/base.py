"""SulciLabeller — the shared method-layer base class.

TPU-native rebuild of ``UnetPatternSulciLabelling`` (ref pattern_class.py:
32-368) with the same public API: ``extract_data_from_graphs``,
``fill_dict_model``, ``test_thresholds``, ``labeling``, ``save_data``,
``save_model``, ``save_results``, ``save_params``, ``reset_results``,
``load_saved_model``.  The model is a flax UNet3D whose parameters live in
``self.params`` (a pytree) instead of a torch module; ``.mdsm`` files and
all JSON artifacts keep the reference's schemas (SURVEY.md §2.4).

The ``cuda`` argument is accepted for schema compatibility and ignored:
device selection is JAX's (the default device is the TPU chip; tests pin
CPU via JAX_PLATFORMS).
"""

from __future__ import annotations

import json
import os
import os.path as op
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from unetsulc_tpu.config import TpuConfig
from unetsulc_tpu.data.dataset import SulciDataset
from unetsulc_tpu.data.extract import extract_data
from unetsulc_tpu.io.container import read_graph
from unetsulc_tpu.io.mdsm import read_state_dict, write_state_dict
from unetsulc_tpu.io.translation import FoldLabelsTranslator
from unetsulc_tpu.models.torch_interop import (
    params_from_state_dict,
    state_dict_from_params,
)
from unetsulc_tpu.models.unet3d import UNet3D
from unetsulc_tpu.ops.cutting import cut_part_ids_multi, cutting
from unetsulc_tpu.ops.esi import esi_score
from unetsulc_tpu.train.step import make_label_fn, make_vote_fn

# BrainVISA container fallbacks (ref pattern_class.py:152-172)
from unetsulc_tpu.config import _DEFAULT_MODELS, _DEFAULT_PARAMS


class SulciLabeller:
    def __init__(
        self,
        graphs: Sequence[str],
        hemi: str,
        cuda: int = -1,
        working_path: Optional[str] = None,
        dict_model: Optional[dict] = None,
        dict_names: Optional[dict] = None,
        dict_bck2: Optional[dict] = None,
        sulci_side_list: Optional[List[str]] = None,
        translation_file: Optional[str] = None,
        tpu: Optional[TpuConfig] = None,
    ):
        dict_model = dict(dict_model or {})
        self.graphs = list(graphs)
        self.hemi = hemi
        self.tpu = tpu or TpuConfig()

        # dict_sulci / sslist (ref pattern_class.py:42-54)
        self.dict_bck2 = dict_bck2
        self.dict_names = dict_names
        self.sulci_side_list = sulci_side_list
        if sulci_side_list is not None:
            self._build_label_maps(sulci_side_list)
        else:
            self.dict_sulci = None
            self.sslist = None
        self.background = -1

        self.working_path = working_path or os.getcwd()

        # model config defaults (ref pattern_class.py:62-99)
        self.model_def: Optional[UNet3D] = None
        self.params = None
        self.dict_model = dict_model
        self.model_name = dict_model.get("name", "UnknownModel_hemi" + hemi)
        self.num_filter = dict_model.get("num_filter", 64)
        self.num_channel = dict_model.get("num_channel", 1)
        self.interpolate = dict_model.get("interpolate", True)
        self.final_sigmoid = dict_model.get("final_sigmoid", False)
        self.conv_layer_order = dict_model.get("conv_layer_order", "crg")
        self.num_conv = dict_model.get("num_conv", 1)
        self.dropout = dict_model.get("dropout", 0.0)
        print("Model name: ", self.model_name)

        # results
        self.results: dict = {}
        self.dict_scores: dict = {}

        # translation file (base ref keeps trfile=None unless configured,
        # ref pattern_class.py:105-106; legacy transfer requires it,
        # ref transfer_learning/transfer_learning.py:100-108)
        if translation_file is not None and os.path.exists(translation_file):
            self.flt = FoldLabelsTranslator()
            self.flt.readLabels(translation_file)
            self.trfile = translation_file
            print("Translation file loaded")
        else:
            self.flt = None
            self.trfile = None

        self._predict_fns: Dict = {}
        # experiment parallelism (TpuConfig.fold_parallel): the fold's
        # device group (tuple; None = all visible devices) and its true CV
        # index for on-disk names — a concurrent fold runs in a fresh
        # method whose internal results indices start at 0
        # (experiment/driver.py _fold_worker)
        self.devices = None
        self.cv_index_offset = 0
        print("Working on", jax.devices()[0])

    # ------------------------------------------------------------------
    # label maps
    # ------------------------------------------------------------------
    def _build_label_maps(self, sulci_side_list: Sequence[str]) -> None:
        ssl = list(sulci_side_list)
        self.sulci_side_list = ssl
        self.dict_sulci = {name: i for i, name in enumerate(ssl)}
        if "background" not in self.dict_sulci:
            self.dict_sulci["background"] = -1
        self.sslist = [
            ss
            for ss in ssl
            if not ss.startswith("unknown") and not ss.startswith("ventricle")
        ]

    def extract_data_from_graphs(self) -> None:
        """Build sulci_side_list / dict_bck2 / dict_names from the graphs
        (ref pattern_class.py:116-139)."""
        print("Creating sulci side list...")
        names_set = set()
        dict_bck2, dict_names = {}, {}
        for gfile in self.graphs:
            graph = read_graph(gfile)
            if self.trfile is not None:
                self.flt.translate(graph)
            data = extract_data(graph)
            dict_bck2[gfile] = np.asarray(data["bck2"]).tolist()
            dict_names[gfile] = np.asarray(data["names"]).tolist()
            names_set.update(dict_names[gfile])
        self._build_label_maps(sorted(names_set))
        print(len(self.sulci_side_list), " sulci detected")
        self.dict_bck2 = dict_bck2
        self.dict_names = dict_names

    # ------------------------------------------------------------------
    # model config autofill (ref pattern_class.py:141-175)
    # ------------------------------------------------------------------
    def fill_dict_model(self, dict_model: dict) -> dict:
        dict_model = dict(dict_model)
        dict_model.setdefault("in_channels", 1)
        if "out_channels" in dict_model:
            if isinstance(dict_model["out_channels"], str):
                with open(dict_model["out_channels"], "r") as f:
                    param = json.load(f)
                dict_model["out_channels"] = len(param["sulci_side_list"])
        else:
            with open(_DEFAULT_PARAMS[self.hemi], "r") as f:
                param = json.load(f)
            dict_model["out_channels"] = len(param["sulci_side_list"])
        dict_model.setdefault("final_sigmoid", False)
        dict_model.setdefault("interpolate", True)
        dict_model.setdefault("conv_layer_order", "crg")
        if "init_channel_number" not in dict_model and "num_filter" in dict_model:
            # saved params files carry the training-side key 'num_filter'
            # (ref pattern_class.py:318-343) while the loader reads
            # 'init_channel_number' (ref :348-368) — bridge the two so
            # saved models reload with their true width
            dict_model["init_channel_number"] = dict_model["num_filter"]
        dict_model.setdefault("init_channel_number", 64)
        dict_model.setdefault("model_file", _DEFAULT_MODELS[self.hemi])
        dict_model.setdefault("num_conv", 1)
        return dict_model

    def _make_model(self, out_channels: int, **over) -> UNet3D:
        kw = dict(
            in_channels=self.num_channel,
            out_channels=out_channels,
            final_sigmoid=self.final_sigmoid,
            interpolate=self.interpolate,
            conv_layer_order=self.conv_layer_order,
            init_channel_number=self.num_filter,
            num_conv=self.num_conv,
            dropout=self.dropout,
            compute_dtype=(
                jnp.bfloat16
                if self.tpu.compute_dtype == "bfloat16"
                else jnp.float32
            ),
            remat=self.tpu.remat,
            # Pallas pipeline: DP runs it per-device via the shard_map
            # steps; spatial sharding via the sp_axis clone inside
            # make_train_step_sp (parallel/sp_pallas.py halo exchange) —
            # the _cached_steps builder picks the right variant.  remat
            # composes: nn.remat replays the kernels over the PallasVol
            # pytree (bit-exact, tests/test_pallas.py)
            pallas_blocks=self.tpu.pallas_blocks,
            sp_shard_middle=self.tpu.sp_shard_middle,
            sp_shard_deep=self.tpu.sp_shard_deep,
        )
        kw.update(over)
        return UNet3D(**kw)

    def _apply_fn(self):
        from unetsulc_tpu.models.unet3d import make_apply_fn

        return make_apply_fn(self.model_def)

    # ------------------------------------------------------------------
    # inference (ref pattern_class.py:247-279)
    # ------------------------------------------------------------------
    def _labeling_dispatch(
        self,
        gfile: str,
        bck2=None,
        names=None,
        imgsize=None,
    ) -> dict:
        """Voxelize + dispatch the labeling forward WITHOUT fetching.

        Returns a handle dict whose device arrays are still in flight
        (jax dispatch is asynchronous): ``_labeling_fetch`` blocks on the
        device->host score transfer.  Splitting dispatch from fetch lets
        the threshold sweep overlap volume k+1's forward with volume k's
        ~130 ms tunnel fetch + host-side cutting (the device idles there
        in a serial loop)."""
        print("Labeling", gfile)
        if bck2 is None:
            bck2 = self.dict_bck2[gfile]
        if names is None:
            names = self.dict_names[gfile]
        bck2 = np.asarray(bck2)
        if imgsize is None and self.tpu.shape_buckets:
            # cubic shape bucket: a handful of compiled predict fns per
            # cohort instead of one per distinct graph extent (the
            # reference uses exact per-graph sizes, ref dataset.py:74-77;
            # zero padding only adds background voxels outside bck_T)
            from unetsulc_tpu.data.voxelize import bucket_size

            extent = int(np.max(bck2 - np.min(bck2, axis=0))) + 1
            b = bucket_size(extent)
            imgsize = (b, b, b)
        dataset = SulciDataset(
            [gfile],
            self.dict_sulci,
            train=False,
            translation_file=self.trfile,
            dict_bck2={gfile: bck2},
            dict_names={gfile: np.asarray(names)},
            img_size=imgsize,
        )
        vol_in, vol_lb = dataset[0]

        if "label" not in self._predict_fns:
            self._predict_fns["label"] = make_label_fn(
                self._apply_fn(), final_sigmoid=self.model_def.final_sigmoid
            )
        label_fn = self._predict_fns["label"]

        tr = np.min(bck2, axis=0)
        bck_t = np.asarray(bck2 - tr, dtype=np.int32)
        n = len(bck_t)
        # pad coords to a static bucket so the gather shape (and therefore
        # the executable) is reused across graphs; padded rows gather voxel
        # (0,0,0) and are sliced off below
        n_pad = max(4096, -(-n // 4096) * 4096)
        coords = np.zeros((3, n_pad), np.int32)
        coords[:, :n] = bck_t.T
        ypred_d, yscores_d = label_fn(
            self.params, vol_in[None], coords[0], coords[1], coords[2]
        )
        ytrue = vol_lb[bck_t[:, 0], bck_t[:, 1], bck_t[:, 2]].tolist()
        return {
            "ypred_d": ypred_d,
            "yscores_d": yscores_d,
            "n": n,
            "ytrue": ytrue,
        }

    @staticmethod
    def _labeling_fetch(handle: dict, fetch_scores: bool = True):
        """Block on the device->host transfer of a dispatched labeling.

        ``fetch_scores=False`` leaves the (n_voxels x classes) score
        matrix on device (yscores is None): callers that only need the
        predicted labels — e.g. the evaluation CSV producer — skip the
        ~4 MB/volume transfer that dominates label latency on tunneled
        links."""
        n = handle["n"]
        ypred = np.asarray(handle["ypred_d"])[:n].tolist()
        if not fetch_scores:
            return handle["ytrue"], ypred, None
        # f16 transfer dtype (train/step.make_label_fn) -> f32 for cutting
        yscores = np.asarray(handle["yscores_d"])[:n].astype(np.float32)
        return handle["ytrue"], ypred, yscores

    def labeling(
        self,
        gfile: str,
        bck2=None,
        names=None,
        imgsize=None,
    ):
        """Label one graph; returns (ytrue, ypred, yscores)."""
        return self._labeling_fetch(
            self._labeling_dispatch(gfile, bck2, names, imgsize)
        )

    def _cut_labels_device(self, handle: dict, vert, bck2, thresholds):
        """Device-voted cutting for a dispatched labeling: (T, n) per-voxel
        label ids, one row per threshold — ``cutting()`` results computed
        without fetching the score matrix.

        The host fetches only the per-voxel argmax (to run the
        geometry-only re-segmentation, ``cut_part_ids_multi``) and a
        (T, n_parts) vote table; the summed-score argmax vote runs on
        device where the scores already live (train/step.py
        ``make_vote_fn``).  Exact-equality parity with the host path is
        pinned by test_ops.py::test_device_vote_matches_host_cutting."""
        n = handle["n"]
        thresholds = list(thresholds)
        ypred = np.asarray(handle["ypred_d"])[:n]
        # (T, n) dense part ids; the per-(fold,label) components are
        # shared across the sweep's thresholds
        parts = cut_part_ids_multi(ypred, vert, bck2, thresholds)
        if not thresholds:
            return parts  # (0, n)
        # bucket the part-axis so the jitted vote executable is reused
        # across graphs; padded voxel rows -> dump segment
        p_pad = max(128, -(-(int(parts.max()) + 1) // 128) * 128)
        n_pad = int(handle["yscores_d"].shape[0])
        pid = np.full((len(parts), n_pad), p_pad, np.int32)
        pid[:, :n] = parts
        if "vote" not in self._predict_fns:
            self._predict_fns["vote"] = make_vote_fn()
        votes = np.asarray(
            self._predict_fns["vote"](
                handle["yscores_d"], jnp.asarray(pid), p_pad
            )
        )  # (T, p_pad) per-part label ids
        return np.stack([votes[t, parts[t]] for t in range(len(parts))])

    # ------------------------------------------------------------------
    # threshold sweep (ref pattern_class.py:177-245)
    # ------------------------------------------------------------------
    def test_thresholds(
        self,
        gfile_list_test: Sequence[str],
        gfile_list_notcut_test: Sequence[str],
        threshold_range: Sequence[int],
        save_results: bool = True,
    ) -> None:
        print("test thresholds")
        since = time.time()
        for th in threshold_range:
            self.dict_scores[th] = []

        def finish(item) -> None:
            """Fetch one dispatched volume's results and run its sweep.

            Runs one volume BEHIND the dispatch loop, so the device
            computes volume k+1's forward during volume k's fetch and
            host-side cutting — the reference labels strictly serially
            (ref pattern_class.py:177-245); scores and results are
            identical, only the idle time goes.

            With ``tpu.device_vote`` (default) the score matrix never
            leaves the device: the host fetches the small per-voxel
            ``ypred``, computes each threshold's re-segmentation
            (``cut_part_ids`` — geometry only), and the per-part score
            vote runs on device (``make_vote_fn``), so only a
            (T, n_parts) vote table crosses the link instead of the
            ~4 MB/volume score transfer that dominates tunnel latency
            (BASELINE.md).  ``device_vote: false`` keeps the
            reference-shaped path (fetch scores, vote on host)."""
            gfile, gfile_notcut, host, handle = item
            nbck, bck2, names, nbck_notcut, vert_notcut = host

            if len(nbck) != len(nbck_notcut):
                # alignment impossible (ref pattern_class.py:220-225)
                print()
                print(
                    "ERROR no matches between %s and %s" % (gfile, gfile_notcut)
                )
                print("--- Files ignored to fix the threshold")
                print()
                return

            # align cut <-> uncut voxels by lexicographic order on native
            # coords (ref pattern_class.py:204-227, pandas sort_values);
            # np.lexsort keys are (last key primary) so pass (z, y, x).
            order_cut = np.lexsort((nbck[:, 2], nbck[:, 1], nbck[:, 0]))
            order_uncut = np.lexsort(
                (nbck_notcut[:, 2], nbck_notcut[:, 1], nbck_notcut[:, 0])
            )
            vert_aligned = np.empty(len(nbck), dtype=vert_notcut.dtype)
            vert_aligned[order_cut] = vert_notcut[order_uncut]

            if len(threshold_range) == 0:
                # nothing to sweep (e.g. a resumed fold whose thresholds
                # are already recorded); don't fetch anything
                return

            if self.tpu.device_vote:
                per_th_ids = self._cut_labels_device(
                    handle, vert_aligned, bck2, threshold_range
                )
            else:
                _, _, yscores = self._labeling_fetch(handle)
                per_th_ids = (
                    cutting(yscores, vert_aligned, bck2, threshold)
                    for threshold in threshold_range
                )

            for threshold, ypred_cut_ids in zip(threshold_range, per_th_ids):
                ypred_cut = [self.sulci_side_list[y] for y in ypred_cut_ids]
                self.dict_scores[threshold].append(
                    (1 - esi_score(names, ypred_cut, self.sslist)) * 100
                )

        pending = []
        for gfile, gfile_notcut in zip(gfile_list_test, gfile_list_notcut_test):
            # dispatch first: the device works on this volume while the
            # host reads/extracts the graph pair below
            handle = self._labeling_dispatch(gfile)

            graph = read_graph(gfile)
            if self.trfile is not None:
                self.flt.translate(graph)
            data = extract_data(graph)
            nbck = np.asarray(data["nbck"])
            bck2 = np.asarray(data["bck2"])
            names = np.asarray(data["names"])

            graph_notcut = read_graph(gfile_notcut)
            if self.trfile is not None:
                self.flt.translate(graph_notcut)
            data_notcut = extract_data(graph_notcut)
            nbck_notcut = np.asarray(data_notcut["nbck"])
            vert_notcut = np.asarray(data_notcut["vert"])

            pending.append((
                gfile, gfile_notcut,
                (nbck, bck2, names, nbck_notcut, vert_notcut), handle,
            ))
            if len(pending) > 1:
                finish(pending.pop(0))
        for item in pending:
            finish(item)

        if save_results:
            for th, sc in self.dict_scores.items():
                if th in self.results["threshold_scores"]:
                    self.results["threshold_scores"][th].append(sc)
                else:
                    self.results["threshold_scores"][th] = [sc]

        elapsed = time.time() - since
        print(
            "Cutting complete in {:.0f}m {:.0f}s".format(
                elapsed // 60, elapsed % 60
            )
        )

    # ------------------------------------------------------------------
    # persistence (ref pattern_class.py:281-343)
    # ------------------------------------------------------------------
    def save_data(self, name: Optional[str] = None) -> None:
        os.makedirs(op.join(self.working_path, "data"), exist_ok=True)
        if name is None:
            path = op.join(
                self.working_path, "data", self.model_name + ".json"
            )
        else:
            path = op.join(self.working_path, "data", name + "_data.json")
        data = {
            "dict_bck2": {
                k: np.asarray(v).tolist() for k, v in self.dict_bck2.items()
            },
            "dict_names": {
                k: np.asarray(v).tolist() for k, v in self.dict_names.items()
            },
            "sulci_side_list": self.sulci_side_list,
        }
        with open(path, "w") as f:
            json.dump(data, f)
        print("Data saved")

    def save_model(self, name: Optional[str] = None) -> None:
        os.makedirs(op.join(self.working_path, "models"), exist_ok=True)
        if name is None:
            path = op.join(
                self.working_path, "models", self.model_name + "_model.mdsm"
            )
        else:
            os.makedirs(
                op.join(self.working_path, "models", self.model_name),
                exist_ok=True,
            )
            path = op.join(
                self.working_path,
                "models",
                self.model_name,
                name + "_model.mdsm",
            )
        state = state_dict_from_params(jax.tree.map(np.asarray, self.params))
        write_state_dict(state, path)
        print("Model saved")

    def save_results(self, name: Optional[str] = None) -> None:
        os.makedirs(op.join(self.working_path, "results"), exist_ok=True)
        fname = (name or self.model_name) + "_results.json"
        with open(op.join(self.working_path, "results", fname), "w") as f:
            json.dump(self.results, f)
        print("Results saved")

    def save_params(
        self, best_threshold=None, name: Optional[str] = None
    ) -> None:
        os.makedirs(op.join(self.working_path, "models"), exist_ok=True)
        if name is not None:
            self.dict_model["model_file"] = op.join(
                self.working_path,
                "models",
                self.model_name,
                name + "_model.mdsm",
            )
        else:
            self.dict_model["model_file"] = op.join(
                self.working_path, "models", self.model_name + "_model.mdsm"
            )
        self.dict_model["out_channels"] = len(self.sulci_side_list)
        params = {
            "dict_bck2": {
                k: np.asarray(v).tolist() for k, v in self.dict_bck2.items()
            },
            "dict_names": {
                k: np.asarray(v).tolist() for k, v in self.dict_names.items()
            },
            "sulci_side_list": self.sulci_side_list,
            "dict_model": self.dict_model,
        }
        if best_threshold is not None:
            params["cutting_threshold"] = best_threshold
        if os.path.exists(op.join(self.working_path, "models", self.model_name)):
            base = op.join(self.working_path, "models", self.model_name)
        else:
            base = op.join(self.working_path, "models")
        fname = (name or self.model_name) + "_params.json"
        with open(op.join(base, fname), "w") as f:
            json.dump(params, f)
        print("Parameters saved")

    def reset_results(self) -> None:
        self.results = {}

    # ------------------------------------------------------------------
    # checkpoint loading (ref pattern_class.py:348-368)
    # ------------------------------------------------------------------
    def load_saved_model(self, dict_model: dict) -> None:
        dict_model = self.fill_dict_model(dict_model)
        self.model_def = self._make_model(
            out_channels=dict_model["out_channels"],
            in_channels=dict_model["in_channels"],
            final_sigmoid=dict_model["final_sigmoid"],
            interpolate=dict_model["interpolate"],
            conv_layer_order=dict_model["conv_layer_order"],
            init_channel_number=dict_model["init_channel_number"],
            num_conv=dict_model["num_conv"],
        )
        state = read_state_dict(dict_model["model_file"])
        self.params = params_from_state_dict(state)
        self._predict_fns = {}
        print("Model Loaded !")
