"""Test configuration: run JAX on a virtual 8-device CPU mesh.

SURVEY.md §4: CPU-backend mesh tests are the TPU-native analogue of a fake
backend — "multi-chip" logic runs on CPU with
``--xla_force_host_platform_device_count=8``.  Must be set before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from unetsulc_tpu.io.graph import make_synthetic_graph  # noqa: E402
from unetsulc_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()  # also re-asserts JAX_PLATFORMS=cpu (axon stomps it)

import jax  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()


LABELS = ["S.C._left", "S.T.s._left", "F.C.M._left", "unknown"]


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture()
def graph():
    return make_synthetic_graph(
        np.random.default_rng(7), LABELS[:3], n_folds_per_label=2,
        points_per_fold=60, extent=48,
    )


@pytest.fixture(scope="session")
def cohort_dir(tmp_path_factory):
    """A small on-disk cohort of synthetic graphs (npz) + cohort json."""
    import json

    from unetsulc_tpu.io.container import save_graph_npz

    root = tmp_path_factory.mktemp("cohort")
    (root / "cohorts").mkdir()
    subjects = []
    for i in range(6):
        g = make_synthetic_graph(
            np.random.default_rng(100 + i),
            LABELS,
            n_folds_per_label=2,
            points_per_fold=50,
            extent=40,
            unknown_fraction=0.2,
        )
        path = str(root / f"subj{i}_L.npz")
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
    cohort = {"name": "Synth6", "subjects": subjects}
    with open(root / "cohorts" / "cohort-Synth6_hemi-L.json", "w") as f:
        json.dump(cohort, f)
    return root
