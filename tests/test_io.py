"""Graph container round-trips, translation, and .mdsm interop."""

import numpy as np
import pytest

from unetsulc_tpu.io.container import (
    load_graph_json,
    load_graph_npz,
    save_graph_json,
    save_graph_npz,
)
from unetsulc_tpu.io.mdsm import read_state_dict, write_state_dict
from unetsulc_tpu.io.translation import FoldLabelsTranslator


def _graphs_equal(a, b):
    assert a.voxel_size == b.voxel_size
    va, vb = a.vertices(), b.vertices()
    assert len(va) == len(vb)
    for x, y in zip(va, vb):
        assert x.index == y.index and x.name == y.name
        assert set(x.buckets) == set(y.buckets)
        for bt in x.buckets:
            np.testing.assert_array_equal(x.buckets[bt], y.buckets[bt])
    np.testing.assert_allclose(a.talairach.matrix(), b.talairach.matrix())


def test_npz_roundtrip(graph, tmp_path):
    p = str(tmp_path / "g.npz")
    save_graph_npz(graph, p)
    _graphs_equal(graph, load_graph_npz(p))


def test_json_roundtrip(graph, tmp_path):
    p = str(tmp_path / "g.json")
    save_graph_json(graph, p)
    _graphs_equal(graph, load_graph_json(p))


def test_translation(graph, tmp_path):
    trl = tmp_path / "labels.trl"
    trl.write_text("# comment\nS.C._left  S.C.chimp_left\n")
    flt = FoldLabelsTranslator()
    flt.readLabels(str(trl))
    before = {v.index: v.name for v in graph.vertices()}
    flt.translate(graph)
    for v in graph.vertices():
        if before[v.index] == "S.C._left":
            assert v.name == "S.C.chimp_left"
        else:
            assert v.name == before[v.index]


def test_mdsm_roundtrip(tmp_path):
    state = {
        "encoders.0.double_conv.conv1.weight": np.random.default_rng(0)
        .normal(size=(32, 1, 3, 3, 3))
        .astype(np.float32),
        "encoders.0.double_conv.conv1.bias": np.zeros(32, np.float32),
        "final_conv.weight": np.ones((5, 64, 1, 1, 1), np.float32),
        "scalar_like": np.arange(10, dtype=np.int64),
    }
    p = str(tmp_path / "m.mdsm")
    write_state_dict(state, p)
    back = read_state_dict(p)
    assert set(back) == set(state)
    for k in state:
        np.testing.assert_array_equal(back[k], state[k])
        assert back[k].dtype == state[k].dtype


def test_mdsm_torch_cross_compat(tmp_path):
    """Our writer must be readable by stock torch.load and vice versa."""
    torch = pytest.importorskip("torch")
    state = {
        "w": np.random.default_rng(1).normal(size=(4, 3, 3, 3, 3)).astype(np.float32),
        "b": np.arange(4, dtype=np.float32),
    }
    ours = str(tmp_path / "ours.mdsm")
    write_state_dict(state, ours)
    loaded = torch.load(ours, map_location="cpu", weights_only=True)
    for k in state:
        np.testing.assert_array_equal(loaded[k].numpy(), state[k])

    theirs = str(tmp_path / "theirs.mdsm")
    torch.save({k: torch.from_numpy(v) for k, v in state.items()}, theirs)
    back = read_state_dict(theirs)
    for k in state:
        np.testing.assert_array_equal(back[k], state[k])


def test_mdsm_blocks_malicious_globals(tmp_path):
    """The restricted unpickler must refuse arbitrary-code pickles."""
    import pickle
    import zipfile

    evil = str(tmp_path / "evil.mdsm")
    with zipfile.ZipFile(evil, "w") as zf:
        zf.writestr(
            "archive/data.pkl",
            pickle.dumps({"x": __import__}, protocol=2),
        )
    with pytest.raises(Exception):
        read_state_dict(evil)


def test_arg_roundtrip(graph, tmp_path):
    """.arg text + .data/.bck round-trip (binar and ascii buckets)."""
    from unetsulc_tpu.io.arg_reader import load_graph_arg
    from unetsulc_tpu.io.arg_writer import save_graph_arg

    for ascii_mode in (False, True):
        p = str(tmp_path / f"g_{ascii_mode}.arg")
        save_graph_arg(graph, p, ascii_buckets=ascii_mode)
        back = load_graph_arg(p)
        assert back.voxel_size == graph.voxel_size
        np.testing.assert_allclose(
            back.talairach.matrix(), graph.talairach.matrix(), atol=1e-6
        )
        va, vb = graph.vertices(), back.vertices()
        assert [v.index for v in va] == [v.index for v in vb]
        assert [v.name for v in va] == [v.name for v in vb]
        for x, y in zip(va, vb):
            for bt in x.buckets:
                np.testing.assert_array_equal(x.buckets[bt], y.buckets[bt])


def test_arg_reader_via_read_graph(graph, tmp_path):
    from unetsulc_tpu.io.arg_writer import save_graph_arg
    from unetsulc_tpu.io.container import read_graph

    p = str(tmp_path / "g.arg")
    save_graph_arg(graph, p)
    back = read_graph(p)
    assert back.npoints() == graph.npoints()


def test_bck_int32_coords(tmp_path):
    """Reader auto-detects int32 coordinate width."""
    import struct

    from unetsulc_tpu.io.arg_reader import read_bck

    pts = np.array([[1000, -7, 40000]], np.int32)  # overflows int16
    p = str(tmp_path / "wide.bck")
    with open(p, "wb") as f:
        f.write(b"binar")
        f.write(struct.pack("<I", 0x41424344))
        f.write(struct.pack("<I", 4) + b"VOID")
        f.write(struct.pack("<4f", 1, 1, 1, 1))
        f.write(struct.pack("<I", 1))
        f.write(struct.pack("<II", 0, 1))
        f.write(pts.astype("<i4").tobytes())
    out = read_bck(p)
    np.testing.assert_array_equal(out[0], pts)


def test_save_data_legacy_name(tmp_path, graph):
    """save_data(name=None) uses the legacy '<model>.json' artifact name
    (ref transfer_learning/transfer_learning.py:519-524)."""
    import os.path as op

    from unetsulc_tpu.io.container import save_graph_npz
    from unetsulc_tpu.method.base import SulciLabeller

    p = str(tmp_path / "g.npz")
    save_graph_npz(graph, p)
    m = SulciLabeller(
        [p], "L", working_path=str(tmp_path), dict_model={"name": "Leg"}
    )
    m.extract_data_from_graphs()
    m.save_data()
    assert op.exists(op.join(str(tmp_path), "data", "Leg.json"))
    m.save_data(name="cohort-X_hemi-L")
    assert op.exists(
        op.join(str(tmp_path), "data", "cohort-X_hemi-L_data.json")
    )
