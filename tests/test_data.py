"""Data layer: extraction contract, geometry, voxelization, datasets."""

import math

import numpy as np

from unetsulc_tpu.data.dataset import PatternDataset, SulciDataset
from unetsulc_tpu.data.extract import extract_data
from unetsulc_tpu.data.geometry import (
    apply_bounding_box,
    augment_points,
    rotation_matrix,
    rotation_size_bound,
)
from unetsulc_tpu.data.voxelize import bucket_shape, names_to_ids, voxelize
from unetsulc_tpu.io.container import save_graph_npz


def test_extract_contract(graph):
    """Per-point oracle for the extraction contract (nbck/bck/bck2/vert/names)."""
    data = extract_data(graph)
    n = graph.npoints()
    assert len(data["nbck"]) == n
    assert len(data["bck"]) == n
    assert len(data["bck2"]) == n
    assert len(data["vert"]) == n
    assert len(data["names"]) == n

    tal = graph.talairach_transform()
    vs = np.asarray(graph["voxel_size"])
    i = 0
    for vertex in graph.vertices():
        for bt in ("aims_ss", "aims_bottom", "aims_other"):
            if bt not in vertex.buckets:
                continue
            for point in np.asarray(vertex.buckets[bt]):
                np.testing.assert_array_equal(data["nbck"][i], point)
                p1 = tal.transform(point * vs)
                np.testing.assert_allclose(data["bck"][i], p1)
                expected_bck2 = [int(round(p1[k] / 2)) for k in range(3)]
                np.testing.assert_array_equal(data["bck2"][i], expected_bck2)
                assert data["vert"][i] == vertex.index
                assert data["names"][i] == (vertex.name or "unknown")
                i += 1
    assert i == n


def test_extract_flip(graph):
    a = extract_data(graph, flip=False)
    b = extract_data(graph, flip=True)
    np.testing.assert_array_equal(a["nbck"][:, 0], -b["nbck"][:, 0])
    np.testing.assert_array_equal(a["nbck"][:, 1:], b["nbck"][:, 1:])


def test_rotation_matrix_properties():
    r = rotation_matrix(math.pi / 2, [0, 0, 1], [1, 0, 0])
    np.testing.assert_allclose(r @ [0, 0, 0, 1], [1, -1, 0, 1], atol=1e-12)
    # rotation is orthonormal
    rr = rotation_matrix(0.3, [1, 2, 3])[:3, :3]
    np.testing.assert_allclose(rr @ rr.T, np.eye(3), atol=1e-12)


def test_augment_points_semantics():
    rng = np.random.default_rng(3)
    pts = rng.integers(0, 30, size=(100, 3))
    out = augment_points(pts, math.pi / 16, rng)
    assert out.dtype.kind == "i"
    assert np.all(out.min(axis=0) == 0)  # re-translated to origin
    # small rotation keeps the point count
    assert len(out) == len(pts)


def test_rotation_size_bound_holds():
    """The analytic bound dominates the empirical augmented extent."""
    base_rng = np.random.default_rng(5)
    pts = base_rng.integers(0, 40, size=(200, 3))
    pts -= pts.min(axis=0)
    bound = rotation_size_bound(pts, math.pi / 16)
    for seed in range(200):
        out = augment_points(pts, math.pi / 16, np.random.default_rng(seed))
        size = out.max(axis=0) + 1
        assert np.all(size <= bound), (size, bound)


def test_apply_bounding_box():
    pts = np.array([[0, 0, 0], [5, 5, 5], [10, 10, 10]])
    bb = np.array([[0, 6], [0, 6], [0, 6]])
    inbox, idx = apply_bounding_box(pts, bb)
    np.testing.assert_array_equal(idx, [0, 1])
    np.testing.assert_array_equal(inbox, pts[:2])


def test_voxelize():
    bck2 = np.array([[0, 0, 0], [2, 3, 4], [2, 3, 4]])
    ids = np.array([1, 2, 3])
    vol_in, vol_lb = voxelize(bck2, ids)
    assert vol_in.shape == (3, 4, 5, 1)
    assert vol_lb.shape == (3, 4, 5)
    assert vol_in[0, 0, 0, 0] == 1.0
    assert vol_lb[0, 0, 0] == 1
    assert vol_lb[2, 3, 4] == 3  # later scatter wins (torch semantics)
    assert (vol_lb == -1).sum() == 3 * 4 * 5 - 2
    # fixed img_size pads with zeros / background
    vol_in2, vol_lb2 = voxelize(bck2, ids, img_size=(8, 8, 8))
    assert vol_in2.shape == (8, 8, 8, 1)
    assert vol_in2.sum() == 2
    assert (vol_lb2 != -1).sum() == 2


def test_bucket_shape():
    assert bucket_shape((30, 33, 64)) == (32, 48, 64)
    assert bucket_shape((300, 10, 257)) == (320, 32, 288)


def test_sulci_dataset(graph, tmp_path):
    p = str(tmp_path / "g.npz")
    save_graph_npz(graph, p)
    labels = graph.label_set()
    dict_sulci = {n: i for i, n in enumerate(labels)}
    ds = SulciDataset([p], dict_sulci, train=False)
    vol_in, vol_lb = ds[0]
    assert vol_in.ndim == 4 and vol_in.shape[-1] == 1
    assert vol_lb.shape == vol_in.shape[:3]
    # occupancy and labels agree
    np.testing.assert_array_equal(vol_in[..., 0] > 0, vol_lb != -1)
    # cache was populated (ref dataset.py:45-62 behavior)
    assert p in ds.dict_bck2 and p in ds.dict_names

    # train mode augmentation is deterministic per (seed, epoch, index)
    ds_tr = SulciDataset([p], dict_sulci, train=True, seed=1)
    a1, _ = ds_tr[0]
    a2, _ = ds_tr[0]
    np.testing.assert_array_equal(a1, a2)
    ds_tr.set_epoch(1)
    a3, _ = ds_tr[0]
    assert a3.shape != a1.shape or not np.array_equal(a3, a1)


def test_sulci_dataset_fixed_size(graph, tmp_path):
    p = str(tmp_path / "g.npz")
    save_graph_npz(graph, p)
    dict_sulci = {n: i for i, n in enumerate(graph.label_set())}
    ds = SulciDataset([p], dict_sulci, train=False, img_size=(64, 64, 64))
    vol_in, vol_lb = ds[0]
    assert vol_in.shape == (64, 64, 64, 1)
    assert vol_lb.shape == (64, 64, 64)
    size = ds.max_image_size()
    assert np.all(size <= 64)


def test_pattern_dataset(graph, tmp_path):
    p = str(tmp_path / "L_subject.npz")
    save_graph_npz(graph, p)
    bb = [[0, 31], [0, 31], [0, 31]]
    ds = PatternDataset([p], pattern="S.C.", bb=bb, train=False)
    vol, label = ds[0]
    assert vol.shape == (32, 32, 32, 1)
    assert label == 1  # the fixture contains S.C._left folds
    ds2 = PatternDataset([p], pattern="NOPE", bb=bb, train=False)
    _, label2 = ds2[0]
    assert label2 == 0


def test_names_to_ids():
    ids = names_to_ids(np.array(["a", "b", "a"]), {"a": 0, "b": 1})
    np.testing.assert_array_equal(ids, [0, 1, 0])


def test_exact_size_scan_covers_stream(graph, tmp_path):
    """max_image_size(num_epochs) is exact: every augmented sample fits and
    the bound is attained (not loose)."""
    p = str(tmp_path / "g.npz")
    save_graph_npz(graph, p)
    dict_sulci = {n: i for i, n in enumerate(graph.label_set())}
    ds = SulciDataset([p], dict_sulci, train=True, seed=9)
    num_epochs = 4
    size = ds.max_image_size(num_epochs=num_epochs)
    attained = np.zeros(3, int)
    for epoch in range(num_epochs):
        ds.set_epoch(epoch)
        vol_in, _ = ds[0]
        assert np.all(np.asarray(vol_in.shape[:3]) <= size)
        attained = np.maximum(attained, vol_in.shape[:3])
    np.testing.assert_array_equal(attained, size)
    # analytic bound dominates the exact scan
    loose = ds.max_image_size()
    assert np.all(loose >= size)


def test_grain_loader(graph, tmp_path):
    """Optional grain pipeline yields the same samples as direct access."""
    import pytest

    grain = pytest.importorskip("grain")
    from unetsulc_tpu.data.grain_pipeline import make_grain_loader

    p = str(tmp_path / "g.npz")
    save_graph_npz(graph, p)
    dict_sulci = {n: i for i, n in enumerate(graph.label_set())}
    ds = SulciDataset([p, p], dict_sulci, train=False)
    loader = make_grain_loader(ds, img_size=(48, 48, 48), batch_size=2)
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b["inputs"].shape == (2, 48, 48, 48, 1)
    assert b["labels"].shape == (2, 48, 48, 48)
    direct_in, direct_lb = ds[0]
    np.testing.assert_array_equal(b["inputs"][0], direct_in)
    np.testing.assert_array_equal(b["labels"][0], direct_lb)


def test_device_iterator_propagates_errors(graph, tmp_path):
    """Exceptions in the prefetch thread surface in the consumer."""
    import pytest

    from unetsulc_tpu.data.pipeline import device_iterator

    def bad_batches():
        yield from ()
        raise RuntimeError("boom")  # pragma: no cover

    def bad_gen():
        from unetsulc_tpu.data.pipeline import Batch

        yield Batch(
            inputs=np.zeros((1, 4, 4, 4, 1), np.float32),
            labels=np.full((1, 4, 4, 4), -1, np.int32),
            real=1,
        )
        raise RuntimeError("voxelization failed")

    it = device_iterator(bad_gen(), prefetch=2)
    next(it)
    with pytest.raises(RuntimeError, match="voxelization failed"):
        list(it)
