"""Ops: ESI score + confusion counts, masked CE, cutting."""

import jax.numpy as jnp
import numpy as np
import pytest

from unetsulc_tpu.ops.cutting import cutting
from unetsulc_tpu.ops.esi import (
    confusion_counts,
    esi_from_counts,
    esi_score,
)
from unetsulc_tpu.ops.losses import cross_entropy_ignore


def test_esi_score_basics():
    y = [0, 0, 1, 1, 2]
    assert esi_score(y, y, [0, 1, 2]) == 0.0
    # one label fully wrong: E_local(0)=1 (FN), E_local(1) gets FP
    yp = [1, 1, 1, 1, 2]
    # label 0: TP=0 FP=0 FN=2 -> 1.0 ; label 1: TP=2 FP=2 FN=0 -> 2/6 ; label 2: 0
    expected = (1.0 + 2 / 6 + 0.0) / 3
    assert esi_score(y, yp, [0, 1, 2]) == pytest.approx(expected)
    # absent labels contribute 0
    assert esi_score(y, y, [0, 1, 2, 7]) == 0.0
    # works with string labels (threshold sweep path)
    assert esi_score(["a", "b"], ["a", "a"], ["a", "b"]) == pytest.approx(
        (1 / 3 + 1.0) / 2
    )


def test_confusion_counts_matches_esi_score():
    rng = np.random.default_rng(0)
    y_true = rng.integers(-1, 5, size=(2, 8, 8, 8))
    y_pred = rng.integers(0, 5, size=(2, 8, 8, 8))
    counts = np.asarray(
        confusion_counts(jnp.asarray(y_true), jnp.asarray(y_pred), 5)
    )
    sslist = [0, 2, 3]
    valid = y_true != -1
    direct = esi_score(y_true[valid], y_pred[valid], sslist)
    assert esi_from_counts(counts, sslist) == pytest.approx(direct)
    # counts are additive across batches (epoch accumulation)
    c1 = np.asarray(
        confusion_counts(jnp.asarray(y_true[:1]), jnp.asarray(y_pred[:1]), 5)
    )
    c2 = np.asarray(
        confusion_counts(jnp.asarray(y_true[1:]), jnp.asarray(y_pred[1:]), 5)
    )
    np.testing.assert_array_equal(c1 + c2, counts)


def test_cross_entropy_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 6, 5, 4, 7)).astype(np.float32)
    labels = rng.integers(-1, 7, size=(2, 6, 5, 4))
    ours = float(
        cross_entropy_ignore(jnp.asarray(logits), jnp.asarray(labels))
    )
    lt = torch.from_numpy(logits).permute(0, 4, 1, 2, 3)
    theirs = torch.nn.functional.cross_entropy(
        lt, torch.from_numpy(labels), ignore_index=-1
    )
    assert ours == pytest.approx(float(theirs), rel=1e-5)


def test_cross_entropy_all_background():
    logits = jnp.zeros((1, 2, 2, 2, 3))
    labels = -jnp.ones((1, 2, 2, 2), jnp.int32)
    assert float(cross_entropy_ignore(logits, labels)) == 0.0


def _scores(pred_ids, n_classes, margin=5.0):
    s = np.zeros((len(pred_ids), n_classes))
    s[np.arange(len(pred_ids)), pred_ids] = margin
    return s


def test_cutting_no_cut_majority_vote():
    """A fold whose minority label is below threshold is relabelled whole."""
    pts = np.stack([np.arange(10), np.zeros(10), np.zeros(10)], 1).astype(int)
    preds = np.array([0] * 7 + [1] * 3)
    out = cutting(_scores(preds, 3), np.zeros(10, int), pts, threshold=5)
    np.testing.assert_array_equal(out, 0)


def test_cutting_splits_fold():
    """Two big spatially separated label groups -> fold is cut."""
    pts = np.concatenate(
        [
            np.stack([np.arange(6), np.zeros(6), np.zeros(6)], 1),
            np.stack([np.arange(6) + 20, np.zeros(6), np.zeros(6)], 1),
        ]
    ).astype(int)
    preds = np.array([0] * 6 + [1] * 6)
    out = cutting(_scores(preds, 3), np.zeros(12, int), pts, threshold=5)
    np.testing.assert_array_equal(out[:6], 0)
    np.testing.assert_array_equal(out[6:], 1)


def test_cutting_minority_attached_to_nearest_part():
    pts = np.concatenate(
        [
            np.stack([np.arange(6), np.zeros(6), np.zeros(6)], 1),
            np.stack([np.arange(6) + 20, np.zeros(6), np.zeros(6)], 1),
            np.array([[26, 0, 0]]),  # minority voxel adjacent to 2nd part
        ]
    ).astype(int)
    preds = np.array([0] * 6 + [1] * 6 + [2])
    out = cutting(_scores(preds, 3), np.zeros(13, int), pts, threshold=5)
    assert out[-1] == 1  # swallowed by the nearest surviving part
    np.testing.assert_array_equal(out[:6], 0)


def test_cutting_respects_folds():
    """Voxels of different elementary folds never mix."""
    pts = np.stack([np.arange(12), np.zeros(12), np.zeros(12)], 1).astype(int)
    vert = np.array([0] * 6 + [1] * 6)
    preds = np.array([0] * 6 + [1] * 6)
    out = cutting(_scores(preds, 3), vert, pts, threshold=100)
    np.testing.assert_array_equal(out[:6], 0)
    np.testing.assert_array_equal(out[6:], 1)


def test_resize_matmul_equals_gather():
    from unetsulc_tpu.ops.resize import resize_trilinear

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 5, 9, 6, 4)).astype(np.float32))
    a = resize_trilinear(x, (9, 17, 11), use_matmul=True)
    b = resize_trilinear(x, (9, 17, 11), use_matmul=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_resize_buf_matches_unpadded():
    """Buffer-native resize == unpad -> resize -> repad (incl. zero pads)."""
    from unetsulc_tpu.ops import conv_pallas as cp
    from unetsulc_tpu.ops.resize import resize_trilinear, resize_trilinear_buf

    rng = np.random.default_rng(7)
    g_in = cp.make_geom(5, 9, 6)
    g_out = cp.make_geom(9, 17, 11)
    x = jnp.asarray(rng.normal(size=(1, 5, 9, 6, 8)).astype(np.float32))
    buf = cp.pad_to_geom(x, g_in)
    got = resize_trilinear_buf(buf, g_in, g_out)
    want = cp.pad_to_geom(
        resize_trilinear(x, (g_out.X, g_out.Y, g_out.Z)), g_out,
        cs=buf.shape[-1],
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_cutting_large_fold_kdtree_path():
    """The KD-tree nearest-assignment path (big folds) matches semantics."""
    rng = np.random.default_rng(0)
    # two big separated clusters + 200 stragglers near cluster 2
    a = rng.integers(0, 10, size=(3000, 3))
    b = rng.integers(50, 60, size=(3000, 3))
    minority = rng.integers(48, 52, size=(200, 3))
    pts = np.concatenate([a, b, minority])
    preds = np.array([0] * 3000 + [1] * 3000 + [2] * 200)
    out = cutting(_scores(preds, 3), np.zeros(len(pts), int), pts, threshold=1000)
    assert set(out[:3000]) == {0}
    assert set(out[3000:6000]) == {1}
    # minority voxels swallowed by the nearest big part (cluster b)
    assert set(out[6000:]) == {1}


def test_resize_nearest_matches_torch():
    torch = pytest.importorskip("torch")
    from unetsulc_tpu.ops.resize import resize_nearest

    x = np.random.default_rng(5).normal(size=(1, 4, 6, 5, 3)).astype(np.float32)
    target = (9, 12, 7)
    ours = np.asarray(resize_nearest(jnp.asarray(x), target))
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    theirs = (
        torch.nn.functional.interpolate(xt, size=target, mode="nearest")
        .permute(0, 2, 3, 4, 1)
        .numpy()
    )
    np.testing.assert_array_equal(ours, theirs)


# ---------------------------------------------------------------------------
# CONTRACTS.md golden fixtures — hand-computed from the pinned semantics,
# NOT generated by this implementation.  Each test names the CONTRACTS.md
# decision row it enforces.
# ---------------------------------------------------------------------------


def _fold(coords_scores):
    """Build (yscores, vert, bck2) for ONE fold from [(xyz, scores), ...]."""
    bck2 = np.array([c for c, _ in coords_scores], dtype=np.int64)
    yscores = np.array([s for _, s in coords_scores], dtype=np.float64)
    vert = np.full(len(bck2), 7, dtype=np.int64)
    return yscores, vert, bck2


def test_contract_threshold_boundary():
    """C1: count == threshold CUTS (>=); count == threshold-1 does not."""
    a = [((x, 0, 0), (0.90, 0.05, 0.05)) for x in range(5)]      # class 0 x5
    b = [((x, 0, 0), (0.05, 0.90, 0.05)) for x in (10, 11, 12)]  # class 1 x3
    yscores, vert, bck2 = _fold(a + b)

    # threshold 3: class1 count (3) reaches it -> cut into two parts
    out = cutting(yscores, vert, bck2, threshold=3)
    np.testing.assert_array_equal(out, [0] * 5 + [1] * 3)

    # threshold 4: class1 count (3) below it -> NOT cut; whole-fold score
    # vote: class0 sum 4.65 beats class1 sum 2.95
    out = cutting(yscores, vert, bck2, threshold=4)
    np.testing.assert_array_equal(out, [0] * 8)


def test_contract_score_vote_beats_count_vote():
    """C2: the relabelling vote is argmax of SUMMED yscores, not of voxel
    counts.  3 weak class-0 voxels vs 2 strong class-1 voxels:
    counts 3-2 favour class 0, score sums 1.3 vs 2.85 favour class 1."""
    vox = [
        ((0, 0, 0), (0.40, 0.35, 0.25)),
        ((1, 0, 0), (0.40, 0.35, 0.25)),
        ((2, 0, 0), (0.40, 0.35, 0.25)),
        ((3, 0, 0), (0.05, 0.90, 0.05)),
        ((4, 0, 0), (0.05, 0.90, 0.05)),
    ]
    yscores, vert, bck2 = _fold(vox)
    out = cutting(yscores, vert, bck2, threshold=100)  # no cut possible
    np.testing.assert_array_equal(out, [1] * 5)


def test_contract_single_label_two_clusters_not_cut():
    """C4: one argmax label in two disconnected clusters is NOT cut —
    cutting keys on label disagreement, not spatial components."""
    c1 = [((x, 0, 0), (0.8, 0.1, 0.1)) for x in range(3)]
    c2 = [((x, 0, 0), (0.8, 0.1, 0.1)) for x in (20, 21, 22)]
    yscores, vert, bck2 = _fold(c1 + c2)
    out = cutting(yscores, vert, bck2, threshold=2)
    np.testing.assert_array_equal(out, [0] * 6)


def test_contract_minority_flips_part_vote():
    """C5: sub-threshold minority voxels join their nearest part BEFORE the
    vote and can flip it.  Part B (3 weak class-1 voxels, sum 1.5) absorbs
    2 strong class-2 voxels (sum 1.9 + B's own 1.35 class-2 mass) ->
    the merged part votes class 2 even though class 2 never reached the
    threshold on its own."""
    part_a = [((x, 0, 0), (0.90, 0.05, 0.05)) for x in range(3)]
    part_b = [((x, 0, 0), (0.05, 0.50, 0.45)) for x in (10, 11, 12)]
    minority = [((x, 0, 0), (0.02, 0.03, 0.95)) for x in (13, 14)]
    yscores, vert, bck2 = _fold(part_a + part_b + minority)
    out = cutting(yscores, vert, bck2, threshold=3)
    # A-part: class0.  B-part + minority: class2 sum = 3*0.45 + 2*0.95 =
    # 3.25 > class1 sum = 3*0.50 + 2*0.03 = 1.56.
    np.testing.assert_array_equal(out, [0] * 3 + [2] * 5)


def test_contract_esi_absent_label_counts_in_mean():
    """E2: a label absent from BOTH y_true and y_pred contributes 0 error
    but stays in the mean's denominator.
    A: TP=1 FN=1 -> 1/3.  B: TP=1 FP=1 -> 1/3.  C: absent -> 0.
    ESI = (1/3 + 1/3 + 0)/3 = 2/9."""
    esi = esi_score(["A", "A", "B"], ["A", "B", "B"], ["A", "B", "C"])
    assert esi == pytest.approx(2.0 / 9.0)


def test_max_pool_3d_matches_torch_incl_tie_gradients():
    """ops.pooling.max_pool_3d: forward AND backward bit-match torch's
    MaxPool3d(2, stride=2, padding=1).  Values are coarsely quantized so
    windows contain genuine ties — the custom VJP must route the cotangent
    to the first maximal element in (x, y, z) scan order, like torch (and
    like the select_and_scatter backward this op replaces)."""
    torch = pytest.importorskip("torch")
    import jax

    from unetsulc_tpu.ops.pooling import max_pool_3d

    rng = np.random.default_rng(11)
    for shape in [(1, 8, 8, 8, 4), (2, 9, 7, 5, 3)]:
        x = np.round(rng.standard_normal(shape) * 2) / 2  # force ties
        x = x.astype(np.float32)
        g = rng.standard_normal(
            (shape[0],) + tuple(d // 2 + 1 for d in shape[1:4]) + (shape[4],)
        ).astype(np.float32)

        out = np.asarray(max_pool_3d(jnp.asarray(x)))
        dx = np.asarray(
            jax.grad(lambda v: jnp.sum(max_pool_3d(v) * g))(jnp.asarray(x))
        )

        xt = torch.tensor(np.moveaxis(x, -1, 1), requires_grad=True)
        ot = torch.nn.MaxPool3d(2, stride=2, padding=1)(xt)
        ot.backward(torch.tensor(np.moveaxis(g, -1, 1)))
        np.testing.assert_array_equal(out, np.moveaxis(ot.detach().numpy(), 1, -1))
        np.testing.assert_array_equal(dx, np.moveaxis(xt.grad.numpy(), 1, -1))


def test_device_vote_matches_host_cutting():
    """The threshold sweep's device-side vote (cut_part_ids on host +
    make_vote_fn segment-sum argmax on device) must reproduce the public
    host ``cutting`` exactly — it is the same partition and the same
    summed-score vote, only the reduction runs where the scores already
    live (method/base.py test_thresholds device_vote path)."""
    from unetsulc_tpu.ops.cutting import cut_part_ids
    from unetsulc_tpu.train.step import make_vote_fn

    rng = np.random.default_rng(7)
    n, c = 500, 9
    logits = rng.normal(size=(n, c))
    yscores = (np.exp(logits) / np.exp(logits).sum(1, keepdims=True)).astype(
        np.float32
    )
    bck2 = rng.integers(0, 24, size=(n, 3))
    vert = rng.integers(0, 6, size=n)
    ypred = np.argmax(yscores, axis=1)
    ths = [2, 5, 20]

    parts = np.stack([cut_part_ids(ypred, vert, bck2, th) for th in ths])
    p_pad = max(128, -(-(int(parts.max()) + 1) // 128) * 128)
    n_pad = 512  # simulate the coord bucket: garbage score rows past n
    scores_pad = rng.normal(size=(n_pad, c)).astype(np.float32)
    scores_pad[:n] = yscores
    pid = np.full((len(ths), n_pad), p_pad, np.int32)
    pid[:, :n] = parts

    votes = np.asarray(
        make_vote_fn()(jnp.asarray(scores_pad), jnp.asarray(pid), p_pad)
    )
    assert votes.shape == (len(ths), p_pad)
    for t, th in enumerate(ths):
        expected = cutting(yscores, vert, bck2, th)
        np.testing.assert_array_equal(votes[t, parts[t]], expected)

    # TPU transfer dtype: the device holds f16 scores and derives BOTH
    # the partition argmax and the vote from them (make_label_fn casts
    # before the argmax — advisor r4 found the earlier f32-argmax
    # partition could diverge from host cutting's post-rounding argmax).
    # Force real rounding collapses: push each sampled voxel's top class
    # to within f16 eps BELOW its runner-up, so the f32 argmax (top
    # class) and the f16 argmax (tie -> lowest class id) genuinely
    # differ, then check partition+vote still match host cutting exactly.
    yscores_c = yscores.copy()
    order = np.argsort(yscores_c, axis=1)
    rows = np.nonzero(rng.random(n) < 0.3)[0]
    top, runner = order[rows, -1], order[rows, -2]
    yscores_c[rows, runner] = yscores_c[rows, top] - 1e-6
    scores16 = scores_pad.astype(np.float16)
    scores16[:n] = yscores_c.astype(np.float16)
    ypred16 = np.argmax(scores16[:n], axis=1)
    assert (ypred16 != np.argmax(yscores_c, axis=1)).any(), (
        "fixture failed to force an f16 argmax collapse"
    )
    parts16 = np.stack([cut_part_ids(ypred16, vert, bck2, th) for th in ths])
    p_pad16 = max(128, -(-(int(parts16.max()) + 1) // 128) * 128)
    pid16 = np.full((len(ths), n_pad), p_pad16, np.int32)
    pid16[:, :n] = parts16
    votes16 = np.asarray(
        make_vote_fn()(jnp.asarray(scores16), jnp.asarray(pid16), p_pad16)
    )
    for t, th in enumerate(ths):
        expected = cutting(scores16[:n], vert, bck2, th)
        np.testing.assert_array_equal(votes16[t, parts16[t]], expected)
