"""Pattern classifier: the PatternDataset workflow end to end."""

import numpy as np

from unetsulc_tpu.data.dataset import PatternDataset
from unetsulc_tpu.io.container import save_graph_npz
from unetsulc_tpu.io.graph import make_synthetic_graph
from unetsulc_tpu.models.pattern_cnn import train_pattern_classifier


def test_pattern_classifier_learns(tmp_path):
    """Classifier separates graphs with vs without the target pattern."""
    from unetsulc_tpu.io.graph import Vertex

    files, labels = [], []
    for i in range(12):
        has_pattern = i % 2 == 0
        rng = np.random.default_rng(i)
        g = make_synthetic_graph(
            rng, ["F.C.M._left"], n_folds_per_label=2,
            points_per_fold=60, extent=30,
        )
        if has_pattern:
            # spatially localized pattern: a dense blob near one corner
            blob = rng.integers(2, 10, size=(80, 3)).astype(np.int32)
            g.add_vertex(Vertex(index=99, name="S.C._left",
                                buckets={"aims_ss": blob}))
        p = str(tmp_path / f"L_subj{i}.npz")
        save_graph_npz(g, p)
        files.append(p)
        labels.append(int(has_pattern))

    bb = [[0, 31], [0, 31], [0, 31]]
    train_ds = PatternDataset(files, pattern="S.C.", bb=bb, train=True)
    # eval = same graphs without augmentation: a memorization check that
    # exercises the full pipeline (12 random synthetic subjects are too
    # few to demand generalization)
    eval_ds = PatternDataset(files, pattern="S.C.", bb=bb, train=False)
    # dataset labels must match construction
    for i in range(12):
        _, y = train_ds[i]
        assert y == labels[i]

    model, params, hist = train_pattern_classifier(
        train_ds, num_epochs=30, lr=3e-3, batch_size=4,
        channels=(8, 16), eval_dataset=eval_ds,
    )
    assert hist["loss"][-1] < hist["loss"][0]
    assert max(hist["eval_acc"]) >= 0.9
