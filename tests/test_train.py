"""Train step: SGD parity with torch, freezing, controllers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unetsulc_tpu.train.controllers import DivideLr, EarlyStopping, FineTunning
from unetsulc_tpu.train.freeze import (
    merge,
    partition,
    torch_param_name,
    trainable_mask,
    trainable_names,
)
from unetsulc_tpu.train.step import TrainState, make_eval_step, make_train_step


def tiny_model():
    from unetsulc_tpu.models.unet3d import UNet3D

    return UNet3D(
        in_channels=1,
        out_channels=3,
        init_channel_number=8,
        compute_dtype=jnp.float32,
    )


def _setup(training_layers=None, lr=0.05, model=None):
    from unetsulc_tpu.models.unet3d import make_apply_fn

    model = model or tiny_model()
    x = jnp.zeros((1, 8, 8, 8, 1))
    params = model.init(jax.random.key(0), x, train=True)["params"]
    apply_fn = make_apply_fn(model)
    state = TrainState.create(params, lr=lr, training_layers=training_layers)
    step = make_train_step(apply_fn, num_classes=3, momentum=0.9, donate=False)
    return model, params, state, step, apply_fn


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    inputs = (rng.random((1, 8, 8, 8, 1)) < 0.1).astype(np.float32)
    labels = np.where(
        inputs[..., 0] > 0, rng.integers(0, 3, (1, 8, 8, 8)), -1
    ).astype(np.int32)
    return jnp.asarray(inputs), jnp.asarray(labels)


def test_train_step_learns():
    _, _, state, step, apply_fn = _setup(lr=0.1)
    inputs, labels = _batch()
    losses = []
    for _ in range(8):
        state, loss, counts = step(state, inputs, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.asarray(counts).shape == (3, 3)


def test_sgd_momentum_matches_torch():
    """One linear layer: our SGD update sequence == torch.optim.SGD."""
    torch = pytest.importorskip("torch")
    w0 = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    x = np.random.default_rng(1).normal(size=(5, 3)).astype(np.float32)
    y = np.random.default_rng(2).normal(size=(5, 4)).astype(np.float32)

    # torch
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([wt], lr=0.1, momentum=0.9, weight_decay=0)
    torch_ws = []
    for _ in range(4):
        opt.zero_grad()
        loss = ((torch.from_numpy(x) @ wt.T - torch.from_numpy(y)) ** 2).mean()
        loss.backward()
        opt.step()
        torch_ws.append(wt.detach().numpy().copy())

    # ours: same update rule on the raw pytree
    params = {"final_conv": {"conv": {"kernel": jnp.asarray(w0)}}}
    state = TrainState.create(params, lr=0.1)

    def loss_fn(trainable):
        # pin matmul precision: JAX's default fp32 matmul may round
        # operands (same issue as convs, see unet3d.DoubleConv._block)
        with jax.default_matmul_precision("highest"):
            w = trainable["final_conv"]["conv"]["kernel"]
            return ((jnp.asarray(x) @ w.T - jnp.asarray(y)) ** 2).mean()

    for i in range(4):
        grads = jax.grad(loss_fn)(state.trainable)
        buf = jax.tree.map(
            lambda b, g: 0.9 * b + g, state.momentum_buf, grads
        )
        new_tr = jax.tree.map(
            lambda p, b: p - state.lr * b, state.trainable, buf
        )
        state = state.replace(trainable=new_tr, momentum_buf=buf)
        ours = np.asarray(state.trainable["final_conv"]["conv"]["kernel"])
        np.testing.assert_allclose(ours, torch_ws[i], rtol=1e-5, atol=1e-6)


def test_freeze_partition():
    _, params, _, _, _ = _setup()
    mask = trainable_mask(params, ["final_conv"])
    trainable, frozen = partition(params, mask)
    names = trainable_names(params, ["final_conv"])
    assert names == ["final_conv.bias", "final_conv.weight"]
    merged = merge(trainable, frozen)
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_frozen_params_do_not_move():
    _, params, state, step, _ = _setup(training_layers=["final_conv"], lr=0.5)
    inputs, labels = _batch()
    before = jax.tree.map(np.asarray, state.frozen)
    for _ in range(3):
        state, loss, _ = step(state, inputs, labels)
    after = jax.tree.map(np.asarray, state.frozen)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)
    # the head did move
    assert not np.allclose(
        np.asarray(state.trainable["final_conv"]["conv"]["kernel"]),
        np.asarray(params["final_conv"]["conv"]["kernel"]),
    )


def test_repartition_unfreezes():
    _, params, state, step, apply_fn = _setup(training_layers=["final_conv"])
    state = state.repartition(["final_conv", "decoders.2"])
    names = trainable_names(state.params, ["final_conv", "decoders.2"])
    assert any(n.startswith("decoders.2") for n in names)
    # step still runs after repartition (recompiles once)
    step2 = make_train_step(apply_fn, num_classes=3, donate=False)
    inputs, labels = _batch()
    state, loss, _ = step2(state, inputs, labels)
    assert np.isfinite(float(loss))


def test_divide_lr_state():
    _, _, state, _, _ = _setup(lr=0.1)
    state = state.replace(
        momentum_buf=jax.tree.map(
            lambda b: jnp.ones_like(b), state.momentum_buf
        )
    )
    state2 = state.divide_lr()
    assert float(state2.lr) == pytest.approx(0.01)
    assert all(
        float(jnp.abs(b).sum()) == 0.0
        for b in jax.tree.leaves(state2.momentum_buf)
    )
    state3 = state.divide_lr(reset_momentum=False)
    assert any(
        float(jnp.abs(b).sum()) > 0.0
        for b in jax.tree.leaves(state3.momentum_buf)
    )


def test_eval_step_activation_quirk():
    model, params, state, _, apply_fn = _setup()
    inputs, labels = _batch()
    ev_act = make_eval_step(apply_fn, num_classes=3, apply_activation=True)
    ev_raw = make_eval_step(apply_fn, num_classes=3, apply_activation=False)
    loss_act, c1 = ev_act(params, inputs, labels)
    loss_raw, c2 = ev_raw(params, inputs, labels)
    assert float(loss_act) != pytest.approx(float(loss_raw))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_eval_step_dropout_off():
    """Eval/predict run in eval mode: dropout disabled, no rngs needed,
    and the outputs are deterministic (ref training.py:185 model.eval())."""
    from unetsulc_tpu.models.unet3d import UNet3D, make_apply_fn
    from unetsulc_tpu.train.step import make_predict_fn

    model = UNet3D(
        in_channels=1,
        out_channels=3,
        init_channel_number=8,
        dropout=0.2,
        compute_dtype=jnp.float32,
    )
    model_nodrop = model.copy(dropout=0.0)
    x = jnp.zeros((1, 8, 8, 8, 1))
    params = model.init(jax.random.key(0), x, train=False)["params"]
    inputs, labels = _batch()

    # eval step: must not crash without rngs, and dropout must be a no-op
    ev = make_eval_step(make_apply_fn(model), num_classes=3)
    ev0 = make_eval_step(make_apply_fn(model_nodrop), num_classes=3)
    loss, counts = ev(params, inputs, labels)
    loss0, counts0 = ev0(params, inputs, labels)
    assert float(loss) == pytest.approx(float(loss0), rel=1e-6)
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(counts0))

    # predict fn: deterministic across calls
    pr = make_predict_fn(make_apply_fn(model))
    out1 = np.asarray(pr(params, inputs))
    out2 = np.asarray(pr(params, inputs))
    np.testing.assert_array_equal(out1, out2)

    # train step WITH dropout actually drops (train-mode output differs)
    tr_logits = model.apply(
        {"params": params},
        inputs,
        train=True,
        apply_final_activation=False,
        rngs={"dropout": jax.random.key(2)},
    )
    ev_logits = model.apply(
        {"params": params}, inputs, train=False, apply_final_activation=False
    )
    assert not np.allclose(np.asarray(tr_logits), np.asarray(ev_logits))


def test_eval_step_final_sigmoid():
    """final_sigmoid=True eval loss = CE(sigmoid(logits)) — matches the
    torch-eval contract (tests/torch_oracle.py:111-124), NOT softmax."""
    from unetsulc_tpu.models.unet3d import UNet3D, make_apply_fn
    from unetsulc_tpu.ops.losses import cross_entropy_ignore
    from unetsulc_tpu.train.step import make_predict_fn

    model = UNet3D(
        in_channels=1,
        out_channels=3,
        init_channel_number=8,
        final_sigmoid=True,
        compute_dtype=jnp.float32,
    )
    x = jnp.zeros((1, 8, 8, 8, 1))
    params = model.init(jax.random.key(0), x, train=True)["params"]
    inputs, labels = _batch()
    apply_fn = make_apply_fn(model)

    ev = make_eval_step(apply_fn, num_classes=3, final_sigmoid=True)
    loss, _ = ev(params, inputs, labels)

    logits = apply_fn(params, inputs, train=False, apply_final_activation=False)
    expect = cross_entropy_ignore(jax.nn.sigmoid(logits), labels)
    wrong = cross_entropy_ignore(jax.nn.softmax(logits, axis=-1), labels)
    assert float(loss) == pytest.approx(float(expect), rel=1e-6)
    assert float(loss) != pytest.approx(float(wrong))

    # predict path applies sigmoid (values equal elementwise sigmoid;
    # jit-vs-eager fusion differences allow ~1e-5)
    pr = make_predict_fn(apply_fn, final_sigmoid=True)
    np.testing.assert_allclose(
        np.asarray(pr(params, inputs)),
        np.asarray(jax.nn.sigmoid(logits)),
        rtol=1e-4,
        atol=1e-5,
    )


def test_eval_sigmoid_matches_torch_oracle():
    """Eval-mode outputs of a final_sigmoid model match the torch oracle
    (model.eval() applies nn.Sigmoid; ref pattern_class.py:266)."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "tests")
    from torch_oracle import UNet3DOracle

    from unetsulc_tpu.models.torch_interop import params_from_state_dict
    from unetsulc_tpu.models.unet3d import UNet3D, make_apply_fn
    from unetsulc_tpu.train.step import make_predict_fn

    torch.manual_seed(0)
    oracle = UNet3DOracle(1, 3, final_sigmoid=True, init_channel_number=8)
    oracle.eval()
    params = params_from_state_dict(
        {k: v.numpy() for k, v in oracle.state_dict().items()}
    )
    model = UNet3D(
        in_channels=1,
        out_channels=3,
        init_channel_number=8,
        final_sigmoid=True,
        compute_dtype=jnp.float32,
    )
    inputs, _ = _batch()
    with torch.no_grad():
        ref = (
            oracle(torch.from_numpy(np.asarray(inputs)).permute(0, 4, 1, 2, 3))
            .permute(0, 2, 3, 4, 1)
            .numpy()
        )
    pr = make_predict_fn(make_apply_fn(model), final_sigmoid=True)
    np.testing.assert_allclose(
        np.asarray(pr(params, inputs)), ref, rtol=1e-4, atol=2e-4
    )


def test_label_fn_matches_full_volume_path():
    """make_label_fn (gather-then-activate) == full-volume activate-then-
    gather, for both softmax and sigmoid heads — the activation acts
    per-voxel over channels, so the two orders are exactly equivalent."""
    from unetsulc_tpu.models.unet3d import UNet3D, make_apply_fn
    from unetsulc_tpu.train.step import make_label_fn, make_predict_fn

    inputs, _ = _batch()
    rng = np.random.default_rng(3)
    coords = rng.integers(0, 8, size=(3, 64)).astype(np.int32)
    for final_sigmoid in (False, True):
        model = UNet3D(
            in_channels=1,
            out_channels=3,
            init_channel_number=8,
            final_sigmoid=final_sigmoid,
            compute_dtype=jnp.float32,
        )
        params = model.init(
            jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)), train=True
        )["params"]
        apply_fn = make_apply_fn(model)
        label = make_label_fn(apply_fn, final_sigmoid=final_sigmoid)
        ypred, yscores = label(params, inputs, *coords)

        full = np.asarray(
            make_predict_fn(apply_fn, final_sigmoid=final_sigmoid)(
                params, inputs
            )
        )[0]
        ref_scores = full[coords[0], coords[1], coords[2], :]
        # make_label_fn ships scores in float16 only on the TPU backend
        # (tunneled-link transfer halving); on CPU (this test) the scores
        # stay f32 and must match the full-volume path exactly
        np.testing.assert_allclose(
            np.asarray(yscores).astype(np.float32),
            ref_scores.astype(np.float32),
            rtol=1e-6, atol=1e-7,
        )
        ref_pred = np.argmax(ref_scores, axis=-1)
        np.testing.assert_array_equal(np.asarray(ypred), ref_pred)


def test_controllers_semantics():
    es = EarlyStopping(patience=2)
    for loss, stop in [(1.0, False), (1.1, False), (1.2, True)]:
        es(loss)
        assert es.early_stop == stop

    dl = DivideLr(patience=1, repeat=2)
    dl(1.0)
    assert not dl.divide_lr
    dl(2.0)
    assert dl.divide_lr and not dl.stop
    dl(3.0)
    assert dl.divide_lr and dl.stop  # second (last) division
    dl(4.0)
    assert not dl.divide_lr  # stopped

    ft = FineTunning(patience=2)
    ft(1.0)
    ft(1.5)
    assert not ft.ft_start
    ft(1.5)
    assert ft.ft_start and ft.stop
    ft(9.9)
    assert not ft.ft_start  # one-shot


def test_torch_param_name():
    assert (
        torch_param_name(("encoders_0", "double_conv", "conv1", "kernel"))
        == "encoders.0.double_conv.conv1.weight"
    )
    assert (
        torch_param_name(("decoders_2", "double_conv", "norm2_scale"))
        == "decoders.2.double_conv.norm2.weight"
    )
    assert torch_param_name(("final_conv", "conv", "bias")) == "final_conv.bias"
    assert (
        torch_param_name(("final_conv", "1", "kernel")) == "final_conv.1.weight"
    )


def test_controller_checkpoint_on_improvement(tmp_path):
    """save=True writes checkpoint.mdsm on val-loss improvement
    (the reference's never-enabled checkpoint.pt path, ref divide_lr.py:63-69)."""
    import os.path as op

    from unetsulc_tpu.io.mdsm import read_state_dict

    state = {"w": np.ones((2, 2), np.float32)}
    dl = DivideLr(patience=2, save=True, savepath=str(tmp_path))
    dl(1.0, get_state=lambda: state)
    p = op.join(str(tmp_path), "checkpoint.mdsm")
    assert op.exists(p)
    np.testing.assert_array_equal(read_state_dict(p)["w"], state["w"])
    # improvement overwrites; plateau does not
    state["w"] = np.zeros((2, 2), np.float32)
    dl(2.0, get_state=lambda: state)  # worse: no save
    np.testing.assert_array_equal(read_state_dict(p)["w"], 1.0)
    dl(0.5, get_state=lambda: state)  # better: saved
    np.testing.assert_array_equal(read_state_dict(p)["w"], 0.0)


def _scan_batch_data(batch=3, size=10, classes=3, seed=11):
    rng = np.random.default_rng(seed)
    inputs = (rng.random((batch, size, size, size, 1)) < 0.1).astype(
        np.float32
    )
    labels = np.where(
        inputs[..., 0] > 0,
        rng.integers(0, classes, (batch, size, size, size)),
        -1,
    ).astype(np.int32)
    return jnp.asarray(inputs), jnp.asarray(labels)


def test_scan_batch_train_step_matches_batched():
    """scan_batch=True runs per-volume forwards under lax.map; loss, grads
    (via the updated params), and confusion counts must equal the batched
    step's (same f32 XLA model, reduction-order tolerance only)."""
    from unetsulc_tpu.models.unet3d import make_apply_fn

    model = tiny_model()
    inputs, labels = _scan_batch_data()
    params = model.init(
        jax.random.key(2), jnp.zeros((1, 8, 8, 8, 1)), train=True
    )["params"]
    apply_fn = make_apply_fn(model)
    outs = {}
    for scan in (False, True):
        state = TrainState.create(params, lr=0.05)
        step = make_train_step(
            apply_fn, num_classes=3, momentum=0.9, donate=False,
            scan_batch=scan,
        )
        state, loss, counts = step(state, inputs, labels)
        outs[scan] = (float(loss), np.asarray(counts),
                      jax.tree.map(np.asarray, state.trainable))
    np.testing.assert_allclose(outs[True][0], outs[False][0], rtol=1e-6)
    np.testing.assert_array_equal(outs[True][1], outs[False][1])
    for a, b in zip(jax.tree.leaves(outs[True][2]),
                    jax.tree.leaves(outs[False][2])):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_scan_batch_eval_step_matches_batched():
    from unetsulc_tpu.models.unet3d import make_apply_fn

    model = tiny_model()
    inputs, labels = _scan_batch_data(seed=12)
    params = model.init(
        jax.random.key(3), jnp.zeros((1, 8, 8, 8, 1)), train=True
    )["params"]
    apply_fn = make_apply_fn(model)
    outs = {}
    for scan in (False, True):
        step = make_eval_step(
            apply_fn, num_classes=3, scan_batch=scan
        )
        loss, counts = step(params, inputs, labels)
        outs[scan] = (float(loss), np.asarray(counts))
    np.testing.assert_allclose(outs[True][0], outs[False][0], rtol=1e-6)
    np.testing.assert_array_equal(outs[True][1], outs[False][1])


def test_scan_batch_engages_pallas_pipeline():
    """With pallas_blocks=True a batch-2 input is XLA when batched but runs
    the fused pipeline per volume under scan_batch (f32 interpret mode on
    CPU is exact, so results must STILL match the batched XLA step)."""
    from unetsulc_tpu.models.unet3d import UNet3D, make_apply_fn

    model = UNet3D(
        in_channels=1,
        out_channels=3,
        init_channel_number=8,
        compute_dtype=jnp.float32,
        pallas_blocks=True,
    )
    # per-volume eligibility on the CPU test backend needs <= 4096 voxels
    inputs, labels = _scan_batch_data(batch=2, size=8, seed=13)
    params = model.init(
        jax.random.key(4), jnp.zeros((1, 8, 8, 8, 1)), train=True
    )["params"]
    # (per-volume eligibility is exercised through apply below: batch-1
    # slices take the pipeline, the batched input does not — unet3d
    # _pallas_eligible gates on x.shape[0] == 1)
    apply_fn = make_apply_fn(model)
    outs = {}
    for scan in (False, True):
        state = TrainState.create(params, lr=0.05)
        step = make_train_step(
            apply_fn, num_classes=3, momentum=0.9, donate=False,
            scan_batch=scan,
        )
        state, loss, counts = step(state, inputs, labels)
        outs[scan] = (float(loss), np.asarray(counts))
    np.testing.assert_allclose(outs[True][0], outs[False][0], rtol=1e-5)
    np.testing.assert_array_equal(outs[True][1], outs[False][1])


def test_bench_freeze_configs_match_freeze_api():
    """bench.py --freeze names the BASELINE.json transfer configs; pin the
    prefix lists against the freeze API so the driver-verifiable bench
    measures what BASELINE.md's per-config table says it measures
    (VERDICT r3 item 6)."""
    import sys
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from bench import FREEZE_CONFIGS

    _, params, _, _, _ = _setup()
    names = trainable_names(params, FREEZE_CONFIGS["final_conv"])
    assert names == ["final_conv.bias", "final_conv.weight"]
    names = trainable_names(params, FREEZE_CONFIGS["decoders"])
    assert any(n.startswith("decoders.0.") for n in names)
    assert any(n.startswith("decoders.2.") for n in names)
    assert not any(n.startswith("encoders.") for n in names)
