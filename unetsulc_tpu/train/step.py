"""The jitted train/eval steps: SGD+momentum, masked CE, on-device metrics.

TPU-first rebuild of the reference's per-batch hot loop
(ref training.py:198-217).  One compiled function does: forward (bf16 on
the MXU), masked cross-entropy, backward w.r.t. the *trainable partition
only*, torch-semantics SGD+momentum update, and confusion-count metric
accumulation — no host round-trips inside an epoch except the scalar fetch
at epoch end.

torch SGD parity (ref training.py:140: ``optim.SGD(lr, momentum, wd=0)``):
    buf   <- momentum * buf + grad
    param <- param - lr * buf
lr lives in the state as a device scalar so DivideLr's lr/10 does NOT
recompile; the reference's optimizer rebuild resets momentum buffers
(ref training.py:252), reproduced by :meth:`TrainState.reset_momentum`.

Eval parity quirk: the torch model applies its final activation in eval
mode, so the reference's *validation* loss is CE(softmax(logits)) while the
train loss is CE(logits) (SURVEY.md §2.3 UNet3D contract).  ``make_eval_step``
reproduces this by default (``apply_activation=True``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import struct

from unetsulc_tpu.ops.esi import confusion_counts
from unetsulc_tpu.ops.losses import cross_entropy_ignore, cross_entropy_sum
from unetsulc_tpu.train import freeze


def _match_labels(logits, labels, background):
    """Align labels with the model's logits layout.

    The Pallas pipeline emits (Xp, plane, C) padded row-major logits
    (models/unet3d.py ``padded_output``) so the whole loss/metric graph
    stays in one layout; labels are zero-ring padded with ``background``
    to the same rows (padding therefore drops out of the masked CE and of
    the confusion counts).  5-D logits pass through untouched."""
    if logits.ndim != 3:
        return labels
    from unetsulc_tpu.ops.conv_pallas import make_geom

    n, x, y, z = labels.shape
    # 3-D logits only occur on the batch-1 Pallas pipeline; indexing
    # labels[0] below would silently drop extra volumes if that invariant
    # ever drifted (ADVICE r2) — fail loudly instead.
    assert n == 1, f"padded row-major logits require batch 1, got {n}"
    g = make_geom(x, y, z)
    assert (g.Xp, g.plane) == logits.shape[:2], (logits.shape, g)
    lp = jnp.pad(
        labels[0],
        (
            (1, g.Xp - x - 1),
            (1, g.Yp - y - 1),
            (1, g.Zp - z - 1),
        ),
        constant_values=background,
    )
    return lp.reshape(g.Xp, g.plane)


def _volume_forward_train(apply_fn, params, xi, lbi, num_classes, background):
    """Per-volume train-mode forward -> (nll_sum, valid_count, confusion).

    The shared body of every train step's per-volume path (single-device
    scan, DP shard scan, SP shard): unnormalized NLL sum + valid-voxel
    count so callers can form the exact global batch-mean after summing /
    psum'ing across volumes and devices."""
    logits = apply_fn(params, xi, train=True, padded_output=True)
    lbl = _match_labels(logits, lbi, background)
    nll, cnt = cross_entropy_sum(logits, lbl, background)
    preds = jnp.argmax(logits, axis=-1)
    cc = confusion_counts(lbl, preds, num_classes, background)
    return nll, cnt, cc


def _volume_forward_eval(
    apply_fn, params, xi, lbi, num_classes, background,
    apply_activation, final_sigmoid,
):
    """Per-volume eval-mode forward -> (nll_sum, valid_count, confusion).

    Eval-mode quirk preserved: argmax/metrics on raw logits, the loss on
    activation(logits) when ``apply_activation`` (the torch eval-mode
    final activation, see make_eval_step)."""
    logits = apply_fn(
        params, xi, train=False, apply_final_activation=False,
        padded_output=True,
    )
    lbl = _match_labels(logits, lbi, background)
    preds = jnp.argmax(logits, axis=-1)
    if apply_activation:
        logits = _final_activation(logits, final_sigmoid)
    nll, cnt = cross_entropy_sum(logits, lbl, background)
    cc = confusion_counts(lbl, preds, num_classes, background)
    return nll, cnt, cc


def _scan_volumes(one_volume, inputs, labels):
    """``lax.map`` a per-volume fn over the batch; sum the (nll, cnt, cc)
    parts.  Each volume re-enters at batch 1, keeping the fused Pallas
    pipeline's eligibility; sums are exact (grads follow by linearity)."""
    nlls, cnts, ccs = jax.lax.map(
        lambda args: one_volume(args[0][None], args[1][None]),
        (inputs, labels),
    )
    return jnp.sum(nlls), jnp.sum(cnts), jnp.sum(ccs, axis=0)


class TrainState(struct.PyTreeNode):
    """Functional training state (a pytree; flows through jit/pjit)."""

    trainable: Any
    frozen: Any
    momentum_buf: Any
    lr: jnp.ndarray  # device scalar
    step: jnp.ndarray  # device scalar

    @property
    def params(self):
        return freeze.merge(self.trainable, self.frozen)

    @classmethod
    def create(
        cls,
        params,
        lr: float,
        training_layers: Optional[Sequence[str]] = None,
    ) -> "TrainState":
        mask = freeze.trainable_mask(params, training_layers)
        trainable, frozen = freeze.partition(params, mask)
        momentum_buf = jax.tree.map(jnp.zeros_like, trainable)
        return cls(
            trainable=trainable,
            frozen=frozen,
            momentum_buf=momentum_buf,
            lr=jnp.asarray(lr, jnp.float32),
            step=jnp.asarray(0, jnp.int32),
        )

    def divide_lr(self, factor: float = 10.0, reset_momentum: bool = True):
        """DivideLr semantics (ref training.py:250-252): lr/=factor and, by
        default, momentum reset (the reference rebuilds the optimizer)."""
        new = self.replace(lr=self.lr / factor)
        if reset_momentum:
            new = new.reset_momentum()
        return new

    def reset_momentum(self) -> "TrainState":
        return self.replace(
            momentum_buf=jax.tree.map(jnp.zeros_like, self.momentum_buf)
        )

    def repartition(
        self, training_layers: Optional[Sequence[str]]
    ) -> "TrainState":
        """Change the trainable set (fine-tuning unfreeze). Momentum buffers
        restart at zero for newly trainable params — exactly what the
        reference's optimizer rebuild does
        (ref transfer_learning/transfer_learning.py:392)."""
        params = self.params
        mask = freeze.trainable_mask(params, training_layers)
        trainable, frozen = freeze.partition(params, mask)
        return self.replace(
            trainable=trainable,
            frozen=frozen,
            momentum_buf=jax.tree.map(jnp.zeros_like, trainable),
        )


def make_train_step(
    apply_fn: Callable,
    num_classes: int,
    momentum: float = 0.9,
    background: int = -1,
    donate: bool = True,
    use_dropout: bool = False,
    scan_batch: bool = False,
):
    """Build the jitted train step.

    apply_fn(params, inputs, train=True[, rngs=...]) -> logits (N,X,Y,Z,C).
    Returns step(state, inputs, labels) -> (state, loss, confusion(3,C)).
    The state is donated: buffers are updated in place in HBM.
    ``use_dropout`` threads a per-step PRNG (folded from ``state.step``)
    into the model's 'dropout' stream (the deepsulci UNet3D exposes a
    dropout rate, ref training.py:66 — always 0 in the reference configs).

    ``scan_batch``: run batch>1 inputs as a ``lax.map`` over per-volume
    batch-1 forwards instead of one batched forward.  Each volume then
    satisfies the fused Pallas pipeline's batch-1 eligibility
    (models/unet3d.py), closing the silent batched-XLA fallback of the
    reference's batch-2 config (BASELINE.json); the combined loss is the
    exact torch batch-mean (sum of per-volume NLL sums / sum of valid
    counts) and gradients follow by linearity.  Ignored at batch 1 and
    under dropout (dropout is Pallas-ineligible anyway).
    """

    def step(state: TrainState, inputs, labels):
        scan = scan_batch and inputs.shape[0] > 1 and not use_dropout

        def loss_fn(trainable):
            params = freeze.merge(trainable, state.frozen)
            if scan:
                nll, cnt, cc = _scan_volumes(
                    lambda xi, lbi: _volume_forward_train(
                        apply_fn, params, xi, lbi, num_classes, background
                    ),
                    inputs, labels,
                )
                loss = nll / jnp.maximum(cnt, 1).astype(jnp.float32)
                return loss, cc
            if use_dropout:
                rngs = {
                    "dropout": jax.random.fold_in(
                        jax.random.key(0), state.step
                    )
                }
                logits = apply_fn(
                    params, inputs, train=True, rngs=rngs,
                    padded_output=True,
                )
            else:
                logits = apply_fn(params, inputs, train=True,
                                  padded_output=True)
            lbl = _match_labels(logits, labels, background)
            loss = cross_entropy_ignore(logits, lbl, background)
            preds = jnp.argmax(logits, axis=-1)
            cc = confusion_counts(lbl, preds, num_classes, background)
            return loss, cc

        (loss, counts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable
        )

        new_buf = jax.tree.map(
            lambda b, g: momentum * b + g, state.momentum_buf, grads
        )
        new_trainable = jax.tree.map(
            lambda p, b: (p - state.lr * b).astype(p.dtype),
            state.trainable,
            new_buf,
        )
        new_state = state.replace(
            trainable=new_trainable,
            momentum_buf=new_buf,
            step=state.step + 1,
        )
        return new_state, loss, counts

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _final_activation(logits, final_sigmoid: bool):
    """The torch eval-mode final activation (ref UNet3D contract:
    ``nn.Sigmoid() if final_sigmoid else nn.Softmax(dim=1)``)."""
    if final_sigmoid:
        return jax.nn.sigmoid(logits)
    return jax.nn.softmax(logits, axis=-1)


def make_eval_step(
    apply_fn: Callable,
    num_classes: int,
    background: int = -1,
    apply_activation: bool = True,
    final_sigmoid: bool = False,
    scan_batch: bool = False,
):
    """Build the jitted eval step: (params, inputs, labels) -> (loss, counts).

    Runs the model in eval mode (``train=False`` — dropout OFF, matching
    ``model.eval()`` at ref training.py:185) but asks for *raw logits*
    (``apply_final_activation=False``) so argmax/metrics run on unactivated
    outputs.  ``apply_activation=True`` then reproduces the torch-eval-mode
    quirk: the reference's val loss is ``CrossEntropyLoss(activation(logits))``
    where the activation is sigmoid or softmax per the model's
    ``final_sigmoid`` flag (tests/torch_oracle.py:111-124 mirrors the
    deepsulci contract).  ``scan_batch`` as in :func:`make_train_step`.
    """

    def step(params, inputs, labels):
        def one(xi, lbi):
            return _volume_forward_eval(
                apply_fn, params, xi, lbi, num_classes, background,
                apply_activation, final_sigmoid,
            )

        if scan_batch and inputs.shape[0] > 1:
            nll, cnt, counts = _scan_volumes(one, inputs, labels)
        else:
            nll, cnt, counts = one(inputs, labels)
        loss = nll / jnp.maximum(cnt, 1).astype(jnp.float32)
        return loss, counts

    return jax.jit(step)


def make_label_fn(apply_fn: Callable, final_sigmoid: bool = False):
    """Jitted labeling: (params, inputs, cx, cy, cz) -> (ypred, ytrue-free
    yscores) at the bucket voxels ONLY.

    The round-1 path softmaxed the full (X,Y,Z,C) volume on device and
    fetched ALL of it to host before gathering ~3% of the voxels
    (ref pattern_class.py:272-277 does the same on GPU).  Gathering first
    is exactly equivalent — softmax/sigmoid act per-voxel over channels, so
    gather∘activation == activation∘gather — and shrinks the device→host
    transfer from O(volume x classes) to O(n_voxels x classes).

    Coordinate arrays must be padded to a static length by the caller
    (padding coords gather garbage rows that the caller slices off).
    """

    @jax.jit
    def label(params, inputs, cx, cy, cz):
        logits = apply_fn(
            params, inputs, train=False, apply_final_activation=False,
            padded_output=True,
        )
        if logits.ndim == 3:  # padded row-major (Pallas pipeline) layout
            from unetsulc_tpu.ops.conv_pallas import make_geom

            g = make_geom(*inputs.shape[1:4])
            picked = logits[cx + 1, (cy + 1) * g.Zp + (cz + 1), :]
        else:
            picked = logits[0][cx, cy, cz, :]  # (n_pad, C)
        yscores = _final_activation(picked, final_sigmoid)
        # float16 transfer dtype: yscores are probabilities in [0, 1], and
        # the device->host fetch of (n_voxels x classes) dominates label
        # latency on tunneled links (f16 keeps 10 mantissa bits — more
        # than bf16 — while halving the transfer; the caller upcasts).
        # Gated on the TPU backend: that is where the tunnel win matters,
        # and the CPU/parity paths keep the reference's f32 scores exactly
        # (cutting/threshold decisions see no rounding, ADVICE r2).
        if jax.default_backend() == "tpu":
            yscores = yscores.astype(jnp.float16)
        # ypred from the (possibly f16-rounded) yscores, NOT the raw
        # logits: host-path cutting() argmaxes the transferred scores, so
        # deriving the device-vote partition from the same values makes
        # the two paths' per-voxel argmax identical even when f16
        # rounding collapses a voxel's top-2 classes (advisor r4).  The
        # activation is per-class monotone, so pre-cast this equals the
        # logit argmax; ties (post-cast) resolve to the lowest class id
        # in both jnp.argmax and np.argmax.
        ypred = jnp.argmax(yscores, axis=-1)
        return ypred, yscores

    return label


def make_vote_fn():
    """Jitted per-part score vote for the cutting threshold sweep.

    ``(scores (n_pad, C), part_ids (T, n_pad) int32, num_parts static)
    -> (T, num_parts) int32`` — for every threshold's re-segmentation
    (ops/cutting.py ``cut_part_ids``, host-side, geometry-only), sum the
    class scores within each part and argmax.

    This keeps :func:`make_label_fn`'s (n_voxels x classes) score matrix
    on device for the whole sweep: the host fetches only the small
    per-voxel ``ypred`` (to compute the partition) and the (T, num_parts)
    vote table, instead of the ~4 MB/volume score transfer that dominates
    label latency through tunneled links (BASELINE.md).  The reference
    fetches the full probability matrix per volume and votes on host
    (ref pattern_class.py:177-245).

    Padded voxel rows must carry part id ``num_parts`` (a dump segment
    sliced off before the argmax).  Callers bucket ``num_parts`` so the
    executable is reused across graphs.
    """
    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def vote(scores, part_ids, num_parts):
        s = scores.astype(jnp.float32)

        def one(pid):
            sums = jax.ops.segment_sum(s, pid, num_segments=num_parts + 1)
            return jnp.argmax(sums[:num_parts], axis=-1).astype(jnp.int32)

        return jax.vmap(one)(part_ids)

    return vote


def make_predict_fn(
    apply_fn: Callable,
    apply_activation: bool = True,
    final_sigmoid: bool = False,
):
    """Inference forward (labeling path): eval-mode outputs — dropout off,
    then the model's final activation (sigmoid/softmax per ``final_sigmoid``),
    matching ref pattern_class.py:266 ``self.model.eval()``."""

    @jax.jit
    def predict(params, inputs):
        logits = apply_fn(
            params, inputs, train=False, apply_final_activation=False
        )
        if apply_activation:
            logits = _final_activation(logits, final_sigmoid)
        return logits

    return predict


def make_train_step_dp(
    apply_fn: Callable,
    num_classes: int,
    mesh,
    momentum: float = 0.9,
    background: int = -1,
    donate: bool = True,
    use_dropout: bool = False,
    scan_batch: bool = False,
):
    """Data-parallel train step as an explicit shard_map over the mesh's
    'data' axis.

    Unlike the pjit auto-sharded step (whose traced model sees the GLOBAL
    batch and therefore falls off the batch-1 Pallas pipeline), each shard
    here applies the model to its LOCAL batch — one volume per device runs
    the fused kernels — and the gradients meet in one psum over ICI.  The
    global loss is the exact reference semantics (mean CE over the global
    batch's valid voxels): shards contribute unnormalized NLL sums and
    valid counts, psum'd before the division, so the result is
    bitwise-independent of the device count up to reduction order.
    ``scan_batch`` scans per-volume forwards when the LOCAL batch still
    exceeds 1 (global batch > device count) so every volume keeps the
    batch-1 Pallas pipeline.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def per_shard(state: TrainState, inputs, labels):
        scan = scan_batch and inputs.shape[0] > 1 and not use_dropout

        def loss_fn(trainable):
            params = freeze.merge(trainable, state.frozen)
            if scan:
                nll, cnt, cc = _scan_volumes(
                    lambda xi, lbi: _volume_forward_train(
                        apply_fn, params, xi, lbi, num_classes, background
                    ),
                    inputs, labels,
                )
                return nll, (cnt, cc)
            if use_dropout:
                rngs = {
                    "dropout": jax.random.fold_in(
                        jax.random.fold_in(jax.random.key(0), state.step),
                        jax.lax.axis_index("data"),
                    )
                }
                logits = apply_fn(params, inputs, train=True, rngs=rngs,
                                  padded_output=True)
            else:
                logits = apply_fn(params, inputs, train=True,
                                  padded_output=True)
            lbl = _match_labels(logits, labels, background)
            nll, cnt = cross_entropy_sum(logits, lbl, background)
            preds = jnp.argmax(logits, axis=-1)
            cc = confusion_counts(lbl, preds, num_classes, background)
            return nll, (cnt, cc)

        (nll, (cnt, counts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.trainable)

        nll_g = jax.lax.psum(nll, "data")
        cnt_g = jax.lax.psum(cnt, "data")
        grads = jax.lax.psum(grads, "data")
        counts = jax.lax.psum(counts, "data")
        denom = jnp.maximum(cnt_g, 1).astype(jnp.float32)
        loss = nll_g / denom

        new_buf = jax.tree.map(
            lambda b, gr: momentum * b + gr / denom,
            state.momentum_buf, grads,
        )
        new_trainable = jax.tree.map(
            lambda p, b: (p - state.lr * b).astype(p.dtype),
            state.trainable, new_buf,
        )
        new_state = state.replace(
            trainable=new_trainable, momentum_buf=new_buf,
            step=state.step + 1,
        )
        return new_state, loss, counts

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_train_step_sp(
    apply_fn: Callable,
    num_classes: int,
    mesh,
    momentum: float = 0.9,
    background: int = -1,
    donate: bool = True,
    scan_batch: bool = False,
):
    """Spatially-sharded (optionally x data-parallel) Pallas train step.

    shard_map over BOTH mesh axes: the batch over 'data', the volume X
    axis over 'space'.  ``apply_fn`` must close over a model with
    ``sp_axis='space'`` (models/unet3d.py): inside, each device runs the
    fused Pallas kernels on its local slab with ppermute halo exchange,
    psum'd GroupNorm statistics, and a replicated middle — so the fused
    pipeline survives spatial sharding (VERDICT r2 item 2; the pjit
    auto-SPMD path falls back to XLA convs).  Per-shard NLL sums / valid
    counts / confusion counts and grads psum over both axes, making loss
    and update bitwise-independent of the mesh shape up to reduction
    order (the test_parallel.py equivalence pattern).

    No ``use_dropout``: dropout is Pallas-ineligible and the model raises
    on sp_axis without the pipeline.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    axes = ("data", "space")

    def per_shard(state: TrainState, inputs, labels):
        scan = scan_batch and inputs.shape[0] > 1

        def loss_fn(trainable):
            params = freeze.merge(trainable, state.frozen)

            def one(xi, lbi):
                return _volume_forward_train(
                    apply_fn, params, xi, lbi, num_classes, background
                )

            if scan:
                nll, cnt, cc = _scan_volumes(one, inputs, labels)
            else:
                nll, cnt, cc = one(inputs, labels)
            return nll, (cnt, cc)

        (nll, (cnt, counts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.trainable)

        nll_g = jax.lax.psum(nll, axes)
        cnt_g = jax.lax.psum(cnt, axes)
        grads = jax.lax.psum(grads, axes)
        counts = jax.lax.psum(counts, axes)
        denom = jnp.maximum(cnt_g, 1).astype(jnp.float32)
        loss = nll_g / denom

        new_buf = jax.tree.map(
            lambda b, gr: momentum * b + gr / denom,
            state.momentum_buf, grads,
        )
        new_trainable = jax.tree.map(
            lambda p, b: (p - state.lr * b).astype(p.dtype),
            state.trainable, new_buf,
        )
        new_state = state.replace(
            trainable=new_trainable, momentum_buf=new_buf,
            step=state.step + 1,
        )
        return new_state, loss, counts

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P("data", "space"), P("data", "space")),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_eval_step_sp(
    apply_fn: Callable,
    num_classes: int,
    mesh,
    background: int = -1,
    apply_activation: bool = True,
    final_sigmoid: bool = False,
    scan_batch: bool = False,
):
    """Spatially-sharded eval step (shard_map twin of make_train_step_sp);
    ``apply_fn`` must close over the sp_axis='space' model."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    axes = ("data", "space")

    def per_shard(params, inputs, labels):
        def one(xi, lbi):
            return _volume_forward_eval(
                apply_fn, params, xi, lbi, num_classes, background,
                apply_activation, final_sigmoid,
            )

        if scan_batch and inputs.shape[0] > 1:
            nll, cnt, counts = _scan_volumes(one, inputs, labels)
        else:
            nll, cnt, counts = one(inputs, labels)
        nll_g = jax.lax.psum(nll, axes)
        cnt_g = jax.lax.psum(cnt, axes)
        counts = jax.lax.psum(counts, axes)
        loss = nll_g / jnp.maximum(cnt_g, 1).astype(jnp.float32)
        return loss, counts

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P("data", "space"), P("data", "space")),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded)


def make_eval_step_dp(
    apply_fn: Callable,
    num_classes: int,
    mesh,
    background: int = -1,
    apply_activation: bool = True,
    final_sigmoid: bool = False,
    scan_batch: bool = False,
):
    """Data-parallel eval step (shard_map twin of make_eval_step): each
    device evaluates its local volume on the Pallas pipeline; NLL sums,
    valid counts, and confusion counts psum over 'data'.  ``scan_batch``
    as in :func:`make_train_step_dp`."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def per_shard(params, inputs, labels):
        def one(xi, lbi):
            return _volume_forward_eval(
                apply_fn, params, xi, lbi, num_classes, background,
                apply_activation, final_sigmoid,
            )

        if scan_batch and inputs.shape[0] > 1:
            nll, cnt, counts = _scan_volumes(one, inputs, labels)
        else:
            nll, cnt, counts = one(inputs, labels)
        nll_g = jax.lax.psum(nll, "data")
        cnt_g = jax.lax.psum(cnt, "data")
        counts = jax.lax.psum(counts, "data")
        loss = nll_g / jnp.maximum(cnt_g, 1).astype(jnp.float32)
        return loss, counts

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded)
