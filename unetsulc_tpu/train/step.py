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
from unetsulc_tpu.ops.losses import cross_entropy_ignore
from unetsulc_tpu.train import freeze


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
):
    """Build the jitted train step.

    apply_fn(params, inputs, train=True[, rngs=...]) -> logits (N,X,Y,Z,C).
    Returns step(state, inputs, labels) -> (state, loss, confusion(3,C)).
    The state is donated: buffers are updated in place in HBM.
    ``use_dropout`` threads a per-step PRNG (folded from ``state.step``)
    into the model's 'dropout' stream (the deepsulci UNet3D exposes a
    dropout rate, ref training.py:66 — always 0 in the reference configs).
    """

    def step(state: TrainState, inputs, labels):
        def loss_fn(trainable):
            params = freeze.merge(trainable, state.frozen)
            if use_dropout:
                rngs = {
                    "dropout": jax.random.fold_in(
                        jax.random.key(0), state.step
                    )
                }
                logits = apply_fn(params, inputs, train=True, rngs=rngs)
            else:
                logits = apply_fn(params, inputs, train=True)
            loss = cross_entropy_ignore(logits, labels, background)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable
        )
        preds = jnp.argmax(logits, axis=-1)
        counts = confusion_counts(labels, preds, num_classes, background)

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


def make_eval_step(
    apply_fn: Callable,
    num_classes: int,
    background: int = -1,
    apply_activation: bool = True,
):
    """Build the jitted eval step: (params, inputs, labels) -> (loss, counts).

    ``apply_activation=True`` reproduces the torch-eval-mode quirk (val loss
    computed on activated outputs); argmax/metrics are activation-invariant.
    """

    def step(params, inputs, labels):
        logits = apply_fn(params, inputs, train=True)
        preds = jnp.argmax(logits, axis=-1)
        if apply_activation:
            logits = jax.nn.softmax(logits, axis=-1)
        loss = cross_entropy_ignore(logits, labels, background)
        counts = confusion_counts(labels, preds, num_classes, background)
        return loss, counts

    return jax.jit(step)


def make_predict_fn(apply_fn: Callable, apply_activation: bool = True):
    """Inference forward (labeling path): returns eval-mode outputs
    (activated, matching ref pattern_class.py:266 ``self.model.eval()``)."""

    @jax.jit
    def predict(params, inputs):
        logits = apply_fn(params, inputs, train=True)
        if apply_activation:
            logits = jax.nn.softmax(logits, axis=-1)
        return logits

    return predict
