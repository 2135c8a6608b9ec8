"""3D CNN classifier for pattern-presence classification.

The reference ships :class:`PatternDataset` (ref dataset.py:94-170) — a
binary "does sulcal pattern X occur in this subject" dataset — whose model
lives outside the repo (deepsulci's pattern-classification pipeline).  This
module supplies the TPU-native classifier + a minimal training function so
the PatternDataset workflow is usable end to end.

Architecture: a compact conv stack in the same 'crg' idiom as the UNet
(conv3x3x3 -> ReLU -> GroupNorm, maxpool between stages) with global
average pooling and a linear head producing one logit.  bf16 on the MXU,
fp32 statistics, same layout conventions as the UNet.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from unetsulc_tpu.models.unet3d import DoubleConv, max_pool_3d


class PatternCNN3D(nn.Module):
    channels: Sequence[int] = (16, 32, 64)
    conv_layer_order: str = "crg"
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.compute_dtype)
        cin = x.shape[-1]
        for i, cout in enumerate(self.channels):
            if i:
                x = max_pool_3d(x)
            x = DoubleConv(
                cin,
                cout,
                self.conv_layer_order,
                compute_dtype=self.compute_dtype,
                name=f"stages_{i}",
            )(x)
            cin = cout
        # Global MAX pooling: GroupNorm zero-centers each channel over
        # space, so a mean readout would be constant regardless of input;
        # max pooling keeps the "pattern present somewhere" signal —
        # exactly the classification target.
        xf = x.astype(jnp.float32)
        pooled = jnp.concatenate(
            [jnp.max(xf, axis=(1, 2, 3)), jnp.mean(xf, axis=(1, 2, 3))],
            axis=-1,
        )
        # zero-init head: max-pooled GN features have heavy tails, a random
        # head starts the BCE deeply saturated
        return nn.Dense(
            1,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            name="head",
        )(pooled)[..., 0]


def make_pattern_train_step(model: PatternCNN3D, lr: float):
    """Jitted sigmoid-BCE Adam step on (x, y) batches.

    Adam rather than the U-Net's reference-parity SGD: binary occupancy
    inputs give GroupNorm tiny variances, so feature scales vary over
    orders of magnitude and plain SGD needs per-problem lr tuning.  The
    pattern pipeline has no reference trainer to match (SURVEY.md §2.1 #7:
    the model lives outside the repo), so the robust optimizer wins.
    """
    import optax

    tx = optax.adam(lr)

    def loss_fn(params, x, y):
        logit = model.apply({"params": params}, x, train=True)
        y = y.astype(jnp.float32)
        return jnp.mean(
            jnp.maximum(logit, 0) - logit * y + jnp.log1p(jnp.exp(-jnp.abs(logit)))
        )

    @jax.jit
    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return tx, step


def train_pattern_classifier(
    dataset,
    num_epochs: int = 10,
    lr: float = 1e-3,
    batch_size: int = 4,
    seed: int = 0,
    channels: Sequence[int] = (16, 32, 64),
    compute_dtype=jnp.float32,
    eval_dataset=None,
) -> Tuple[PatternCNN3D, dict, dict]:
    """Train on a PatternDataset; returns (model, params, history)."""
    model = PatternCNN3D(channels=channels, compute_dtype=compute_dtype)
    x0, _ = dataset[0]
    params = model.init(
        jax.random.key(seed), jnp.asarray(x0[None]), train=True
    )["params"]
    tx, step = make_pattern_train_step(model, lr)
    buf = tx.init(params)

    @jax.jit
    def predict(params, x):
        return jax.nn.sigmoid(model.apply({"params": params}, x, train=False))

    history = {"loss": [], "eval_acc": []}
    n = len(dataset)
    for epoch in range(num_epochs):
        if hasattr(dataset, "set_epoch"):
            dataset.set_epoch(epoch)
        losses = []
        for start in range(0, n, batch_size):
            idxs = range(start, min(start + batch_size, n))
            items = [dataset[i] for i in idxs]
            x = jnp.asarray(np.stack([a for a, _ in items]))
            y = jnp.asarray(np.asarray([b for _, b in items], np.float32))
            params, buf, loss = step(params, buf, x, y)
            losses.append(float(loss))
        history["loss"].append(float(np.mean(losses)))
        if eval_dataset is not None:
            correct = 0
            for i in range(len(eval_dataset)):
                x, y = eval_dataset[i]
                p = float(predict(params, jnp.asarray(x[None]))[0])
                correct += int((p > 0.5) == bool(y))
            history["eval_acc"].append(correct / len(eval_dataset))
    return model, params, history
