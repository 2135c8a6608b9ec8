"""Parameter freezing by torch-style name prefixes.

The reference freezes by checking each parameter name against the
``training_layers`` / ``fine_tunning_layers`` prefix lists every batch
(ref transfer_learning/transfer_learning.py:330-335).  TPU-native
equivalent: *partition* the parameter pytree into (trainable, frozen)
sub-trees once and differentiate only w.r.t. the trainable part — XLA then
dead-code-eliminates the frozen backward graph entirely (for
final_conv-only training that removes ~all of the backward FLOPs, something
the reference's requires_grad toggling also achieves but re-decides per
batch on host).

Prefix semantics are identical: a parameter is trainable iff its *torch*
name (``decoders.2.double_conv.conv1.weight`` ...) starts with any listed
prefix.  None = everything trainable.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax


def torch_param_name(path: Tuple[str, ...]) -> str:
    """flax param path -> torch state_dict name (see torch_interop)."""
    block = path[0]
    if block.startswith(("encoders_", "decoders_")):
        kind, idx = block.split("_")
        layer = path[2]
        if layer.startswith("conv"):
            leaf = "weight" if path[3] == "kernel" else "bias"
            return f"{kind}.{idx}.double_conv.{layer}.{leaf}"
        norm, suffix = layer.rsplit("_", 1)
        leaf = "weight" if suffix == "scale" else "bias"
        return f"{kind}.{idx}.double_conv.{norm}.{leaf}"
    if block == "final_conv":
        sub = path[1]
        leaf = "weight" if path[2] == "kernel" else "bias"
        return (
            f"final_conv.{leaf}" if sub == "conv" else f"final_conv.{sub}.{leaf}"
        )
    raise KeyError(f"unrecognized flax param block: {block}")


def _path_strs(path) -> Tuple[str, ...]:
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "name"):
            out.append(str(p.name))
        else:
            out.append(str(p))
    return tuple(out)


def trainable_mask(params, training_layers: Optional[Sequence[str]]):
    """Pytree of bools: True where the torch name matches a prefix."""
    if training_layers is None:
        return jax.tree.map(lambda _: True, params)
    prefixes = list(training_layers)

    def leaf_mask(path, _leaf):
        name = torch_param_name(_path_strs(path))
        return any(name.startswith(p) for p in prefixes)

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


def partition(params, mask):
    """Split params into (trainable, frozen) trees with None placeholders."""
    trainable = jax.tree.map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree.map(lambda p, m: None if m else p, params, mask)
    return trainable, frozen


def merge(trainable, frozen):
    """Inverse of :func:`partition`."""
    return jax.tree.map(
        lambda a, b: a if a is not None else b,
        trainable,
        frozen,
        is_leaf=lambda x: x is None,
    )


def trainable_names(params, training_layers: Optional[Sequence[str]]) -> List[str]:
    mask = trainable_mask(params, training_layers)
    names = []

    def visit(path, m):
        if m:
            names.append(torch_param_name(_path_strs(path)))

    jax.tree_util.tree_map_with_path(visit, mask)
    return sorted(names)
