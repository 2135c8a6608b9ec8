"""Mapping between torch UNet3D state_dicts and the flax parameter pytree.

The torch parameter names are a public contract: transfer learning freezes
by name prefix (``final_conv``, ``decoders.2`` ... — ref
transfer_learning/transfer_learning.py:330-335,69) and ``.mdsm`` files key
tensors by these names (ref pattern_class.py:295-305).  The flax module tree
(:mod:`unetsulc_tpu.models.unet3d`) was laid out so this mapping is a pure
rename + conv-kernel transpose:

    torch ``encoders.0.double_conv.conv1.weight`` (O, I, kX, kY, kZ)
      <-> flax ``params['encoders_0']['double_conv']['conv1']['kernel']``
          (kX, kY, kZ, I, O)
    torch ``...norm1.weight`` / ``...norm1.bias``
      <-> flax ``...['norm1_scale']`` / ``...['norm1_bias']``
    torch ``final_conv.weight`` (num_conv == 1)
      <-> flax ``params['final_conv']['conv']['kernel']``
    torch ``final_conv.<n>.weight`` (num_conv > 1 Sequential head,
      ref pattern_class.py:357-365)
      <-> flax ``params['final_conv']['<n>']['kernel']``
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _torch_to_flax_path(key: str) -> Tuple[Tuple[str, ...], bool]:
    """Return (flax path, is_conv_weight) for one torch state_dict key."""
    parts = key.split(".")
    leaf = parts[-1]
    if parts[0] in ("encoders", "decoders"):
        block = f"{parts[0]}_{parts[1]}"
        if parts[2] == "upsample":
            # interpolate=False decoder: ConvTranspose3d weight layout is
            # (Cin, Cout, kX, kY, kZ) — unlike Conv3d's (Cout, Cin, ...)
            flax_leaf = "kernel" if leaf == "weight" else "bias"
            return (block, "upsample", flax_leaf), (
                "transpose" if leaf == "weight" else False
            )
        assert parts[2] == "double_conv", key
        layer = parts[3]  # conv1/conv2/norm1/norm2
        if layer.startswith("conv"):
            flax_leaf = "kernel" if leaf == "weight" else "bias"
            return (block, "double_conv", layer, flax_leaf), leaf == "weight"
        if layer.startswith("norm"):
            suffix = "scale" if leaf == "weight" else "bias"
            return (block, "double_conv", f"{layer}_{suffix}"), False
        raise KeyError(f"unrecognized state_dict key: {key}")
    if parts[0] == "final_conv":
        flax_leaf = "kernel" if leaf == "weight" else "bias"
        if len(parts) == 2:  # final_conv.weight
            return ("final_conv", "conv", flax_leaf), leaf == "weight"
        # final_conv.<n>.weight (Sequential head)
        return ("final_conv", parts[1], flax_leaf), leaf == "weight"
    raise KeyError(f"unrecognized state_dict key: {key}")


def params_from_state_dict(state: Dict[str, np.ndarray]) -> dict:
    """Build the flax ``params`` dict from a torch state_dict."""
    params: dict = {}
    for key, arr in state.items():
        path, is_conv_w = _torch_to_flax_path(key)
        arr = np.asarray(arr)
        if is_conv_w == "transpose":
            # ConvTranspose3d weight (I, O, kX, kY, kZ) -> flax (kX, kY, kZ, I, O)
            arr = np.transpose(arr, (2, 3, 4, 0, 1))
        elif is_conv_w:
            # torch conv3d weight (O, I, kX, kY, kZ) -> flax (kX, kY, kZ, I, O)
            arr = np.transpose(arr, (2, 3, 4, 1, 0))
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    return params


def _flatten(params: dict, prefix=()) -> List[Tuple[Tuple[str, ...], np.ndarray]]:
    out = []
    for k, v in params.items():
        if isinstance(v, dict):
            out.extend(_flatten(v, prefix + (k,)))
        else:
            out.append((prefix + (k,), np.asarray(v)))
    return out


def state_dict_from_params(params: dict) -> Dict[str, np.ndarray]:
    """Inverse mapping: flax params -> torch-named state_dict (fp32).

    Keys come out in torch module order (encoders, decoders, final_conv)
    so the file diff-matches torch-produced checkpoints.
    """
    entries: Dict[str, np.ndarray] = {}
    for path, arr in _flatten(params):
        block = path[0]
        if block.startswith(("encoders_", "decoders_")):
            kind, idx = block.split("_")
            if path[1] == "upsample":
                leaf = "weight" if path[2] == "kernel" else "bias"
                key = f"{kind}.{idx}.upsample.{leaf}"
                if leaf == "weight":
                    # flax (kX, kY, kZ, I, O) -> ConvTranspose3d (I, O, k...)
                    arr = np.transpose(arr, (3, 4, 0, 1, 2))
                entries[key] = np.ascontiguousarray(arr, dtype=np.float32)
                continue
            layer = path[2]
            if layer.startswith("conv"):
                leaf = "weight" if path[3] == "kernel" else "bias"
                key = f"{kind}.{idx}.double_conv.{layer}.{leaf}"
                if leaf == "weight":
                    arr = np.transpose(arr, (4, 3, 0, 1, 2))
            else:  # norm{p}_{scale|bias}
                norm, suffix = layer.rsplit("_", 1)
                leaf = "weight" if suffix == "scale" else "bias"
                key = f"{kind}.{idx}.double_conv.{norm}.{leaf}"
        elif block == "final_conv":
            sub = path[1]
            leaf = "weight" if path[2] == "kernel" else "bias"
            key = (
                f"final_conv.{leaf}"
                if sub == "conv"
                else f"final_conv.{sub}.{leaf}"
            )
            if leaf == "weight":
                arr = np.transpose(arr, (4, 3, 0, 1, 2))
        else:
            raise KeyError(f"unrecognized flax param block: {block}")
        entries[key] = np.ascontiguousarray(arr, dtype=np.float32)

    def sort_key(k: str):
        rank = {"encoders": 0, "decoders": 1, "final_conv": 2}
        parts = k.split(".")
        # within a decoder, torch registers `upsample` before `double_conv`
        sub = 0 if len(parts) > 2 and parts[2] == "upsample" else 1
        return (rank[parts[0]], parts[: min(len(parts), 2)], sub, k)

    return {k: entries[k] for k in sorted(entries, key=sort_key)}


def swap_final_conv(
    params: dict,
    rng,
    init_channels: int,
    out_channels: int,
    num_conv: int = 1,
) -> dict:
    """Replace the classification head with a freshly initialized one.

    The transfer-learning move (ref transfer_learning/transfer_learning.py:
    160-167): keep the trained trunk, re-init ``final_conv`` for the new
    label set.  Initialization matches torch Conv3d defaults
    (kaiming_uniform(a=sqrt(5)) for weights, uniform(+-1/sqrt(fan_in)) for
    bias) so from-scratch heads start in the same regime as the reference's.
    """
    import math

    from unetsulc_tpu.models.unet3d import FinalConvHead

    rng = np.random.default_rng(rng if isinstance(rng, (int, np.integer)) else None)

    def conv_init(cin: int, cout: int):
        fan_in = cin  # 1x1x1 kernel
        gain = math.sqrt(2.0 / (1 + 5.0))  # kaiming_uniform a=sqrt(5)
        bound_w = gain * math.sqrt(3.0 / fan_in)
        bound_b = 1 / math.sqrt(fan_in)
        kernel = rng.uniform(
            -bound_w, bound_w, size=(1, 1, 1, cin, cout)
        ).astype(np.float32)
        bias = rng.uniform(-bound_b, bound_b, size=(cout,)).astype(np.float32)
        return {"kernel": kernel, "bias": bias}

    new = dict(params)
    if num_conv <= 1:
        new["final_conv"] = {"conv": conv_init(init_channels, out_channels)}
    else:
        chans = FinalConvHead.channel_schedule(
            init_channels, out_channels, num_conv
        )
        new["final_conv"] = {
            str(n): conv_init(chans[n], chans[n + 1]) for n in range(num_conv)
        }
    return new
