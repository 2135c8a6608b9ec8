"""Per-device memory analysis of the sp pipeline at flagship shape.

VERDICT r3 item 3: spatial sharding exists so volumes exceeding one
chip's HBM can train — so per-device peak memory must actually drop with
the mesh.  tests/test_parallel.py::test_sp_memory_scales pins the program
*structure* (every all_gather at most pooled-size) on the CPU mesh, where
interpret-mode kernel scratch drowns byte-level numbers; this script gets
the real bytes by AOT-compiling the TPU program against a *detached*
2-chip topology (jax.experimental.topologies — no 2-chip hardware
needed, only the attached chip's compiler) and comparing per-device peak
vs the single-device step.

Prints ``PER_DEVICE_PEAK <config> <bytes>`` lines and a final ratio.
Exit 0 iff the sp=2 peak is under 75% of single-device (activations
dominate at 96^3 x 64ch; params/optimizer state are replicated either
way, so the ratio cannot reach 0.5).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _abstract_inputs(model, lr):
    import jax
    import jax.numpy as jnp

    from unetsulc_tpu.train.step import TrainState

    params = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 16, 16, 16, 1)), train=True),
        jax.random.key(0),
    )["params"]
    state = jax.eval_shape(lambda p: TrainState.create(p, lr=lr), params)
    return state


def _peak(mem) -> int:
    """Per-device peak bytes from a CompiledMemoryStats, tolerant of
    field-name differences across PJRT versions."""
    v = getattr(mem, "peak_memory_in_bytes", 0)
    if v:
        return int(v)
    return int(
        getattr(mem, "temp_size_in_bytes", 0)
        + getattr(mem, "argument_size_in_bytes", 0)
        + getattr(mem, "output_size_in_bytes", 0)
        - getattr(mem, "alias_size_in_bytes", 0)
    )


def _with_sharding(tree, sharding):
    import jax

    return jax.tree.map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=sharding),
        tree,
    )


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from unetsulc_tpu.models.unet3d import UNet3D, make_apply_fn
    from unetsulc_tpu.train.step import make_train_step, make_train_step_sp

    V, INIT, OUT = 96, 64, 63
    model = UNet3D(
        in_channels=1,
        out_channels=OUT,
        init_channel_number=INIT,
        compute_dtype=jnp.bfloat16,
        pallas_blocks=True,
    )
    state = _abstract_inputs(model, lr=0.01)
    x = jax.ShapeDtypeStruct((1, V, V, V, 1), jnp.float32)
    lb = jax.ShapeDtypeStruct((1, V, V, V), jnp.int32)

    # single-device reference peak (attached chip)
    step1 = make_train_step(
        make_apply_fn(model), num_classes=OUT, momentum=0.9, donate=False
    )
    mem1 = step1.lower(state, x, lb).compile().memory_analysis()
    peak1 = _peak(mem1)
    print("PER_DEVICE_PEAK single_device", peak1, flush=True)

    # sp=2 peak against a detached topology (the attached tunnel exposes
    # ONE chip; the compiler doesn't need the others to exist)
    from jax.experimental import topologies

    topo = None
    for name in ("v5e:1x2", "v5e:2x2", "v5litepod-4", "v5litepod-8"):
        try:
            topo = topologies.get_topology_desc(
                topology_name=name, platform="tpu"
            )
            print("topology:", name, len(topo.devices), "devices", flush=True)
            break
        except Exception as e:  # noqa: BLE001 — plugin-dependent names
            print(f"topology {name} unavailable: {type(e).__name__}: {e}",
                  flush=True)
    if topo is None:
        print("NO detached topology available from this PJRT plugin")
        return 1

    devs = np.array(topo.devices[:2]).reshape(1, 2)
    mesh = Mesh(devs, ("data", "space"))
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data", "space"))

    def sp_peak(sp_model) -> int:
        step2 = make_train_step_sp(
            make_apply_fn(sp_model),
            num_classes=OUT, mesh=mesh, momentum=0.9, donate=False,
        )
        mem2 = (
            step2.lower(
                _with_sharding(state, repl),
                jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=bsh),
                jax.ShapeDtypeStruct(lb.shape, lb.dtype, sharding=bsh),
            )
            .compile()
            .memory_analysis()
        )
        return _peak(mem2)

    # round-5 default (deep slab+E, levels 0-2 sharded) vs mid-only
    # (levels 0-1) vs the round-4 replicated-middle layout — the A/B for
    # TpuConfig.sp_shard_middle / sp_shard_deep
    peak2 = sp_peak(model.clone(sp_axis="space"))
    print("PER_DEVICE_PEAK sp2", peak2, flush=True)
    peak2_nodeep = sp_peak(
        model.clone(sp_axis="space", sp_shard_deep=False)
    )
    print("PER_DEVICE_PEAK sp2_deep_off", peak2_nodeep, flush=True)
    peak2_off = sp_peak(
        model.clone(sp_axis="space", sp_shard_middle=False)
    )
    print("PER_DEVICE_PEAK sp2_mid_off", peak2_off, flush=True)
    ratio = peak2 / peak1
    print(f"RATIO sp2_mid_off/single = {peak2_off / peak1:.3f}", flush=True)
    print(f"RATIO sp2_deep_off/single = {peak2_nodeep / peak1:.3f}",
          flush=True)
    print(f"RATIO sp2/single = {ratio:.3f}", flush=True)
    return 0 if ratio < 0.75 else 2


if __name__ == "__main__":
    sys.exit(main())
