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

Prints ``PER_DEVICE_PEAK <config> <bytes>`` lines with the full
CompiledMemoryStats breakdown (temp = activations/workspace, argument =
replicated state + sharded batch, output, alias) and final ratios.
Always exits 0: this is a measurement, not a gate — the first on-chip
run (2026-08-19) measured sp2/single = 1.14 with donate=False, so the
breakdown below exists precisely to show where the bytes sit before any
claim is made.  Both donate arms are reported: donate=False isolates
temp vs argument accounting; donate=True is the real training setting
(state buffers reused in place).
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


def _report(tag: str, mem) -> int:
    peak = _peak(mem)
    parts = {
        f: getattr(mem, f, None)
        for f in (
            "peak_memory_in_bytes",
            "temp_size_in_bytes",
            "argument_size_in_bytes",
            "output_size_in_bytes",
            "alias_size_in_bytes",
            "generated_code_size_in_bytes",
        )
    }
    print(f"PER_DEVICE_PEAK {tag} {peak}", flush=True)
    print(f"BREAKDOWN {tag} " + " ".join(
        f"{k.removesuffix('_size_in_bytes').removesuffix('_memory_in_bytes')}"
        f"={v}" for k, v in parts.items() if v is not None), flush=True)
    return peak


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

    # single-device reference peak (attached chip), both donate arms
    peaks1 = {}
    for donate in (False, True):
        step1 = make_train_step(
            make_apply_fn(model), num_classes=OUT, momentum=0.9,
            donate=donate,
        )
        mem1 = step1.lower(state, x, lb).compile().memory_analysis()
        peaks1[donate] = _report(
            f"single_device{'_donated' if donate else ''}", mem1
        )
    peak1 = peaks1[False]

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

    def sp_peak(tag, sp_model, donate=False) -> int:
        step2 = make_train_step_sp(
            make_apply_fn(sp_model),
            num_classes=OUT, mesh=mesh, momentum=0.9, donate=donate,
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
        return _report(tag, mem2)

    # round-5 default (deep slab+E, levels 0-2 sharded) vs mid-only
    # (levels 0-1) vs the round-4 replicated-middle layout — the A/B for
    # TpuConfig.sp_shard_middle / sp_shard_deep
    peak2 = sp_peak("sp2", model.clone(sp_axis="space"))
    peak2_don = sp_peak("sp2_donated", model.clone(sp_axis="space"),
                        donate=True)
    peak2_nodeep = sp_peak(
        "sp2_deep_off", model.clone(sp_axis="space", sp_shard_deep=False)
    )
    peak2_off = sp_peak(
        "sp2_mid_off", model.clone(sp_axis="space", sp_shard_middle=False)
    )
    ratio = peak2 / peak1
    print(f"RATIO sp2_mid_off/single = {peak2_off / peak1:.3f}", flush=True)
    print(f"RATIO sp2_deep_off/single = {peak2_nodeep / peak1:.3f}",
          flush=True)
    print(f"RATIO sp2_donated/single_donated = "
          f"{peak2_don / peaks1[True]:.3f}", flush=True)
    print(f"RATIO sp2/single = {ratio:.3f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
