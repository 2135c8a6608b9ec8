"""Shape census of the sp2 vs single-device optimized HLO.

The sp=2 per-device peak measured ~1.14x the single-device peak
(scripts/sp_memory_tpu.py, 2026-08-19) instead of dropping — this
script localizes the bytes.  It AOT-compiles both steps (same detached
v5e topology trick), walks the optimized HLO text, and tallies
instruction output shapes by total bytes, flagging any full-X-extent
(unsharded level-0) shapes that appear in the sp2 per-device program —
the signature of an accidental replication.  Shape tallies over-count
vs the real buffer assignment (XLA reuses buffers), so treat the output
as a differential signal (sp2 vs single), not absolute bytes.
"""
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}
SHAPE_RE = re.compile(r"\b(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|pred)\[([0-9,]*)\]")


def census(text: str, top: int = 25):
    tally = Counter()
    counts = Counter()
    for m in SHAPE_RE.finditer(text):
        dt, dims = m.group(1), m.group(2)
        if not dims:
            continue
        n = 1
        for d in dims.split(","):
            n *= int(d)
        b = n * DTYPE_BYTES[dt]
        if b >= 8 << 20:  # only track shapes >= 8 MB
            key = f"{dt}[{dims}]"
            tally[key] += b
            counts[key] += 1
    return tally, counts


ENTRY_RE = re.compile(
    r"= (f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|pred)\[([0-9,]+)\]"
)


def entry_census(text: str):
    """Tally only ENTRY-computation instruction OUTPUTS — the buffers XLA
    actually materializes (fusion-interior lines never allocate).  This
    is the view that localized the sp=2 peak (2026-08-19): the sp2
    program has NO full-X-extent buffer but ~2.3x as many distinct
    level-0-slab buffers as single-device (ring_fill/ring_planes_5d
    concats per conv input in fwd, remat'd bwd, and wgrad/dx), each
    ~0.5x size — net ~1.15x, matching the measured 1.14x peak ratio."""
    tally, counts = Counter(), Counter()
    in_entry = False
    for line in text.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            in_entry = False
        if not in_entry:
            continue
        m = ENTRY_RE.search(line)
        if not m:
            continue
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            n *= int(d)
        b = n * DTYPE_BYTES[dt]
        if b >= 8 << 20:
            key = f"{dt}[{dims}]"
            tally[key] += b
            counts[key] += 1
    return tally, counts


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from unetsulc_tpu.models.unet3d import UNet3D, make_apply_fn
    from unetsulc_tpu.train.step import TrainState, make_train_step, make_train_step_sp

    V, INIT, OUT = 96, 64, 63
    model = UNet3D(
        in_channels=1, out_channels=OUT, init_channel_number=INIT,
        compute_dtype=jnp.bfloat16, pallas_blocks=True,
    )
    params = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 16, 16, 16, 1)), train=True),
        jax.random.key(0),
    )["params"]
    state = jax.eval_shape(lambda p: TrainState.create(p, lr=0.01), params)
    x = jax.ShapeDtypeStruct((1, V, V, V, 1), jnp.float32)
    lb = jax.ShapeDtypeStruct((1, V, V, V), jnp.int32)

    texts = {}
    step1 = make_train_step(
        make_apply_fn(model), num_classes=OUT, momentum=0.9, donate=False
    )
    texts["single"] = step1.lower(state, x, lb).compile().as_text()

    from jax.experimental import topologies

    topo = topologies.get_topology_desc(topology_name="v5e:2x2", platform="tpu")
    devs = np.array(topo.devices[:2]).reshape(1, 2)
    mesh = Mesh(devs, ("data", "space"))
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data", "space"))
    sp_model = model.clone(sp_axis="space")
    step2 = make_train_step_sp(
        make_apply_fn(sp_model), num_classes=OUT, mesh=mesh, momentum=0.9,
        donate=False,
    )
    wsh = lambda t, s: jax.tree.map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=s), t
    )
    texts["sp2"] = (
        step2.lower(
            wsh(state, repl),
            jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=bsh),
            jax.ShapeDtypeStruct(lb.shape, lb.dtype, sharding=bsh),
        )
        .compile()
        .as_text()
    )

    for tag, text in texts.items():
        if "--dump" in sys.argv:
            with open(f"/tmp/hlo_{tag}.txt", "w") as f:
                f.write(text)
        tally, counts = census(text)
        total = sum(tally.values())
        print(f"== {tag}: {total/2**30:.2f} GiB across >=8MB shapes "
              f"(shape-mention sum, not live bytes)")
        for key, b in tally.most_common(25):
            print(f"  {b/2**20:9.1f} MiB  x{counts[key]:3d}  {key}")
        tally, counts = entry_census(text)
        total = sum(tally.values())
        print(f"== {tag} ENTRY-level (materialized outputs): "
              f"{total/2**30:.2f} GiB")
        for key, b in tally.most_common(18):
            print(f"  {b/2**20:9.1f} MiB  x{counts[key]:3d}  {key}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
