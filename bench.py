#!/usr/bin/env python
"""Benchmark: UNet3D train-step throughput (voxels/sec/chip, fwd+bwd).

The north-star metric (BASELINE.json): voxels/sec/chip through the full
training step (forward bf16 + masked CE + backward + SGD update) on the
flagship UNet3D (1 -> init 64 -> 63 classes) at a realistic hemisphere
volume (96^3 after the reference's /2 downsample, cf. SURVEY.md §2.3).

The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
compares against the measured torch-CPU reference baseline recorded in
BASELINE.md (same model/volume/step, torch 2.13 CPU) — reproduce it with
``python bench.py --torch-cpu-baseline``.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import os
import sys
import time
from typing import Optional

import numpy as np

# torch-CPU reference baseline, measured in this image on 2026-08-16
# (see BASELINE.md): python bench.py --torch-cpu-baseline
TORCH_CPU_BASELINE_VOXELS_PER_SEC = 10524.3

VOLUME = (96, 96, 96)
BATCH = 1
OUT_CHANNELS = 63
INIT_CH = 64
STEPS = 20
WARMUP = 3


def _make_batch(rng, batch, volume):
    inputs = (rng.random((batch, *volume, 1)) < 0.02).astype(np.float32)
    labels = np.where(
        inputs[..., 0] > 0,
        rng.integers(0, OUT_CHANNELS, (batch, *volume)),
        -1,
    ).astype(np.int32)
    return inputs, labels


# BASELINE.json transfer configs -> torch-name freeze prefixes
# (ref transfer_learning.py:330-335 semantics; see train/freeze.py)
FREEZE_CONFIGS = {
    "final_conv": ["final_conv"],
    "decoders": ["final_conv", "decoders.2", "decoders.1", "decoders.0"],
}


def bench_jax(batch: int = BATCH, freeze: Optional[str] = None) -> float:
    import jax
    import jax.numpy as jnp

    from unetsulc_tpu.models.unet3d import UNet3D
    from unetsulc_tpu.train.step import TrainState, make_train_step

    model = UNet3D(
        in_channels=1,
        out_channels=OUT_CHANNELS,
        init_channel_number=INIT_CH,
        compute_dtype=jnp.bfloat16,
        pallas_blocks=True,
    )
    rng = np.random.default_rng(0)
    inputs, labels = _make_batch(rng, batch, VOLUME)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)), train=True
    )["params"]

    from unetsulc_tpu.models.unet3d import make_apply_fn

    apply_fn = make_apply_fn(model)
    state = TrainState.create(
        params, lr=0.01,
        training_layers=FREEZE_CONFIGS[freeze] if freeze else None,
    )
    # batch>1 scans per-volume forwards so every volume keeps the fused
    # Pallas pipeline (train/step.py scan_batch; VERDICT r2 item 5)
    step = make_train_step(
        apply_fn, num_classes=OUT_CHANNELS, momentum=0.9, scan_batch=True
    )

    inputs = jax.device_put(jnp.asarray(inputs))
    labels = jax.device_put(jnp.asarray(labels))

    for _ in range(WARMUP):
        state, loss, _ = step(state, inputs, labels)
        float(loss)

    # measure exactly like the training loop (method/training._epoch_pass):
    # losses accumulate on device, one scalar fetch at the end.  The fetch
    # is a true data-dependency sync on all steps; bare block_until_ready
    # can return early through the axon device tunnel.
    t0 = time.perf_counter()
    loss_terms = []
    for _ in range(STEPS):
        state, loss, _ = step(state, inputs, labels)
        loss_terms.append(loss)
    float(sum(loss_terms))
    dt = time.perf_counter() - t0

    voxels = batch * int(np.prod(VOLUME)) * STEPS
    return voxels / dt


def bench_torch_cpu() -> float:
    """Reference-equivalent torch CPU baseline (same model/volume/step)."""
    import torch

    sys.path.insert(0, "tests")
    from torch_oracle import UNet3DOracle

    torch.manual_seed(0)
    model = UNet3DOracle(1, OUT_CHANNELS, init_channel_number=INIT_CH)
    model.train()
    opt = torch.optim.SGD(model.parameters(), lr=0.01, momentum=0.9)
    crit = torch.nn.CrossEntropyLoss(ignore_index=-1)
    rng = np.random.default_rng(0)
    inputs, labels = _make_batch(rng, BATCH, VOLUME)
    x = torch.from_numpy(inputs).permute(0, 4, 1, 2, 3)
    y = torch.from_numpy(labels.astype(np.int64))

    steps = 3
    # warmup
    opt.zero_grad()
    loss = crit(model(x), y)
    loss.backward()
    opt.step()
    t0 = time.perf_counter()
    for _ in range(steps):
        opt.zero_grad()
        loss = crit(model(x), y)
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0
    return BATCH * int(np.prod(VOLUME)) * steps / dt


def bench_label_latency() -> float:
    """p50 single-volume labeling latency (BASELINE.json metric #2):
    eval forward + softmax + voxel-of-interest gather on one 96^3 volume."""
    import jax
    import jax.numpy as jnp

    from unetsulc_tpu.models.unet3d import UNet3D, make_apply_fn
    from unetsulc_tpu.train.step import make_label_fn

    model = UNet3D(
        in_channels=1,
        out_channels=OUT_CHANNELS,
        init_channel_number=INIT_CH,
        compute_dtype=jnp.bfloat16,
        pallas_blocks=True,
    )
    rng = np.random.default_rng(0)
    inputs, _ = _make_batch(rng, 1, VOLUME)
    # 30k bucket voxels padded to the same 4096-multiple bucket the
    # labeling() path uses (method/base.py)
    n_pad = 32768
    coords = rng.integers(0, VOLUME[0], size=(3, n_pad)).astype(np.int32)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)), train=True
    )["params"]

    label = make_label_fn(make_apply_fn(model))

    x = jax.device_put(jnp.asarray(inputs))
    c = [jax.device_put(jnp.asarray(v)) for v in coords]
    ypred, scores = label(params, x, *c)  # compile
    np.asarray(ypred)
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        ypred, scores = label(params, x, *c)
        np.asarray(ypred), np.asarray(scores)
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(times, 50))

    # amortized multi-volume mode: the threshold sweep's software pipeline
    # (method/base.py test_thresholds) dispatches volume k+1 before
    # fetching volume k, overlapping device compute with the tunnel fetch.
    # This measures the effective per-volume latency of that pattern.
    n_vols = 16
    t0 = time.perf_counter()
    handles = []
    for _ in range(n_vols):
        handles.append(label(params, x, *c))
        if len(handles) > 1:
            yp, sc = handles.pop(0)
            np.asarray(yp), np.asarray(sc)
    for yp, sc in handles:
        np.asarray(yp), np.asarray(sc)
    amortized = (time.perf_counter() - t0) / n_vols
    print(
        json.dumps(
            {
                "metric": "label_latency_amortized_pipelined",
                "value": round(amortized * 1e3, 1),
                "unit": "ms/volume",
                "n_volumes": n_vols,
            }
        )
    )

    # production threshold-sweep pattern (method/base.py test_thresholds,
    # tpu.device_vote): the score matrix stays on device; per volume the
    # host fetches the small ypred, computes each threshold's
    # re-segmentation (cut_part_ids — real host work, included), and
    # fetches only the (T, n_parts) vote table.  Synthetic fold geometry
    # at realistic scale: ~60 elementary folds over the bucket voxels.
    from unetsulc_tpu.ops.cutting import cut_part_ids_multi
    from unetsulc_tpu.train.step import make_vote_fn

    n_real = 30000
    bck2 = rng.integers(0, VOLUME[0], size=(n_real, 3))
    # realistic fold geometry: elementary folds are spatially compact, so
    # derive the fold id from a coarse grid cell of the coordinates (the
    # cutting cost depends on per-fold bounding boxes, and scattering a
    # fold across the whole volume would bench an impossible worst case)
    cell = max(1, VOLUME[0] // 4)
    vert = (
        (bck2[:, 0] // cell) * 16 + (bck2[:, 1] // cell) * 4 + bck2[:, 2] // cell
    )
    thresholds = [50, 100, 150]  # BASELINE.json inference config
    vote = make_vote_fn()
    handles = []
    # component accumulators (VERDICT r4 weak 5: did the bottleneck move
    # from the tunnel's score fetch to the host geometry?): per-volume
    # serial time in the ypred fetch, the host-side scipy/KD-tree
    # re-segmentation, and the vote dispatch+fetch
    comp = {"ypred_fetch": 0.0, "host_geometry": 0.0, "vote_roundtrip": 0.0}

    def sweep(handle, measure=True):
        t1 = time.perf_counter()
        ypred = np.asarray(handle[0])[:n_real]
        t2 = time.perf_counter()
        parts = cut_part_ids_multi(ypred, vert, bck2, thresholds)
        p_pad = max(128, -(-(int(parts.max()) + 1) // 128) * 128)
        pid = np.full((len(thresholds), n_pad), p_pad, np.int32)
        pid[:, :n_real] = parts
        t3 = time.perf_counter()
        np.asarray(vote(handle[1], jnp.asarray(pid), p_pad))
        t4 = time.perf_counter()
        if measure:
            comp["ypred_fetch"] += t2 - t1
            comp["host_geometry"] += t3 - t2
            comp["vote_roundtrip"] += t4 - t3

    sweep(label(params, x, *c), measure=False)  # compile the vote executable
    t0 = time.perf_counter()
    for _ in range(n_vols):
        handles.append(label(params, x, *c))
        if len(handles) > 1:
            sweep(handles.pop(0))
    for h in handles:
        sweep(h)
    sweep_amortized = (time.perf_counter() - t0) / n_vols
    print(
        json.dumps(
            {
                "metric": "label_sweep_latency_amortized_device_vote",
                "value": round(sweep_amortized * 1e3, 1),
                "unit": "ms/volume",
                "n_volumes": n_vols,
                "thresholds": thresholds,
                "breakdown_ms_per_volume": {
                    k: round(v / n_vols * 1e3, 1) for k, v in comp.items()
                },
            }
        )
    )
    return p50


def bench_multichip(dp: int, sp: int, equivalence: Optional[bool] = None):
    """Real train step over a (data=dp, space=sp) mesh.

    One flag away from a real multi-chip number the day hardware exists:
    on TPU hardware this measures weak scaling of the actual training
    step; on the CPU backend (or when --check-equivalence is passed) it
    additionally asserts that the sharded step reproduces the
    single-device loss on the same global batch.  Returns voxels/sec
    across the whole mesh.
    """
    import jax

    from unetsulc_tpu.utils.cache import honor_platform_env

    honor_platform_env()  # the axon PJRT plugin stomps JAX_PLATFORMS

    import jax.numpy as jnp

    from unetsulc_tpu.models.unet3d import UNet3D, make_apply_fn
    from unetsulc_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
    from unetsulc_tpu.train.step import (
        TrainState,
        make_train_step,
        make_train_step_dp,
    )

    on_cpu = jax.default_backend() == "cpu"
    if equivalence is None:
        equivalence = on_cpu
    if sp > 1 and equivalence:
        # matched kernel config for the sp equivalence check only: level-0
        # halo-mode convs always run the rolling-slab kernels while the
        # single-device reference (and the sp step's replicated middle
        # levels) default to the K-folded dots, whose different float
        # summation order breaks exactness.  The TPU measurement run
        # (equivalence False) keeps kfold on so the middle levels bench
        # the shipped kernels.
        import os

        os.environ["UNETSULC_KFOLD9"] = "0"
    # CPU = correctness harness (tiny shapes); TPU = the real measurement
    volume = (16, 16, 16) if on_cpu else VOLUME
    init_ch = 8 if on_cpu else INIT_CH
    out_ch = 5 if on_cpu else OUT_CHANNELS
    steps = 3 if on_cpu else STEPS

    mesh = make_mesh(data=dp, space=sp)
    model = UNet3D(
        in_channels=1,
        out_channels=out_ch,
        init_channel_number=init_ch,
        compute_dtype=jnp.float32 if on_cpu else jnp.bfloat16,
        # both mesh shapes bench the production shard_map paths: pure DP
        # runs each device's local batch-1 volume on the fused Pallas
        # pipeline; space>1 runs the spatially-sharded Pallas pipeline
        # (sp_axis halo kernels, parallel/sp_pallas.py)
        pallas_blocks=True,
    )
    rng = np.random.default_rng(0)
    batch = max(dp, 1)
    inputs, labels = _make_batch(rng, batch, volume)
    labels = np.where(labels >= out_ch, -1, labels).astype(np.int32)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)), train=True
    )["params"]
    apply_fn = make_apply_fn(model)
    if sp > 1:
        from unetsulc_tpu.train.step import make_train_step_sp

        step = make_train_step_sp(
            make_apply_fn(model.clone(sp_axis="space")),
            num_classes=out_ch, mesh=mesh, momentum=0.9, donate=False,
            scan_batch=True,
        )
    elif dp > 1:
        step = make_train_step_dp(
            apply_fn, num_classes=out_ch, mesh=mesh, momentum=0.9,
            donate=False,
        )
    else:
        step = make_train_step(
            apply_fn, num_classes=out_ch, momentum=0.9, donate=False
        )

    state = jax.device_put(TrainState.create(params, lr=0.01), replicate(mesh))
    bs = batch_sharding(mesh)
    in_d = jax.device_put(jnp.asarray(inputs), bs)
    lb_d = jax.device_put(jnp.asarray(labels), bs)

    state, loss, _ = step(state, in_d, lb_d)  # compile
    first_loss = float(loss)

    if equivalence:
        ref_state = TrainState.create(params, lr=0.01)
        ref_step = make_train_step(
            apply_fn, num_classes=out_ch, momentum=0.9, donate=False,
            scan_batch=sp > 1,
        )
        _, ref_loss, _ = ref_step(
            ref_state, jax.device_put(jnp.asarray(inputs)),
            jax.device_put(jnp.asarray(labels)),
        )
        assert abs(first_loss - float(ref_loss)) <= 1e-5 * max(
            1.0, abs(float(ref_loss))
        ), f"mesh loss {first_loss} != single-device {float(ref_loss)}"

    t0 = time.perf_counter()
    loss_terms = []
    for _ in range(steps):
        state, loss, _ = step(state, in_d, lb_d)
        loss_terms.append(loss)
    float(sum(loss_terms))
    dt = time.perf_counter() - t0
    return batch * int(np.prod(volume)) * steps / dt


def _probe_backend(timeout_s: int | None = None) -> bool:
    """True iff the backend initializes AND compiles within ``timeout_s``.

    TPU-tunnel outages make ANY jax backend init hang forever under the
    default platform (CLAUDE.md); probing in a subprocess (same env, so
    the same platform resolution) lets bench fail loudly with a JSON
    error line instead of hanging the driver.  Round-3 lesson: during a
    tunnel flap ``jax.devices()`` can succeed while every compile fails
    UNAVAILABLE, so on non-CPU backends the probe runs a real jitted
    matmul and checks the value (cf. scripts/tpu_probe_real.py).

    Round-5 lesson: the tunnel's client-admit latency is wildly variable
    (tens of seconds to several minutes between identical probes), so a
    tight timeout misreads a slow-admit window as an outage; default 300s,
    raise via ``UNETSULC_PROBE_TIMEOUT`` for patient callers (the
    measurement queue sets 900)."""
    import subprocess
    import sys

    if timeout_s is None:
        timeout_s = int(os.environ.get("UNETSULC_PROBE_TIMEOUT", "300"))
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "from unetsulc_tpu.utils.cache import honor_platform_env;"
             "honor_platform_env(); import jax; import jax.numpy as jnp;"
             "d = jax.devices()[0];"
             "v = (float(jax.jit(lambda a: (a @ a).astype(jnp.float32)"
             ".sum())(jnp.ones((512, 512), jnp.bfloat16)))"
             "     if d.platform != 'cpu' else float(512**3));"
             "assert v == float(512**3), v"],
            timeout=timeout_s, capture_output=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _metric_for(args):
    """Metric name the successful run would have printed.

    Error JSONs carry the same metric as the run that failed so the
    measurement queue's logs attribute failures correctly (round-4
    advisor finding: the catch-all always said train_voxels_per_sec
    even for --latency / --freeze / mesh runs).
    """
    if args.torch_cpu_baseline:
        return "torch_cpu_unet3d_train_voxels_per_sec"
    if args.dp or args.sp > 1:
        return "unet3d_train_voxels_per_sec_mesh"
    if args.latency:
        return "label_latency_p50"
    metric = "unet3d_train_voxels_per_sec_per_chip"
    if args.freeze:
        metric += f"_freeze_{args.freeze}"
    return metric


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch-cpu-baseline", action="store_true")
    ap.add_argument("--latency", action="store_true")
    ap.add_argument(
        "--batch", type=int, default=BATCH,
        help="train-step batch size (batch>1 scans volumes on the fused "
        "pipeline)",
    )
    ap.add_argument(
        "--freeze", choices=sorted(FREEZE_CONFIGS), default=None,
        help="bench a BASELINE.json transfer config: train step with the "
        "named trainable set (frozen subtrees are dead-code-eliminated)",
    )
    ap.add_argument("--dp", type=int, default=0, help="data-parallel axis")
    ap.add_argument("--sp", type=int, default=1, help="spatial-parallel axis")
    ap.add_argument("--check-equivalence", action="store_true")
    args = ap.parse_args()

    if not args.torch_cpu_baseline and not _probe_backend():
        print(
            json.dumps(
                {
                    "metric": _metric_for(args),
                    "value": 0.0,
                    "unit": "voxels/sec",
                    "vs_baseline": 0.0,
                    "error": "jax backend init+compile probe did not "
                    f"succeed in {os.environ.get('UNETSULC_PROBE_TIMEOUT', '300')}s"
                    " (TPU tunnel outage? see CLAUDE.md)",
                    "last_measured_onchip": {
                        "unet3d_train_voxels_per_sec_per_chip": 10472331.0,
                        "date": "2026-08-19",
                        "note": "real v5e measurement from the same kernel"
                        " set, recorded in BASELINE.md 'Current"
                        " performance'; this run failed only because the"
                        " backend was unreachable",
                    },
                }
            )
        )
        sys.exit(1)

    try:
        _dispatch(args)
    except Exception as e:  # noqa: BLE001 — the driver needs a JSON line
        print(
            json.dumps(
                {
                    "metric": _metric_for(args),
                    "value": 0.0,
                    "unit": "voxels/sec",
                    "vs_baseline": 0.0,
                    "error": f"{type(e).__name__}: {e}"[:500],
                }
            )
        )
        sys.exit(1)


def _dispatch(args):
    from unetsulc_tpu.utils.cache import honor_platform_env

    honor_platform_env()  # the axon PJRT plugin stomps JAX_PLATFORMS

    if args.dp or args.sp > 1:
        v = bench_multichip(
            max(args.dp, 1), args.sp,
            equivalence=args.check_equivalence or None,
        )
        print(
            json.dumps(
                {
                    "metric": "unet3d_train_voxels_per_sec_mesh",
                    "value": round(v, 1),
                    "unit": "voxels/sec",
                    "vs_baseline": round(
                        v / TORCH_CPU_BASELINE_VOXELS_PER_SEC, 2
                    ),
                    "mesh": {"data": max(args.dp, 1), "space": args.sp},
                }
            )
        )
        return

    if args.latency:
        p50 = bench_label_latency()
        print(
            json.dumps(
                {
                    "metric": "label_latency_p50",
                    "value": round(p50 * 1e3, 2),
                    "unit": "ms/volume",
                    "vs_baseline": 0.0,
                }
            )
        )
        return

    if args.torch_cpu_baseline:
        v = bench_torch_cpu()
        print(
            json.dumps(
                {
                    "metric": "torch_cpu_unet3d_train_voxels_per_sec",
                    "value": round(v, 1),
                    "unit": "voxels/sec",
                    "vs_baseline": 1.0,
                }
            )
        )
        return

    v = bench_jax(batch=args.batch, freeze=args.freeze)
    metric = "unet3d_train_voxels_per_sec_per_chip"
    if args.freeze:
        metric += f"_freeze_{args.freeze}"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(v, 1),
                "unit": "voxels/sec",
                "vs_baseline": round(v / TORCH_CPU_BASELINE_VOXELS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
