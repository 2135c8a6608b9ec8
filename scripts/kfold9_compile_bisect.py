"""Find which K-fold9 kernel kills the tunnel's remote compile helper.

The `UNETSULC_KFOLD9=1` A/B bench (scripts/tpu_queue_r4.sh stage
bench_kfold9) dies with `HTTP 500: tpu_compile_helper subprocess exit
code 1` — a server-side XLA:TPU compile crash with no diagnostic, on a
program whose K-fold9-off twin compiles fine.  This script traces the
flagship train step with the flag on, records every distinct
conv_shards configuration (shape/mode tuple), then AOT-compiles each
one STANDALONE on the attached chip, printing OK/FAIL per config — so
the crash is localized to a kernel shape instead of a 2,000-op program.

Usage: UNETSULC_KFOLD9=1 python scripts/kfold9_compile_bisect.py
(the script forces the flag on regardless).
"""
import os
import sys

os.environ["UNETSULC_KFOLD9"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from unetsulc_tpu.models.unet3d import UNet3D, make_apply_fn
    from unetsulc_tpu.ops import conv_pallas as cp
    from unetsulc_tpu.train.step import TrainState, make_train_step

    V, INIT, OUT = 96, 64, 63
    model = UNet3D(
        in_channels=1,
        out_channels=OUT,
        init_channel_number=INIT,
        compute_dtype=jnp.bfloat16,
        pallas_blocks=True,
    )
    params = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 16, 16, 16, 1)), train=True),
        jax.random.key(0),
    )["params"]
    state = jax.eval_shape(lambda p: TrainState.create(p, lr=0.01), params)
    x = jax.ShapeDtypeStruct((1, V, V, V, 1), jnp.float32)
    lb = jax.ShapeDtypeStruct((1, V, V, V), jnp.int32)

    # -- spy on conv_shards during client-side lowering ------------------
    recorded = {}
    orig = cp.conv_shards

    def sd(v):
        return None if v is None else (tuple(map(int, v.shape)), str(v.dtype))

    def spy(xx, ab, w, bias, **kw):
        kin, xp, ps, cs = (int(v) for v in xx.shape)
        kout, cso = int(w.shape[1]), int(w.shape[-1])
        fold = cso < cp.MAX_SHARD
        kf_rows = ps if fold else ps + 2 * kw["g"].Zp
        kfold = (
            not (kw.get("halo") or kw.get("edge_outputs"))
            and kin * 3 * kf_rows * 9 * cs * xx.dtype.itemsize
            <= cp._KFOLD9_BUDGET
            and not (
                bool(kw.get("stats")) and fold and cs >= 64 and ps >= 8192
            )
        )
        key = (
            sd(xx), sd(ab), sd(w), sd(bias), sd(kw.get("partial")),
            sd(kw.get("post_ab")), sd(kw.get("post_x")),
            kw["g"], bool(kw.get("relu")), bool(kw.get("stats")),
            str(kw.get("out_dtype")), kfold, fold,
        )
        recorded.setdefault(key, 0)
        recorded[key] += 1
        return orig(xx, ab, w, bias, **kw)

    cp.conv_shards = spy
    step = make_train_step(
        make_apply_fn(model), num_classes=OUT, momentum=0.9, donate=False
    )
    lowered = step.lower(state, x, lb)
    cp.conv_shards = orig
    print(f"{len(recorded)} distinct conv_shards configs "
          f"({sum(recorded.values())} calls)", flush=True)

    # -- compile each config standalone, folded ones first ---------------
    r = np.random.default_rng(0)

    def mk(spec):
        if spec is None:
            return None
        shape, dt = spec
        return jnp.asarray(
            r.standard_normal(shape).astype(np.float32) * 0.1
        ).astype(dt)

    failures = 0
    for key in sorted(recorded, key=lambda k: (not k[11], repr(k))):
        (xs, abs_, ws, bs, parts, pabs, pxs, g, relu, stats, od, kfold,
         fold) = key
        tag = (f"kin{xs[0][0]}cs{xs[0][3]} -> kout{ws[0][1]}cso{ws[0][4]} "
               f"Xp{xs[0][1]} ps{xs[0][2]} relu={relu} stats={stats} "
               f"post={pabs is not None} partial={parts is not None} "
               f"kfold={kfold} fold={fold}")
        if not kfold:
            print(f"SKIP (no kfold)  {tag}", flush=True)
            continue

        def f(xx, ab, w, bias, part, pab, px):
            return orig(
                xx, ab, w, bias, g=g, relu=relu, stats=stats,
                out_dtype=jnp.bfloat16 if "bfloat16" in od else None,
                partial=part, post_ab=pab, post_x=px,
            )

        args = (mk(xs_) for xs_ in (xs, abs_, ws, bs, parts, pabs, pxs))
        try:
            jax.jit(f).lower(*args).compile()
            print(f"OK    {tag}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            failures += 1
            msg = str(e).split("\n")[0][:160]
            print(f"FAIL  {tag}\n      {type(e).__name__}: {msg}",
                  flush=True)
    print(f"bisect done: {failures} failing configs", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
