"""MXU efficiency vs contraction width K at flagship conv shapes.

Decides whether K-folding the dx taps (triple phase-buffer slabs) can beat
the current 3-dot-per-plane fwd kernels: times Pallas dots
(ps, K) @ (K, N) for the candidate K/N combos, operands resident in VMEM
scratch (DMA-free), 200 dots per call, one xplane trace per combo.

Also times the slab-build pattern (shifted stores of a (ps, cs) plane into
a (ps, n*cs) scratch) to calibrate the 2-extra-builds/plane cost of the
phase-buffer design.
"""
import sys; sys.path.insert(0, "/root/repo")
import functools, glob, shutil
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from unetsulc_tpu.utils.profiling import summarize_xplane

PS = 10976  # level-0 plane rows (96^3 flagship)
REPS = 200


def dot_kernel(o_ref, a_ref, b_ref, *, k, n):
    @pl.when(pl.program_id(0) == 0)
    def _():
        a_ref[...] = jnp.full(a_ref.shape, 0.5, a_ref.dtype)
        b_ref[...] = jnp.full(b_ref.shape, 0.5, b_ref.dtype)
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)
    acc = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0:1, :] += jnp.sum(acc, axis=0, keepdims=True)


def time_dot(k, n, ps=PS):
    f = pl.pallas_call(
        functools.partial(dot_kernel, k=k, n=n),
        grid=(REPS,),
        in_specs=[],
        out_specs=pl.BlockSpec((8, n), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ps, k), jnp.bfloat16),
            pltpu.VMEM((k, n), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    return jax.jit(lambda: f())


def rdot_kernel(o_ref, a_ref, b_ref, *, m, n):
    # wgrad-style row contraction: (ps, m)^T @ (ps, n) -> (m, n)
    @pl.when(pl.program_id(0) == 0)
    def _():
        a_ref[...] = jnp.full(a_ref.shape, 0.5, a_ref.dtype)
        b_ref[...] = jnp.full(b_ref.shape, 0.5, b_ref.dtype)
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)
    acc = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0:1, 0:1] += jnp.sum(acc, keepdims=True)[0:1, 0:1]


def time_rdot(m, n, ps=PS):
    f = pl.pallas_call(
        functools.partial(rdot_kernel, m=m, n=n),
        grid=(REPS,),
        in_specs=[],
        out_specs=pl.BlockSpec((8, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ps, m), jnp.bfloat16),
            pltpu.VMEM((ps, n), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    return jax.jit(lambda: f())


def build_kernel(o_ref, s_ref, *, cs, copies):
    # emulate the slab build: `copies` shifted stores of a (ps, cs) plane
    @pl.when(pl.program_id(0) == 0)
    def _():
        s_ref[...] = jnp.full(s_ref.shape, 0.25, s_ref.dtype)
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)
    norm = (s_ref[:, 0:cs] * 1.0001).astype(s_ref.dtype)
    ps = norm.shape[0]
    for c in range(copies):
        s_ref[1:ps, c * cs : (c + 1) * cs] = norm[: ps - 1]
    o_ref[0:1, 0:1] += jnp.sum(norm[0:1, 0:1], keepdims=True)


def time_build(cs, copies, ps=PS):
    f = pl.pallas_call(
        functools.partial(build_kernel, cs=cs, copies=copies),
        grid=(REPS,),
        in_specs=[],
        out_specs=pl.BlockSpec((1, 1), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ps, copies * cs), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    return jax.jit(lambda: f())


def time_one(tag, f):
    """Trace one jitted call; return its pallas custom-call device µs."""
    float(np.asarray(f())[0, 0])  # compile + warm
    d = f"/tmp/prof_mxu/{tag}"
    shutil.rmtree(d, ignore_errors=True)
    jax.profiler.start_trace(d)
    float(np.asarray(f())[0, 0])
    jax.profiler.stop_trace()
    p = sorted(glob.glob(f"{d}/**/*.xplane.pb", recursive=True))[-1]
    rows = summarize_xplane(p, top=100000)
    calls = [us for us, h in rows if "custom-call" in h]
    assert calls, f"no pallas call in trace for {tag}"
    return max(calls)


def main():
    combos = [
        (192, 64), (192, 128), (192, 192),
        (384, 128), (384, 192), (384, 384),
        (576, 128), (576, 192), (576, 384),
        (768, 128), (1152, 128),
    ]
    print("== dot timings (per dot, µs; roofline @197TF/s bf16) ==",
          flush=True)
    for k, n in combos:
        us = time_one(f"dot_k{k}_n{n}", time_dot(k, n))
        per = us / REPS
        gf = 2 * PS * k * n / 1e9
        roof = gf / 197e3 * 1e6  # µs
        print(f"K={k:5d} N={n:4d}: {per:7.2f} µs/dot  "
              f"roofline {roof:6.2f} µs  eff {roof/per*100:5.1f}%",
              flush=True)

    print("== row-contraction (wgrad-style) dots ==", flush=True)
    for m, n in [(192, 192), (576, 192), (384, 128), (1152, 128),
                 (192, 576), (64, 192)]:
        us = time_one(f"rdot_m{m}_n{n}", time_rdot(m, n))
        per = us / REPS
        gf = 2 * PS * m * n / 1e9
        roof = gf / 197e3 * 1e6
        print(f"M={m:5d} N={n:4d} (K=ps): {per:7.2f} µs/dot  "
              f"roofline {roof:6.2f} µs  eff {roof/per*100:5.1f}%",
              flush=True)

    print("== slab-build timings (per plane-build, µs) ==", flush=True)
    for cs in (64, 128):
        for c in (1, 3, 9):
            us = time_one(f"build_cs{cs}_x{c}", time_build(cs, c))
            print(f"cs={cs} copies={c}: {us/REPS:7.2f} µs", flush=True)


main()
