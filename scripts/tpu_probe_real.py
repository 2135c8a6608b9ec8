"""Probe the TPU with a REAL computation, not just backend init.

Round-3 lesson: during a tunnel flap, ``jax.devices()`` can succeed (or
the PJRT client can construct) while every subsequent compile fails with
``UNAVAILABLE: TPU backend setup/compile error`` — the round-3 watcher
took that false positive and burned its whole measurement queue on a dead
chip.  This probe only exits 0 after a jitted matmul compiles, runs, and
returns the exact expected scalar.

Usage: ``timeout 300 python scripts/tpu_probe_real.py`` (exit 0 = chip
genuinely usable).
"""
import sys


def main() -> int:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    if dev.platform == "cpu":
        # The tunnel env ships JAX_PLATFORMS=axon; resolving to cpu means
        # something stripped the env — that is NOT a usable-TPU signal.
        print("PROBE_CPU_ONLY", dev)
        return 2
    x = jnp.ones((512, 512), jnp.bfloat16)
    v = float(jax.jit(lambda a: (a @ a).astype(jnp.float32).sum())(x))
    if v != float(512**3):
        print("PROBE_BAD_VALUE", v)
        return 3
    print("TPU_REALLY_OK", dev, v)
    return 0


if __name__ == "__main__":
    sys.exit(main())
