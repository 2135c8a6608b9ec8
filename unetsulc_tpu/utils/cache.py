"""Persistent XLA compilation cache setup.

The 3D U-Net at static shapes compiles to a handful of executables; caching
them on disk makes every process after the first start instantly (both the
TPU chip and the CPU test mesh).  Call before the first jit execution.
"""

from __future__ import annotations

import os


def honor_platform_env() -> None:
    """Re-assert the user's JAX_PLATFORMS choice.

    Some PJRT plugins (e.g. the axon TPU tunnel in this image) prepend
    themselves to ``jax_platforms`` during import, overriding the
    environment variable.  Calling this before first backend use restores
    the documented env-var semantics (needed for the CPU test mesh)."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)


def enable_compilation_cache(path: str | None = None) -> None:
    honor_platform_env()
    import jax

    path = path or os.environ.get(
        "UNETSULC_JAX_CACHE", os.path.expanduser("~/.cache/unetsulc_jax")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
