"""JAX persistent compilation cache enablement.

This environment has no JAX_COMPILATION_CACHE_DIR set, so every fresh
process re-compiles its kernels — through the remote-TPU tunnel that costs
minutes per shape.  Bench harnesses and the CLI call this before first
device use; if the backend's PJRT client cannot serialize executables the
setting is harmless.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    import jax

    if jax.config.jax_compilation_cache_dir:
        return  # already configured (env or caller)
    path = os.environ.get("PSA_JAX_CACHE") or os.path.join(
        os.environ.get("XDG_CACHE_HOME")
        or os.path.join(os.path.expanduser("~"), ".cache"),
        "jax_psa")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # cache is an optimization, never a failure
