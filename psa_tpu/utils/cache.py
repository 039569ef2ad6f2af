"""JAX persistent compilation cache enablement.

Bench harnesses and the CLI call this before first device use so that
deployments with a standard PJRT backend (CPU, directly-attached TPU) reuse
compiled executables across processes.

KNOWN LIMITATION — this does NOT work on this repo's remote-TPU tunnel:
axon's remote-compile PJRT client cannot serialize executables, so the
cache dir stays empty and every fresh process still pays the 30-1400s
Mosaic compile (measured; see CLAUDE.md).  The remote service itself caches
compiles across processes intermittently, but that is outside our control.
The mitigation that DOES work here is architectural: one compiled program
per shape bucket, all work for a shape batched into one process
(models/batch.py's runner caches + microbatch buckets).  The setting is
harmless where serialization fails — it simply never writes.
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
