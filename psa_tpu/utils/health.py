"""Accelerator health probe.

The remote-TPU plugin used in some deployments retries device init
INDEFINITELY when its tunnel is down (measured: jax.devices() hung >4.5
minutes with the relay dead) — any code path that merely asks "is there an
accelerator?" can hang the whole process.  `effective_platform()` answers
that question with a hard deadline: it probes device init in a SUBPROCESS
and, on timeout/failure, pins the current process to CPU so later JAX use
cannot hang.

Used by the `auto` backend (models/search.resolve_auto, models/batch.
search_batch) and bench.py.  Explicit accelerator backends (`--backend
pallas`) skip the probe: an explicit request should wait, not silently
degrade.
"""

from __future__ import annotations

import subprocess
import sys

_cached: str | None = None
_degraded: bool = False


def was_degraded() -> bool:
    """True iff effective_platform() fell back to CPU because accelerator
    init failed or timed out (not because the process was CPU-only)."""
    return _degraded


def _initialized_backend() -> str | None:
    """The in-process default backend IF device init already completed,
    else None — checked without triggering an init."""
    try:
        from jax._src import xla_bridge as _xb

        if getattr(_xb, "_backends", None):
            import jax

            return jax.default_backend()
    except Exception:  # noqa: BLE001 - private API moved/renamed
        return None
    return None


def _configured_platforms() -> str | None:
    import jax

    try:
        return jax.config.jax_platforms
    except AttributeError:
        return None


def effective_platform(deadline_s: float | None = None) -> str:
    """The platform `jax.default_backend()` would report, bounded in time.

    Returns immediately when the process is already pinned to CPU (e.g.
    tests).  Otherwise runs device init in a subprocess under a deadline;
    on timeout or failure pins THIS process to CPU and returns "cpu".
    The result is cached for the process lifetime.
    """
    global _cached
    if _cached is not None:
        return _cached
    import jax

    plats = _configured_platforms()
    if plats and {p.strip() for p in plats.split(",") if p.strip()} <= {"cpu"}:
        _cached = "cpu"
        return _cached
    # already-initialized in-process backend: init has provably completed,
    # so answer directly instead of paying a duplicate device init in a
    # probe subprocess (the probe exists for the UNinitialized case, where
    # an in-process init attempt could hang unboundedly)
    inproc = _initialized_backend()
    if inproc is not None:
        _cached = inproc
        return _cached
    if deadline_s is None:
        from psa_tpu.config import CONFIG

        deadline_s = CONFIG.probe_deadline
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.default_backend())"],
            timeout=deadline_s, capture_output=True, text=True)
        if r.returncode == 0 and r.stdout.strip():
            _cached = r.stdout.strip().splitlines()[-1]
            return _cached
    except subprocess.TimeoutExpired:
        pass
    print("warning: accelerator init did not complete within "
          f"{deadline_s:.0f}s (dead device tunnel?); pinning this process "
          "to CPU", file=sys.stderr)
    jax.config.update("jax_platforms", "cpu")
    global _degraded
    _degraded = True
    _cached = "cpu"
    return _cached
