"""The single-query alignment search engine.

Replaces the reference's orchestration stack (main.c:13-56 ->
cpu_funcs.c:25-218): pick a backend, compute per-offset integer statistics on
the device, select the exact winner on the host.

Backends (all share the same output contract — see ops/select.py):

* ``numpy``  — vectorized host oracle (core/oracle.py); exact, runs anywhere.
* ``xla``    — chunked jnp gather engine under jit (ops/engine_xla.py).
* ``conv``   — one-hot `lax.conv` formulation; the MXU does the lookups
               (ops/engine_conv.py).
* ``pallas`` — hand-written TPU kernel (ops/pallas_sweep.py); the hot path.
* ``native`` — C++/OpenMP host engine (native/), the reference-semantics
               oracle at native speed.
* ``auto``   — pallas on TPU, conv on CPU/GPU test platforms.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from psa_tpu.core.alphabet import encode, validate
from psa_tpu.core.oracle import offset_stats_numpy
from psa_tpu.core.result import SearchResult
from psa_tpu.core.tables import ScoringTables, build_tables
from psa_tpu.ops.select import select_best

_BACKENDS = ("auto", "numpy", "xla", "conv", "pallas", "native")


def _resolve_auto() -> str:
    import jax

    platform = jax.devices()[0].platform
    return "pallas" if platform == "tpu" else "conv"


class AlignmentSearchEngine:
    """Searches every (offset, position, substitution) triple for the best
    single-character mutation of seq2 aligned under seq1."""

    def __init__(self, weights: Sequence[float], is_max: bool,
                 backend: str | None = None, strict_alphabet: bool = True,
                 nthreads: int = 0):
        if backend is None:
            from psa_tpu.config import CONFIG

            backend = CONFIG.default_backend
        if backend not in _BACKENDS:
            raise ValueError(f"unknown backend {backend!r}; choose from {_BACKENDS}")
        self.tables: ScoringTables = build_tables(np.asarray(weights, np.float64), is_max)
        self.backend = backend
        self.strict_alphabet = strict_alphabet
        # native-engine thread count; 0 = all cores, 1 = the reference's
        # sequential oracle mode (`make runseq`, SURVEY.md §3.5)
        self.nthreads = nthreads

    def _resolve_backend(self) -> str:
        if self.backend == "auto":
            self.backend = _resolve_auto()
        return self.backend

    def offset_stats(self, codes1: np.ndarray, codes2: np.ndarray):
        """Per-offset (counts (noff,4) int32, maxrank (noff,) int32)."""
        backend = self._resolve_backend()
        if backend == "numpy":
            return offset_stats_numpy(codes1, codes2, self.tables)
        if backend == "native":
            from psa_tpu.native import offset_stats_native

            return offset_stats_native(codes1, codes2, self.tables)
        if backend == "xla":
            from psa_tpu.ops.engine_xla import offset_stats_xla

            return offset_stats_xla(codes1, codes2, self.tables)
        if backend == "conv":
            from psa_tpu.ops.engine_conv import offset_stats_conv

            return offset_stats_conv(codes1, codes2, self.tables)
        if backend == "pallas":
            from psa_tpu.ops.pallas_sweep import offset_stats_pallas

            return offset_stats_pallas(codes1, codes2, self.tables)
        raise AssertionError(backend)

    def search_codes(self, codes1: np.ndarray, codes2: np.ndarray) -> SearchResult:
        codes1 = np.asarray(codes1, dtype=np.int32)
        codes2 = np.asarray(codes2, dtype=np.int32)
        if codes2.shape[0] > codes1.shape[0]:
            raise ValueError("seq2 must not be longer than seq1")
        if self._resolve_backend() == "native":
            # the native engine applies the reference's sequential semantics
            # directly — no separate selection pass needed
            from psa_tpu.native import search_native

            return search_native(codes1, codes2, self.tables,
                                 nthreads=self.nthreads)
        counts, maxrank = self.offset_stats(codes1, codes2)
        noff = codes1.shape[0] - codes2.shape[0] + 1
        return select_best(np.asarray(counts), np.asarray(maxrank),
                           self.tables, codes1, codes2, noff=noff)

    def search(self, seq1: str, seq2: str) -> SearchResult:
        if self.strict_alphabet and not (validate(seq1) and validate(seq2)):
            raise ValueError(
                "sequences must contain only A-Z and '-' "
                "(pass strict_alphabet=False to accept reference-UB inputs)"
            )
        return self.search_codes(encode(seq1), encode(seq2))


def search(seq1: str, seq2: str, weights: Sequence[float], is_max: bool,
           backend: str = "auto") -> SearchResult:
    """One-shot convenience wrapper."""
    return AlignmentSearchEngine(weights, is_max, backend=backend).search(seq1, seq2)
