"""Exact winner selection from per-offset integer statistics.

Device engines return, per offset, exact integer sign-class counts and the
best substitution rank.  This module reconstructs exact f64 totals on the
host and applies the reference's canonical tie-break
(cuda_funcs.cu:290-307 / SURVEY.md §0.3):

    best score -> lowest offset -> lowest char position -> alphabetically
    first substitute (the last two are baked into rank construction and the
    winner-offset rescan).

Because the reference accumulates its per-offset f64 score *sequentially*
(cpu_funcs.c:278), while our score comes from grouped counts, near-tied
candidates are re-scored with `score_offset_sequential` so the final choice
and the printed score are bit-identical to the reference in all practical
cases (they are always identical when the weights are exactly representable,
e.g. integers or short binary fractions).
"""

from __future__ import annotations

import numpy as np

from psa_tpu.core.oracle import score_offset_sequential
from psa_tpu.core.result import NoMutationFound, SearchResult
from psa_tpu.core.tables import ScoringTables

from psa_tpu.config import CONFIG

_MAX_CANDIDATES = CONFIG.max_candidates
_rescorer = None


def _rescore(codes1, codes2, tables, offset):
    """Sequential reference-order re-scorer: native C++ when buildable,
    pure-Python transcription otherwise."""
    global _rescorer
    if _rescorer is None:
        try:
            from psa_tpu.native import get_lib, score_offset_native

            get_lib()  # force the lazy g++ build NOW so failure falls back
            _rescorer = score_offset_native
        except Exception:  # no toolchain / build failure: Python oracle
            _rescorer = score_offset_sequential
    return _rescorer(codes1, codes2, tables, offset)


def totals_from_stats(counts: np.ndarray, maxrank: np.ndarray,
                      tables: ScoringTables) -> np.ndarray:
    """Exact f64 post-substitution totals per offset (+-inf where no sub)."""
    score = tables.score_from_counts(counts)
    bad = -np.inf if tables.is_max else np.inf
    diffv = np.where(maxrank >= 0, tables.diff_vals[np.clip(maxrank, 0, None)], bad)
    return score + diffv


def select_best(counts: np.ndarray, maxrank: np.ndarray, tables: ScoringTables,
                codes1: np.ndarray, codes2: np.ndarray,
                noff: int | None = None) -> SearchResult:
    """Pick the winning (offset, char_offset, substitute) triple.

    `counts`/`maxrank` may be padded beyond the true offset count; pass `noff`
    to mask the padding.
    """
    counts = np.asarray(counts)
    maxrank = np.asarray(maxrank)
    n_rows = maxrank.shape[0]
    if noff is None:
        noff = n_rows
    valid = np.zeros(n_rows, dtype=bool)
    valid[:noff] = maxrank[:noff] >= 0
    if not valid.any():
        raise NoMutationFound("no offset admits a legal substitution")

    totals = totals_from_stats(counts, maxrank, tables)
    totals = np.where(valid, totals, -np.inf if tables.is_max else np.inf)

    best = totals.max() if tables.is_max else totals.min()
    eps = 1e-8 * (1.0 + abs(best))
    cand = np.nonzero(np.abs(totals - best) <= eps)[0]
    cand = cand[:_MAX_CANDIDATES]

    # Re-score candidates with the reference's sequential float semantics and
    # apply is_swapable ordering (strictly better, else keep the lower offset
    # — candidates are scanned in ascending offset order).
    best_total = None
    winner = None
    for o in cand.tolist():
        total, char_off, sub_code, _ = _rescore(codes1, codes2, tables, o)
        if char_off < 0:
            continue
        if best_total is None or (
            (tables.is_max and total > best_total)
            or (not tables.is_max and total < best_total)
        ):
            best_total = total
            winner = (o, char_off, sub_code)
    if winner is None:  # unreachable given `valid.any()`, kept as a guard
        raise NoMutationFound("no offset admits a legal substitution")
    o, char_off, sub_code = winner
    return SearchResult(offset=o, char_offset=char_off,
                        sub_code=sub_code, score=float(best_total))
