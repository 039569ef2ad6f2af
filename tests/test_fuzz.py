"""Randomized differential fuzz: conv/pallas/xla engines and the native C++
engine must produce identical SearchResults to the numpy oracle across random
shapes, modes, weights, and hyphen densities (SURVEY.md §4 implication (2),
widened)."""

import numpy as np
import pytest

from psa_tpu.models.search import AlignmentSearchEngine

from conftest import random_codes

N_CASES = 12


def _case(rng):
    n2 = int(rng.integers(1, 400))
    n1 = n2 + int(rng.integers(0, 1200))
    weights = np.round(rng.uniform(-4, 6, size=4) * 4) / 4  # quarter-integers
    is_max = bool(rng.integers(0, 2))
    hyphen_p = float(rng.choice([0.0, 0.05, 0.3]))
    c1 = random_codes(rng, n1, hyphen_p)
    c2 = random_codes(rng, n2, hyphen_p)
    return c1, c2, weights, is_max


@pytest.mark.parametrize("engine", ["conv", "pallas", "native"])
def test_fuzz_engine_vs_oracle(engine):
    rng = np.random.default_rng(987)
    for case in range(N_CASES):
        c1, c2, weights, is_max = _case(rng)
        ref_eng = AlignmentSearchEngine(weights, is_max, backend="numpy")
        got_eng = AlignmentSearchEngine(weights, is_max, backend=engine)
        try:
            ref = ref_eng.search_codes(c1, c2)
            ref_exc = None
        except Exception as e:
            ref, ref_exc = None, type(e)
        try:
            got = got_eng.search_codes(c1, c2)
            got_exc = None
        except Exception as e:
            got, got_exc = None, type(e)
        assert got_exc == ref_exc, (case, weights, is_max, got_exc, ref_exc)
        assert got == ref, (case, weights.tolist(), is_max, got, ref)
