"""Golden parity: the engine must bit-match the reference's bundled output.txt.

The bundled workload (input.txt): weights 1 3 4 2, Seq1 len 9711, Seq2 len
2131, mode minimum -> mutant with pos 144 -> 'E', offset 4505, score -4879
(verified against output.txt byte-for-byte, including the missing trailing
newline)."""

import numpy as np
import pytest

from psa_tpu.core.alphabet import encode
from psa_tpu.models.search import AlignmentSearchEngine
from psa_tpu.utils.io import format_output


@pytest.fixture(scope="module")
def golden_result(golden_query):
    eng = AlignmentSearchEngine(golden_query.weights, golden_query.is_max, backend="numpy")
    return eng.search(golden_query.seq1, golden_query.seq2)


def test_golden_fields(golden_result):
    assert golden_result.offset == 4505
    assert golden_result.char_offset == 144
    assert golden_result.sub_char == "E"
    assert golden_result.score == -4879.0


def test_golden_bytes(golden_query, golden_result, golden_expected):
    got = format_output(
        golden_result.mutant(golden_query.seq2), golden_result.offset, golden_result.score
    )
    assert got == golden_expected


def test_golden_max_mode_self_consistent(golden_query):
    """MAX mode on the same sequences: no golden file exists, but the result
    must be reproducible and beat the original score."""
    eng = AlignmentSearchEngine(golden_query.weights, True, backend="numpy")
    c1, c2 = encode(golden_query.seq1), encode(golden_query.seq2)
    res = eng.search_codes(c1, c2)
    from psa_tpu.core.oracle import score_offset_sequential

    total, char_off, sub_code, _ = score_offset_sequential(c1, c2, eng.tables, res.offset)
    assert total == res.score
    assert char_off == res.char_offset
    assert sub_code == res.sub_code


# Pinned MAX-mode golden for input.txt.  The reference ships no max-mode
# output file (BASELINE.json config 1 names both modes), so the winner tuple
# is frozen here as committed constants, derived 2026-08-20 from the numpy
# oracle (offset_stats_numpy + select_best) and independently confirmed by
# the sequential scorer, the native C++ engine, and the xla engine.  The
# substitution engine's max half (get_max_substitute, cuda_funcs.cu:320-345)
# otherwise has no end-to-end anchor: a max-mode-only table regression would
# pass every min-mode golden test.
GOLDEN_MAX = {"offset": 2335, "char_offset": 0, "sub_char": "V",
              "score": -4587.0}


@pytest.mark.parametrize("backend",
                         ["numpy", "native", "xla", "conv", "pallas"])
def test_golden_max_mode_pinned(golden_query, backend):
    eng = AlignmentSearchEngine(golden_query.weights, True, backend=backend)
    res = eng.search(golden_query.seq1, golden_query.seq2)
    assert res.offset == GOLDEN_MAX["offset"]
    assert res.char_offset == GOLDEN_MAX["char_offset"]
    assert res.sub_char == GOLDEN_MAX["sub_char"]
    assert res.score == GOLDEN_MAX["score"]
    # the printed line the reference would write for this result
    from psa_tpu.utils.io import format_output

    out = format_output(res.mutant(golden_query.seq2), res.offset, res.score)
    assert out.endswith("2335 -4587")


def test_golden_max_mode_pinned_sharded(golden_query):
    """The same pinned MAX winner through the mesh-sharded search path."""
    from psa_tpu.core.tables import build_tables
    from psa_tpu.parallel.mesh import make_mesh, search_sharded

    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    c1, c2 = encode(golden_query.seq1), encode(golden_query.seq2)
    tables = build_tables(golden_query.weights, True)
    res = search_sharded(c1, c2, tables, make_mesh())
    assert (res.offset, res.char_offset, res.sub_code, res.score) == (
        GOLDEN_MAX["offset"], GOLDEN_MAX["char_offset"],
        ord(GOLDEN_MAX["sub_char"]) - 65, GOLDEN_MAX["score"])
