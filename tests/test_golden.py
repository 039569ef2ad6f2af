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
