"""Streaming serve mode (`psa --serve`).

The serving analog of the reference's one-shot flow (cpu_funcs.c:25-121):
query lines stream in on stdin, result lines stream back in order, and a bad
query yields an error line instead of killing the server.
"""

import io
import json
import subprocess
import sys

import numpy as np
import pytest

from psa_tpu.models.search import AlignmentSearchEngine
from psa_tpu.utils.cli import main
from psa_tpu.utils.generator import random_sequences


def _query_line(seed, n1=120, n2=30, weights="1 3 4 2", mode="minimum"):
    s1, s2 = random_sequences(n1, n2, seed=seed)
    return f"{weights} {s1} {s2} {mode}"


def _expected(line):
    toks = line.split()
    eng = AlignmentSearchEngine(np.array([float(t) for t in toks[:4]]),
                                toks[6] == "maximum", backend="numpy")
    res = eng.search(toks[4], toks[5])
    return "%d %g %s" % (res.offset, res.score, res.mutant(toks[5]))


def test_serve_streams_results_in_order(monkeypatch, capsys):
    lines = [_query_line(seed) for seed in range(3)]
    monkeypatch.setattr(sys, "stdin", io.StringIO("\n".join(lines) + "\n"))
    assert main(["--serve", "--quiet", "--backend", "native"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == [_expected(ln) for ln in lines]


def test_serve_error_line_keeps_server_alive(monkeypatch, capsys):
    good = _query_line(7)
    text = "1 2 3 nonsense AB A minimum\n" + "\n" + good + "\n"
    monkeypatch.setattr(sys, "stdin", io.StringIO(text))
    assert main(["--serve", "--quiet", "--backend", "native"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2                    # blank line ignored
    assert out[0].startswith("error ")
    assert out[1] == _expected(good)


def test_serve_rejects_non_finite_weights(monkeypatch, capsys):
    """Adversarial inf/nan weight lines get an `error ...` reply instead of
    silently corrupting the rank tables (VERDICT r3 weak #5) — covering both
    the words the C scanner hands to Python ('inf') and the overflow literal
    strtod itself parses to inf ('1e999')."""
    good = _query_line(11)
    text = ("inf 3 4 2 ABCD AB minimum\n"
            "1 nan 4 2 ABCD AB maximum\n"
            "1e999 3 4 2 ABCD AB minimum\n" + good + "\n")
    monkeypatch.setattr(sys, "stdin", io.StringIO(text))
    assert main(["--serve", "--quiet", "--backend", "native"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 4
    for bad in out[:3]:
        assert bad.startswith("error ") and "finite" in bad
    assert out[3] == _expected(good)


def test_serve_rejects_out_of_alphabet_without_lenient(monkeypatch, capsys):
    monkeypatch.setattr(sys, "stdin", io.StringIO("1 3 4 2 ABCj AB minimum\n"))
    assert main(["--serve", "--quiet"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1 and out[0].startswith("error ")
    # and the same line is served under --lenient
    monkeypatch.setattr(sys, "stdin", io.StringIO("1 3 4 2 ABCj AB minimum\n"))
    assert main(["--serve", "--quiet", "--lenient", "--backend",
                 "numpy"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1 and not out[0].startswith("error ")


def test_serve_json_mode(monkeypatch, capsys):
    line = _query_line(11)
    monkeypatch.setattr(sys, "stdin",
                        io.StringIO(line + "\nbad line\n"))
    assert main(["--serve", "--quiet", "--json", "--backend", "native"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    ok = json.loads(out[0])
    want = _expected(line).split(maxsplit=2)
    assert ok["mutation_found"] is True
    assert ok["offset"] == int(want[0])
    assert ok["mutant"] == want[2]
    assert json.loads(out[1]).keys() == {"error"}


def test_serve_mixed_modes_and_weights_one_chunk(monkeypatch, capsys):
    """Queries with different (weights, mode) land in different buckets but
    still come back in input order."""
    lines = [
        _query_line(0, mode="minimum"),
        _query_line(1, weights="2 1 1 5", mode="maximum"),
        _query_line(2, n1=200, n2=50, mode="minimum"),
    ]
    monkeypatch.setattr(sys, "stdin", io.StringIO("\n".join(lines) + "\n"))
    assert main(["--serve", "--quiet", "--backend", "numpy"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == [_expected(ln) for ln in lines]


class _PipeStream:
    """Minimal stdin stand-in exposing a real pipe fd."""

    def __init__(self, fd):
        self._fd = fd

    def fileno(self):
        return self._fd


def test_serve_line_reader_cap_and_eof_mid_buffer():
    """Complete lines buffered beyond the chunk cap must come back as
    separate lines on later chunks, even when EOF (with a trailing
    unterminated line) arrives in between."""
    import os

    from psa_tpu.utils.cli import _ServeLineReader

    r, w = os.pipe()
    os.write(w, b"a\nb\nc\nd\ntail-no-newline")
    os.close(w)
    reader = _ServeLineReader(_PipeStream(r))
    lines1, eof1 = reader.next_chunk(2)
    assert [ln.strip() for ln in lines1] == ["a", "b"] and not eof1
    lines2, eof2 = reader.next_chunk(2)
    assert [ln.strip() for ln in lines2] == ["c", "d"] and not eof2
    lines3, eof3 = reader.next_chunk(2)
    assert [ln.strip() for ln in lines3] == ["tail-no-newline"] and eof3
    lines4, eof4 = reader.next_chunk(2)
    assert lines4 == [] and eof4
    os.close(r)


def test_serve_line_reader_coalesces_available_lines():
    """Everything already on the fd lands in one chunk (up to the cap)."""
    import os

    from psa_tpu.utils.cli import _ServeLineReader

    r, w = os.pipe()
    os.write(w, b"1\n2\n3\n")
    reader = _ServeLineReader(_PipeStream(r))
    lines, eof = reader.next_chunk(10)
    assert [ln.strip() for ln in lines] == ["1", "2", "3"] and not eof
    os.write(w, b"4\n")
    os.close(w)
    lines, eof = reader.next_chunk(10)
    assert [ln.strip() for ln in lines] == ["4"] and eof
    os.close(r)


def test_serve_sharded_device_path(monkeypatch, capsys):
    """--serve --sharded routes device buckets through the mesh-sharded
    exact batch path (interpret on the 8-device CPU mesh)."""
    # this test is about the sharded DEVICE path: disable cold-bucket host
    # routing (on real hardware it would host-route the first chunk and
    # leave a background compile in flight at process exit)
    monkeypatch.setenv("PSA_COLD_ROUTE", "0")
    lines = [_query_line(seed, n1=700, n2=120) for seed in range(3)]
    monkeypatch.setattr(sys, "stdin", io.StringIO("\n".join(lines) + "\n"))
    assert main(["--serve", "--quiet", "--sharded",
                 "--backend", "pallas"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == [_expected(ln) for ln in lines]


def test_serve_client_gone_exits_quietly(monkeypatch, capsys):
    """A BrokenPipeError on the reply stream ends the server with
    128+SIGPIPE, not a traceback."""
    import builtins

    lines = [_query_line(3)]
    monkeypatch.setattr(sys, "stdin", io.StringIO("\n".join(lines) + "\n"))
    real_print = builtins.print

    def broken(*a, **k):
        if k.get("file") is None:
            raise BrokenPipeError()
        real_print(*a, **k)

    monkeypatch.setattr(builtins, "print", broken)
    assert main(["--serve", "--quiet", "--backend", "native"]) == 141


@pytest.mark.slow
def test_serve_partial_line_does_not_block_complete_queries():
    """A complete query followed by a PARTIAL second line on the pipe must
    be answered immediately — the drain may not block on the unterminated
    line (review finding: fd-level reader vs blocking readline)."""
    import queue
    import threading

    q1, q2 = _query_line(0), _query_line(1)
    proc = subprocess.Popen(
        [sys.executable, "-m", "psa_tpu.utils.cli", "--serve", "--quiet",
         "--platform", "cpu", "--backend", "native"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, bufsize=1)
    replies: queue.Queue = queue.Queue()
    threading.Thread(target=lambda: [replies.put(ln.rstrip("\n"))
                                     for ln in proc.stdout],
                     daemon=True).start()
    try:
        proc.stdin.write(q1 + "\n" + q2[:10])   # q2 unterminated
        proc.stdin.flush()
        assert replies.get(timeout=120) == _expected(q1)
        proc.stdin.write(q2[10:] + "\n")
        proc.stdin.flush()
        assert replies.get(timeout=120) == _expected(q2)
    finally:
        proc.stdin.close()
        proc.wait(timeout=60)
    assert proc.returncode == 0


@pytest.mark.slow
def test_serve_subprocess_pipe_coalesces():
    """End-to-end through a real pipe: chunks coalesce (serve-batch 2) and
    every query is answered in order."""
    lines = [_query_line(seed) for seed in range(5)]
    proc = subprocess.run(
        [sys.executable, "-m", "psa_tpu.utils.cli", "--serve", "--quiet",
         "--serve-batch", "2", "--platform", "cpu", "--backend", "native"],
        input="\n".join(lines) + "\n", capture_output=True, text=True,
        timeout=300)
    assert proc.returncode == 0, proc.stderr
    out = proc.stdout.strip().splitlines()
    assert out == [_expected(ln) for ln in lines]
