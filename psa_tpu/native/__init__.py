"""ctypes bindings for the native C++ search engine.

The shared library is built on first use with g++ (no pip/pybind needed) and
cached next to the source.  All tables are passed in from core/tables.py, so
the C++ stays semantics-free glue + hot loops.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from psa_tpu.core.result import NoMutationFound, SearchResult
from psa_tpu.core.tables import ScoringTables

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "psa_native.cpp")
_LIB = os.path.join(_DIR, "_libpsa.so")
_lock = threading.Lock()
_lib = None

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", _LIB + ".tmp",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_LIB + ".tmp", _LIB)


def get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.psa_search.restype = ctypes.c_int
        lib.psa_search.argtypes = [
            _i32p, ctypes.c_int32, _i32p, ctypes.c_int32,
            _f64p, _f64p, _i8p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.psa_score_offset.restype = None
        lib.psa_score_offset.argtypes = [
            _i32p, _i32p, ctypes.c_int32,
            _f64p, _f64p, _i8p,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.psa_offset_stats.restype = None
        lib.psa_offset_stats.argtypes = [
            _i32p, _i32p, ctypes.c_int32, _i8p, _i8p,
            ctypes.c_int32, ctypes.c_int32, _i32p, _i32p,
        ]
        _lib = lib
        return lib


def _flat_tables(tables: ScoringTables):
    pair_w = np.ascontiguousarray(tables.pair_w.reshape(-1))
    diff = np.ascontiguousarray(tables.diff.reshape(-1))
    sub = np.ascontiguousarray(tables.sub.reshape(-1))
    return pair_w, diff, sub


def search_native(codes1: np.ndarray, codes2: np.ndarray,
                  tables: ScoringTables, nthreads: int = 0,
                  first_offset: int = 0, last_offset: int | None = None) -> SearchResult:
    lib = get_lib()
    codes1 = np.ascontiguousarray(codes1, np.int32)
    codes2 = np.ascontiguousarray(codes2, np.int32)
    noff = codes1.shape[0] - codes2.shape[0] + 1
    if last_offset is None:
        last_offset = noff
    pair_w, diff, sub = _flat_tables(tables)
    score = ctypes.c_double()
    off = ctypes.c_int32()
    coff = ctypes.c_int32()
    sc = ctypes.c_int32()
    found = lib.psa_search(
        codes1, codes1.shape[0], codes2, codes2.shape[0],
        pair_w, diff, sub, int(tables.is_max), first_offset, last_offset,
        nthreads,
        ctypes.byref(score), ctypes.byref(off), ctypes.byref(coff),
        ctypes.byref(sc),
    )
    if not found:
        raise NoMutationFound("no offset admits a legal substitution")
    return SearchResult(offset=off.value, char_offset=coff.value,
                        sub_code=sc.value, score=score.value)


def score_offset_native(codes1: np.ndarray, codes2: np.ndarray,
                        tables: ScoringTables, offset: int):
    """Native sequential re-scorer, same contract as score_offset_sequential."""
    lib = get_lib()
    codes1 = np.ascontiguousarray(codes1, np.int32)
    codes2 = np.ascontiguousarray(codes2, np.int32)
    pair_w, diff, sub = _flat_tables(tables)
    total = ctypes.c_double()
    coff = ctypes.c_int32()
    sc = ctypes.c_int32()
    lib.psa_score_offset(codes1, codes2, codes2.shape[0], pair_w, diff, sub,
                         int(tables.is_max), offset,
                         ctypes.byref(total), ctypes.byref(coff), ctypes.byref(sc))
    return total.value, coff.value, sc.value, None


def offset_stats_native(codes1: np.ndarray, codes2: np.ndarray,
                        tables: ScoringTables):
    """Per-offset integer stats with the device-engine contract."""
    lib = get_lib()
    codes1 = np.ascontiguousarray(codes1, np.int32)
    codes2 = np.ascontiguousarray(codes2, np.int32)
    noff = codes1.shape[0] - codes2.shape[0] + 1
    sign = np.ascontiguousarray(tables.sign.reshape(-1))
    rank = np.ascontiguousarray(tables.rank.reshape(-1))
    counts = np.empty((noff, 4), np.int32)
    maxrank = np.empty(noff, np.int32)
    lib.psa_offset_stats(codes1, codes2, codes2.shape[0], sign, rank,
                         0, noff, counts.reshape(-1), maxrank)
    return counts, maxrank
