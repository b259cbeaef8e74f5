"""ctypes wrapper for the native metrics kernel (``native/fastmetrics.cpp``).

Loads ``libfastmetrics.so`` from the package dir; if absent and a C++
compiler is available, builds it once on first import (cached).  All callers
go through :mod:`img2latex_tpu.ops.metrics`, which falls back to the numpy
implementations when neither is possible — results are bit-identical either
way (``tests/test_native.py``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import List, Sequence, Tuple

import numpy as np

_SO_PATH = os.path.join(os.path.dirname(__file__), "libfastmetrics.so")
_SRC_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "fastmetrics.cpp",
)


def _build() -> bool:
    if not os.path.exists(_SRC_PATH):
        return False
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", _SRC_PATH, "-o", _SO_PATH]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        return res.returncode == 0 and os.path.exists(_SO_PATH)
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load() -> ctypes.CDLL:
    if not os.path.exists(_SO_PATH) and not _build():
        raise ImportError("libfastmetrics.so unavailable and build failed")
    lib = ctypes.CDLL(_SO_PATH)
    lib.levenshtein.restype = ctypes.c_int32
    lib.levenshtein.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.bleu_n.restype = ctypes.c_double
    lib.bleu_n.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.batch_metrics.restype = None
    lib.batch_metrics.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    return lib


_lib = _load()

_I32P = ctypes.POINTER(ctypes.c_int32)
_I64P = ctypes.POINTER(ctypes.c_int64)
_F64P = ctypes.POINTER(ctypes.c_double)


def _as_i32(seq: Sequence[int]) -> np.ndarray:
    return np.ascontiguousarray(seq, dtype=np.int32)


def levenshtein(a: Sequence[int], b: Sequence[int]) -> int:
    aa, bb = _as_i32(a), _as_i32(b)
    return int(
        _lib.levenshtein(aa.ctypes.data_as(_I32P), len(aa), bb.ctypes.data_as(_I32P), len(bb))
    )


def bleu_n(gen: Sequence[int], ref: Sequence[int], n: int = 4) -> float:
    g, r = _as_i32(gen), _as_i32(ref)
    return float(
        _lib.bleu_n(g.ctypes.data_as(_I32P), len(g), r.ctypes.data_as(_I32P), len(r), n)
    )


def _flatten(seqs: Sequence[Sequence[int]]) -> Tuple[np.ndarray, np.ndarray]:
    offsets = np.zeros(len(seqs) + 1, dtype=np.int64)
    for i, s in enumerate(seqs):
        offsets[i + 1] = offsets[i] + len(s)
    flat = np.empty(int(offsets[-1]), dtype=np.int32)
    for i, s in enumerate(seqs):
        flat[offsets[i] : offsets[i + 1]] = np.asarray(s, dtype=np.int32)
    return flat, offsets


def batch_metrics(
    predictions: Sequence[Sequence[int]], targets: Sequence[Sequence[int]], n: int = 4
) -> Tuple[np.ndarray, np.ndarray]:
    """(bleu[i], lev_similarity[i]) for every pair, in one native call."""
    assert len(predictions) == len(targets)
    n_pairs = len(predictions)
    flat_a, off_a = _flatten(predictions)
    flat_b, off_b = _flatten(targets)
    out_bleu = np.empty(n_pairs, dtype=np.float64)
    out_lev = np.empty(n_pairs, dtype=np.float64)
    _lib.batch_metrics(
        flat_a.ctypes.data_as(_I32P),
        off_a.ctypes.data_as(_I64P),
        flat_b.ctypes.data_as(_I32P),
        off_b.ctypes.data_as(_I64P),
        n_pairs,
        n,
        out_bleu.ctypes.data_as(_F64P),
        out_lev.ctypes.data_as(_F64P),
    )
    return out_bleu, out_lev
