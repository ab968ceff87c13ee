"""ctypes bindings to the native C++ helpers in native/libmultike_native.so.

Provides:
  * ``levenshtein_ratio_matrix(names1, names2)`` — dense Levenshtein.ratio
    matrix used by predicate alignment seeding (predicate_alignment.py:46-59
    computes this with an O(P1*P2) Python double loop; here it is one C++
    call, multithreaded).
  * ``tsv_read_triples(path)`` — fast triple-file reader used by the data
    layer when available.

Every entry point has a pure-Python fallback so the package works without the
compiled library (e.g. before `make -C native`).
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Sequence

_LIB = None
_LIB_TRIED = False


def _find_lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.path.join(here, "native", "libmultike_native.so"),
        os.path.join(os.path.dirname(__file__), "libmultike_native.so"),
    ]
    for c in candidates:
        if os.path.exists(c):
            try:
                lib = ctypes.CDLL(c)
                lib.lev_ratio_matrix.restype = None
                lib.lev_ratio_matrix.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                    ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ]
                if hasattr(lib, "vec_scan"):
                    lib.vec_scan.restype = ctypes.c_int
                    lib.vec_scan.argtypes = [
                        ctypes.c_char_p, ctypes.c_int,
                        ctypes.POINTER(ctypes.c_longlong),
                        ctypes.POINTER(ctypes.c_longlong),
                    ]
                    lib.vec_parse.restype = ctypes.c_int
                    lib.vec_parse.argtypes = [
                        ctypes.c_char_p, ctypes.c_int,
                        ctypes.POINTER(ctypes.c_float), ctypes.c_char_p,
                        ctypes.c_longlong, ctypes.c_longlong,
                    ]
                _LIB = lib
                return _LIB
            except OSError:
                continue
    return None


def have_native() -> bool:
    return _find_lib() is not None


# ---------------------------------------------------------------------------
# Levenshtein ratio
# ---------------------------------------------------------------------------

def _lev_ratio_py(a: str, b: str) -> float:
    """python-Levenshtein's ratio(): (len(a)+len(b)-D)/(len(a)+len(b)) where D
    is the *weighted* edit distance with substitution cost 2 (equivalently
    based on matching blocks). Matches Levenshtein.ratio used at
    predicate_alignment.py:53."""
    la, lb = len(a), len(b)
    total = la + lb
    if total == 0:
        return 1.0
    # DP over weighted distance: ins/del cost 1, substitution cost 2.
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            sub = prev[j - 1] + (0 if ca == b[j - 1] else 2)
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, sub)
        prev = cur
    return (total - prev[lb]) / total


def levenshtein_ratio_matrix(names1: Sequence[str], names2: Sequence[str]):
    """Returns an (n1, n2) float64 numpy array of Levenshtein ratios."""
    import numpy as np

    n1, n2 = len(names1), len(names2)
    out = np.zeros((n1, n2), dtype=np.float64)
    if n1 == 0 or n2 == 0:
        return out
    lib = _find_lib()
    if lib is not None:
        b1 = [s.encode("utf-8") for s in names1]
        b2 = [s.encode("utf-8") for s in names2]
        arr1 = (ctypes.c_char_p * n1)(*b1)
        arr2 = (ctypes.c_char_p * n2)(*b2)
        threads = min(8, os.cpu_count() or 1)
        lib.lev_ratio_matrix(arr1, n1, arr2, n2,
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                             threads)
        return out
    try:  # optional accelerated fallback
        import Levenshtein as _L

        for i, s1 in enumerate(names1):
            for j, s2 in enumerate(names2):
                out[i, j] = _L.ratio(s1, s2)
        return out
    except ImportError:
        pass
    for i, s1 in enumerate(names1):
        for j, s2 in enumerate(names2):
            out[i, j] = _lev_ratio_py(s1, s2)
    return out


def levenshtein_ratio(a: str, b: str) -> float:
    try:
        import Levenshtein as _L

        return _L.ratio(a, b)
    except ImportError:
        return _lev_ratio_py(a, b)


# ---------------------------------------------------------------------------
# Fast .vec word-embedding parsing
# ---------------------------------------------------------------------------

def read_word2vec_native(file_path: str, vector_dimension: int = 300):
    """C++ fast path for the reference's word2vec scan (utils.py:94-105):
    returns {word: float32 vector} for lines with exactly dim+1 fields, or
    None when the native library is unavailable."""
    import numpy as np

    lib = _find_lib()
    if lib is None or not hasattr(lib, "vec_scan"):
        return None
    n = ctypes.c_longlong()
    wb = ctypes.c_longlong()
    path_b = file_path.encode("utf-8")
    if lib.vec_scan(path_b, vector_dimension, ctypes.byref(n),
                    ctypes.byref(wb)) != 0:
        return None
    n_v, wb_v = n.value, wb.value
    if n_v == 0:
        return {}
    mat = np.empty((n_v, vector_dimension), np.float32)
    words_buf = ctypes.create_string_buffer(wb_v)
    rc = lib.vec_parse(path_b, vector_dimension,
                       mat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       words_buf, n_v, wb_v)
    if rc != 0:
        return None
    words = bytes(words_buf.raw[:wb_v]).decode("utf-8").split("\n")[:-1]
    if len(words) != n_v:
        return None
    # later duplicates win, matching the Python dict-update order
    return {w: mat[i] for i, w in enumerate(words)}


# ---------------------------------------------------------------------------
# TSV reading
# ---------------------------------------------------------------------------

def tsv_read_triples(path: str) -> List[List[str]]:
    """Read a TSV file into a list of column lists (no cleaning)."""
    rows: List[List[str]] = []
    with open(path, "r", encoding="utf8") as f:
        for line in f:
            rows.append(line.strip("\n").split("\t"))
    return rows
