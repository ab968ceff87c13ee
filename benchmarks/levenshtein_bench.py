"""Levenshtein predicate-seeding benchmark: native C++ matrix vs the pure
Python fallback, at DWY100K-scale predicate counts.

The reference computes the P1 x P2 Levenshtein.ratio matrix with a Python
double loop (predicate_alignment.py:46-59); DBP-WD has a few hundred
relations and attributes per KG, so P1*P2 is O(10^5..10^6) ratio calls.
The native path (native/multike_native.cpp lev_ratio_matrix, multithreaded)
does the whole matrix in one call.

Usage: python benchmarks/levenshtein_bench.py [P1] [P2]
Prints one JSON line with both timings and the speedup.
"""
import json
import os
import random
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multike_tpu.utils.native import (have_native, levenshtein_ratio_matrix,
                                      _lev_ratio_py)


def synth_names(n, seed):
    rng = random.Random(seed)
    words = ["".join(rng.choices(string.ascii_lowercase, k=rng.randint(3, 12)))
             for _ in range(max(40, n // 8))]
    return [" ".join(rng.choices(words, k=rng.randint(1, 3)))
            for _ in range(n)]


def main():
    p1 = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    p2 = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    names1 = synth_names(p1, 1)
    names2 = synth_names(p2, 2)

    t0 = time.perf_counter()
    mat = levenshtein_ratio_matrix(names1, names2)
    native_s = time.perf_counter() - t0
    assert mat.shape == (p1, p2)

    # pure-Python fallback, sub-sampled then extrapolated (the full double
    # loop at 500x600 takes minutes)
    sub = min(p1, 60)
    t0 = time.perf_counter()
    for a in names1[:sub]:
        for b in names2:
            _lev_ratio_py(a, b)
    py_s = (time.perf_counter() - t0) * (p1 / sub)

    print(json.dumps({
        "metric": "levenshtein_seed_matrix",
        "p1": p1, "p2": p2,
        "native": have_native(),
        "native_seconds": round(native_s, 4),
        "python_seconds_extrapolated": round(py_s, 2),
        "speedup": round(py_s / max(native_s, 1e-9), 1),
    }))


if __name__ == "__main__":
    main()
