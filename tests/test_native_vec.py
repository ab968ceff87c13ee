"""Native .vec parser parity tests."""
import numpy as np
import pytest

from multike_tpu.text.word2vec import read_word2vec
from multike_tpu.utils.native import have_native, read_word2vec_native


def _write_vec(path, n, d, seed=0):
    rng = np.random.RandomState(seed)
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"{n} {d}\n")  # header: wrong field count => skipped
        for i in range(n):
            f.write(f"word{i} " + " ".join(f"{x:.4f}" for x in rng.randn(d))
                    + "\n")
        f.write("malformed 1 2\n")


def test_native_library_is_built():
    """The C++ helper library must be present in CI (conftest builds it via
    `make -C native` when missing) — the Levenshtein predicate seeding and
    .vec parsing hot spots must not silently fall back to Python."""
    assert have_native()


@pytest.mark.skipif(not have_native(), reason="native lib not built")
def test_native_vec_matches_python(tmp_path):
    p = str(tmp_path / "w.vec")
    d = 16
    _write_vec(p, 500, d)
    native = read_word2vec_native(p, d)
    assert native is not None and len(native) == 500

    # pure-python oracle (reference utils.py:94-105 semantics)
    py = {}
    for line in open(p, encoding="utf-8"):
        parts = line.strip("\n").split(" ")
        if len(parts) != d + 1:
            continue
        py[parts[0]] = np.array(list(map(float, parts[1:])), np.float32)
    assert set(native) == set(py)
    for w in list(py)[:50]:
        np.testing.assert_allclose(native[w], py[w], atol=1e-6)


def test_read_word2vec_uses_best_available(tmp_path):
    p = str(tmp_path / "w.vec")
    _write_vec(p, 50, 8)
    out = read_word2vec(p, 8)
    assert len(out) == 50
    assert out["word0"].dtype == np.float32
