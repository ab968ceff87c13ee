"""Ring-decomposed eval tests on the virtual 8-device mesh."""
import numpy as np
import pytest

from multike_tpu.eval.ring import ring_rank_and_align
from multike_tpu.parallel.mesh import make_mesh

rng = np.random.RandomState(11)


def _dense_oracle(e1, e2):
    def nrm(x):
        return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)

    s = nrm(e1) @ nrm(e2).T
    n1, n2 = s.shape
    ranks = np.array([np.sum((s[i] > s[i, i]) & (np.arange(n2) != i))
                      for i in range(n1)])
    return ranks, s.argmax(1)


def test_ring_rank_matches_dense():
    mesh = make_mesh(8, 1)
    n1, n2, d = 96, 160, 12
    e1 = rng.randn(n1, d).astype(np.float32)
    e2 = rng.randn(n2, d).astype(np.float32)
    e2[:n1] += 2 * e1
    count, best = ring_rank_and_align(mesh, e1, e2)
    want_r, want_b = _dense_oracle(e1, e2)
    assert np.array_equal(count, want_r)
    assert np.array_equal(best, want_b)


def test_ring_rank_with_row_padding():
    mesh = make_mesh(8, 1)
    # sizes NOT divisible by 8 exercise the padding path
    n1, n2, d = 61, 115, 9
    e1 = rng.randn(n1, d).astype(np.float32)
    e2 = rng.randn(n2, d).astype(np.float32)
    e2[:n1] += 1.5 * e1
    count, best = ring_rank_and_align(mesh, e1, e2)
    want_r, want_b = _dense_oracle(e1, e2)
    assert np.array_equal(count, want_r)
    assert np.array_equal(best, want_b)


def test_ring_csls_matches_blockwise_engine():
    """Ring-distributed CSLS (penalty top-k pass + adjusted ranker) equals
    the single-device blockwise engine (VERDICT r2 item 8)."""
    from multike_tpu.eval.alignment import rank_and_align

    mesh = make_mesh(8, 1)
    n1, n2, d, k = 72, 136, 10, 5
    e1 = rng.randn(n1, d).astype(np.float32)
    e2 = rng.randn(n2, d).astype(np.float32)
    e2[:n1] += 1.5 * e1
    r_ring, b_ring = ring_rank_and_align(mesh, e1, e2, csls_k=k)
    r_blk, b_blk = rank_and_align(e1, e2, normalize=True, csls_k=k,
                                  use_pallas=False, mesh=None)
    assert np.array_equal(r_ring, r_blk)
    assert np.array_equal(b_ring, b_blk)


def test_ring_csls_with_row_padding():
    from multike_tpu.eval.alignment import rank_and_align

    mesh = make_mesh(8, 1)
    n1, n2, d, k = 53, 101, 8, 4
    e1 = rng.randn(n1, d).astype(np.float32)
    e2 = rng.randn(n2, d).astype(np.float32)
    e2[:n1] += 1.5 * e1
    r_ring, b_ring = ring_rank_and_align(mesh, e1, e2, csls_k=k)
    r_blk, b_blk = rank_and_align(e1, e2, normalize=True, csls_k=k,
                                  use_pallas=False, mesh=None)
    assert np.array_equal(r_ring, r_blk)
    assert np.array_equal(b_ring, b_blk)
