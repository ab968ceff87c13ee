"""Pallas kernel tests (interpret mode on CPU; compiled on real TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multike_tpu.kernels.rank_kernel import rank_count_pallas

rng = np.random.RandomState(3)


def _norm(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _setup(n1, n2, d):
    e1 = rng.randn(n1, d).astype(np.float32)
    e2 = rng.randn(n2, d).astype(np.float32)
    e2[:n1] += 2 * e1
    e1n, e2n = _norm(e1), _norm(e2)
    gold = np.sum(e1n * e2n[:n1], axis=1).astype(np.float32)
    gidx = np.arange(n1, dtype=np.int32)
    return e1n, e2n, gold, gidx


def test_rank_kernel_matches_dense():
    n1, n2, d = 100, 230, 16
    e1, e2, gold, gidx = _setup(n1, n2, d)
    cnt, bidx, bval = rank_count_pallas(
        jnp.asarray(e1), jnp.asarray(gold), jnp.asarray(gidx),
        jnp.asarray(e2), bm=32, bn=64, interpret=True)
    s = e1 @ e2.T
    want_cnt = np.array([np.sum((s[i] > s[i, i]) & (np.arange(n2) != i))
                         for i in range(n1)])
    assert np.array_equal(np.asarray(cnt), want_cnt)
    assert np.array_equal(np.asarray(bidx), s.argmax(1))
    assert np.allclose(np.asarray(bval), s.max(1), atol=1e-5)


def test_rank_kernel_csls():
    from multike_tpu.eval.similarity import csls_sim

    n1, n2, d = 40, 70, 8
    e1, e2, gold, gidx = _setup(n1, n2, d)
    k = 4
    s = e1 @ e2.T
    sc = csls_sim(s, k)
    # column penalty r2 and adjusted gold, as eval/alignment.py computes them
    r2 = (-np.sort(-s.T, axis=1))[:, :k].mean(axis=1).astype(np.float32)
    gold_adj = (2 * gold - r2[:n1]).astype(np.float32)
    cnt, bidx, _ = rank_count_pallas(
        jnp.asarray(e1), jnp.asarray(gold_adj), jnp.asarray(gidx),
        jnp.asarray(e2), jnp.asarray(r2), bm=16, bn=32, use_csls=True,
        interpret=True)
    want_cnt = np.array([np.sum((sc[i] > sc[i, i]) & (np.arange(n2) != i))
                         for i in range(n1)])
    assert np.array_equal(np.asarray(cnt), want_cnt)


def test_rank_and_align_pallas_path_matches_xla():
    from multike_tpu.eval.alignment import rank_and_align

    n1, n2, d = 90, 140, 12
    e1 = rng.randn(n1, d).astype(np.float32)
    e2 = rng.randn(n2, d).astype(np.float32)
    e2[:n1] += 1.5 * e1
    rx, bx = rank_and_align(e1, e2, use_pallas=False)
    # interpret-mode pallas on CPU via monkeypatched kernel call
    import multike_tpu.eval.alignment as al
    from multike_tpu.kernels import rank_kernel as rk
    import functools

    orig = rk.rank_count_pallas

    def interp(*a, **kw):
        kw["interpret"] = True
        kw.setdefault("bm", 32)
        kw.setdefault("bn", 64)
        return orig(*a, **kw)

    rk.rank_count_pallas = interp
    try:
        rp, bp = rank_and_align(e1, e2, use_pallas=True)
    finally:
        rk.rank_count_pallas = orig
    assert np.array_equal(rx, rp)
    assert np.array_equal(bx, bp)
