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


def test_fused_row_adagrad_matches_row_apply():
    """The fused Pallas apply (interpret mode) must equal the XLA
    sparse_adagrad.row_apply on duplicated batch ids."""
    from multike_tpu.kernels.apply_kernel import fused_row_adagrad_pallas
    from multike_tpu.train import sparse_adagrad

    E, d, N = 40, 8, 23
    param = jnp.asarray(rng.randn(E, d), jnp.float32)
    acc = sparse_adagrad.init_acc(param)
    ids = jnp.asarray(rng.randint(0, E, N), jnp.int32)
    g_rows = jnp.asarray(rng.randn(N, d), jnp.float32)
    lr = 0.1

    want_p, want_a = sparse_adagrad.row_apply(param, acc, ids, g_rows, lr)

    # reproduce row_apply's dedup to build (loc, gsum) for the kernel
    order = jnp.argsort(ids)
    sid = jnp.take(ids, order)
    sg = jnp.take(g_rows, order, axis=0)
    is_start = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    gsum = jnp.zeros_like(g_rows).at[seg].add(sg)
    loc = (E + jnp.arange(N, dtype=ids.dtype)).at[seg].set(sid)

    got_p, got_a = fused_row_adagrad_pallas(param, acc, loc, gsum, lr,
                                            bl=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a),
                               rtol=2e-6, atol=1e-7)


def test_fused_row_adagrad_untouched_rows_identical():
    from multike_tpu.kernels.apply_kernel import fused_row_adagrad_pallas
    from multike_tpu.train import sparse_adagrad

    E, d = 30, 4
    param = jnp.asarray(rng.randn(E, d), jnp.float32)
    acc = sparse_adagrad.init_acc(param)
    loc = jnp.asarray([2, 5, 17, E + 0, E + 1], jnp.int32)  # 2 sentinels
    gsum = jnp.asarray(rng.randn(5, d), jnp.float32)
    got_p, got_a = fused_row_adagrad_pallas(param, acc, loc, gsum, 0.05,
                                            bl=4, interpret=True)
    untouched = sorted(set(range(E)) - {2, 5, 17})
    np.testing.assert_array_equal(np.asarray(got_p)[untouched],
                                  np.asarray(param)[untouched])
    np.testing.assert_array_equal(np.asarray(got_a)[untouched],
                                  np.asarray(acc)[untouched])


def test_rel_view_epoch_with_pallas_apply_matches_default():
    """A rel_view epoch on the row-sparse path with use_pallas_apply
    (interpreted on CPU) must equal the XLA apply bit-for-bit-ish."""
    from multike_tpu.config import Config
    from multike_tpu.params import init_params
    from multike_tpu.train import streams

    E, R, n = 60, 6, 150
    t1 = np.stack([rng.randint(0, 30, n), rng.randint(0, R, n),
                   rng.randint(0, 30, n)], 1).astype(np.int32)
    t2 = np.stack([rng.randint(30, 60, n), rng.randint(0, R, n),
                   rng.randint(30, 60, n)], 1).astype(np.int32)
    ranges = ((0, 30), (30, 60))

    outs = {}
    for pallas in (False, True):
        cfg = Config(dim=8, batch_size=64, neg_triple_num=3,
                     row_sparse_updates=True, use_pallas_apply=pallas,
                     neg_rejection_tries=0)
        params = init_params(cfg, E, R, 2)
        opt = streams.init_stream_opt_states(cfg, params)
        fn, _, _ = streams.build_rel_view_epoch(cfg, n, n, ranges,
                                                with_neighbors=False)
        p, _, _, loss = fn(params, opt["rel_view"], jax.random.PRNGKey(0),
                           jnp.asarray(t1), jnp.asarray(t2))
        outs[pallas] = (np.asarray(p["rv_ent"]), float(loss))
    np.testing.assert_allclose(outs[True][0], outs[False][0],
                               rtol=2e-6, atol=1e-7)
    assert np.isclose(outs[True][1], outs[False][1], rtol=1e-6)
