"""Micro-benchmark of row-sparse Adagrad apply variants (the truncated-phase
bottleneck: +3.3-3.9 ms of a ~6 ms step at 200K rows, docs/EXPERIMENTS.md).

Variants, all computing the IDENTICAL update (dense-optax Adagrad semantics,
duplicates summed before squaring):

  sorted        argsort + segment-sum dedup, then scatters flagged
                indices_are_sorted + unique_indices (XLA:TPU can vectorize)
  scatter       sort-free: scatter-add dedup into a zeroed (E, d) scratch,
                gather back per occurrence, idempotent 'set' scatters
  dense         scatter-add grads into a dense table, full-table Adagrad
                (what optax does below row_sparse_min_rows)

Usage: python benchmarks/apply_bench.py [--rows 200000] [--ids 60000]
Prints ms/step per variant (stderr) + one JSON line (stdout).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--ids", type=int, default=60_000)
    ap.add_argument("--dim", type=int, default=75)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    ns = ap.parse_args()

    if ns.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    E, N, d, lr, eps = ns.rows, ns.ids, ns.dim, 0.01, 1e-7

    def sorted_apply(param, acc, ids, g_rows):
        order = jnp.argsort(ids)
        sid = jnp.take(ids, order)
        sg = jnp.take(g_rows, order, axis=0)
        is_start = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
        seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        gsum = jnp.zeros_like(g_rows).at[seg].add(
            sg, indices_are_sorted=True)
        rep = jnp.full(ids.shape, E, ids.dtype).at[seg].set(
            sid, indices_are_sorted=True)
        safe = jnp.clip(rep, 0, E - 1)
        new_acc = acc.at[safe].get(indices_are_sorted=True,
                                   unique_indices=False) + jnp.square(gsum)
        upd = jnp.where(new_acc > 0, jax.lax.rsqrt(new_acc + eps), 0.) * gsum
        acc = acc.at[rep].set(new_acc, mode="drop", indices_are_sorted=True,
                              unique_indices=True)
        param = param.at[rep].add(-lr * upd, mode="drop",
                                  indices_are_sorted=True, unique_indices=True)
        return param, acc

    def make_presorted(ids):
        """The ids-only part of sorted_apply — computable OUTSIDE the scan
        when candidates are presampled for the whole epoch."""
        import jax.numpy as jnp

        order = jnp.argsort(ids)
        sid = jnp.take(ids, order)
        is_start = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
        seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        rep = (E + jnp.arange(ids.shape[0], dtype=ids.dtype)).at[seg].set(
            sid, indices_are_sorted=True)
        return order, seg, rep

    def presorted_apply(param, acc, ids, g_rows, presorted):
        order, seg, rep = presorted
        sg = jnp.take(g_rows, order, axis=0)
        gsum = jnp.zeros_like(g_rows).at[seg].add(sg, indices_are_sorted=True)
        safe = jnp.clip(rep, 0, E - 1)
        new_acc = acc.at[safe].get(indices_are_sorted=True) + jnp.square(gsum)
        upd = jnp.where(new_acc > 0, jax.lax.rsqrt(new_acc + eps), 0.) * gsum
        acc = acc.at[rep].set(new_acc, mode="drop", indices_are_sorted=True,
                              unique_indices=True)
        param = param.at[rep].add(-lr * upd, mode="drop",
                                  indices_are_sorted=True, unique_indices=True)
        return param, acc

    def sorted2_apply(param, acc, ids, g_rows):
        """2-scatter variant: per-occurrence segment totals via cumsum +
        boundary gathers (no dedup scatters); every occurrence writes its
        row with 'set' (duplicates identical -> deterministic)."""
        N = ids.shape[0]
        order = jnp.argsort(ids)
        sid = jnp.take(ids, order)
        sg = jnp.take(g_rows, order, axis=0)
        pos = jnp.arange(N, dtype=jnp.int32)
        is_start = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
        is_end = jnp.concatenate([sid[1:] != sid[:-1], jnp.ones((1,), bool)])
        start_pos = jax.lax.cummax(jnp.where(is_start, pos, -1))
        end_pos = jnp.flip(jax.lax.cummin(
            jnp.flip(jnp.where(is_end, pos, N - 1))))
        cum = jnp.cumsum(sg, axis=0)
        below = jnp.where((start_pos - 1)[:, None] >= 0,
                          cum[jnp.maximum(start_pos - 1, 0)], 0.0)
        tot = cum[end_pos] - below                     # per-occurrence gsum
        new_acc = acc.at[sid].get(indices_are_sorted=True) + jnp.square(tot)
        upd = jnp.where(new_acc > 0, jax.lax.rsqrt(new_acc + eps), 0.) * tot
        new_param = acc_p = param.at[sid].get(indices_are_sorted=True) \
            - lr * upd
        del acc_p
        acc = acc.at[sid].set(new_acc, indices_are_sorted=True)
        param = param.at[sid].set(new_param, indices_are_sorted=True)
        return param, acc

    def scatter_apply(param, acc, ids, g_rows):
        from multike_tpu.train.sparse_adagrad import row_apply

        return row_apply(param, acc, ids, g_rows, lr)

    def dense_apply(param, acc, ids, g_rows):
        g = jnp.zeros_like(param).at[ids].add(g_rows)
        new_acc = acc + jnp.square(g)
        param = param - lr * jnp.where(
            new_acc > 0, jax.lax.rsqrt(new_acc + eps), 0.) * g
        return param, new_acc

    variants = {"sorted": sorted_apply, "sorted2": sorted2_apply,
                "presorted": None,  # filled below (extra presort arg)
                "scatter": scatter_apply, "dense": dense_apply}
    rng = np.random.RandomState(0)
    param0 = jnp.asarray(rng.randn(E, d) * 0.1, jnp.float32)
    acc0 = jnp.full((E, d), 0.1, jnp.float32)
    ids0 = jnp.asarray(rng.randint(0, E, N), jnp.int32)
    g0 = jnp.asarray(rng.randn(N, d) * 0.01, jnp.float32)

    variants["presorted"] = lambda p, a, i, g: presorted_apply(
        p, a, i, g, make_presorted(i))

    # correctness cross-check first (tiny)
    small_ids = jnp.asarray([3, 1, 3, 7, 1], jnp.int32)
    small_g = jnp.asarray(rng.randn(5, 8) * 0.1, jnp.float32)
    sp = jnp.asarray(rng.randn(10, 8), jnp.float32)
    sa = jnp.full((10, 8), 0.1, jnp.float32)
    outs = {k: f(sp, sa, small_ids, small_g) for k, f in variants.items()}
    for k, (p, a) in outs.items():
        np.testing.assert_allclose(np.asarray(p), np.asarray(outs["dense"][0]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)
    log("correctness cross-check ok")

    S = ns.steps
    results = {}
    for name, f in variants.items():
        if name == "presorted":
            # sort data precomputed OUTSIDE the timed scan (the epoch
            # builder can do this at presample time for every step at once)
            pres = jax.jit(make_presorted)(ids0)

            @jax.jit
            def run(param, acc, ids, g, _p=pres):
                def body(carry, _):
                    p, a = carry
                    return presorted_apply(p, a, ids, g, _p), None

                (p, a), _ = jax.lax.scan(body, (param, acc), None, length=S)
                return jnp.sum(p[:1]) + jnp.sum(a[:1])
        else:
            @jax.jit
            def run(param, acc, ids, g, _f=f):
                def body(carry, _):
                    p, a = carry
                    return _f(p, a, ids, g), None

                (p, a), _ = jax.lax.scan(body, (param, acc), None, length=S)
                return jnp.sum(p[:1]) + jnp.sum(a[:1])

        float(run(param0, acc0, ids0, g0))
        t0 = time.perf_counter()
        float(run(param0, acc0, ids0, g0))
        ms = (time.perf_counter() - t0) / S * 1e3
        results[name] = round(ms, 4)
        log(f"{name:>8}: {ms:7.3f} ms/step")

    print(json.dumps({"metric": "row_sparse_apply_variants", "unit": "ms/step",
                      "rows": E, "ids": N, "dim": d, "variants": results}))


if __name__ == "__main__":
    main()
