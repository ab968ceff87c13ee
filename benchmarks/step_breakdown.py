"""Step-time breakdown of the relation-view training step.

VERDICT r1 asked for evidence of where the step time goes — specifically
whether the optimizer scatter is (still) the bound after the chunk-shared
scheme. This ablates one rel-view step into cumulative phases, each a jitted
scan over S identical steps (dispatch amortized, phase delta = phase cost):

  sample    on-device negative sampling only (RNG; chunk pools or per-slot
            draws incl. the early-exit Bloom while_loop)
  gather    + the one fused rv_ent row gather (positives + candidates)
  forward   + normalize, rel lookup, logistic loss (no grad)
  backward  + value_and_grad w.r.t. gathered rows and dense vars (no apply)
  full      + row-sparse Adagrad apply (segment-dedup gather/scatter) and
            dense apply — the shipped step

Workload matches bench.py: DWY100K-shaped (100K entities), batch 5000 split
evenly across the two KGs, dim 75, K=10, chunk_shared C=256 (uniform phase)
or per_slot with a dense NeighborState (truncated phase).

Usage: python benchmarks/step_breakdown.py [--steps 50] [--truncated] [--cpu]
Prints per-phase ms/step (stderr) and one JSON line (stdout).
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
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=5000)
    ap.add_argument("--n-ent", type=int, default=50_000, help="entities per KG")
    ap.add_argument("--truncated", action="store_true",
                    help="per_slot + neighbor tables (post-refresh phase)")
    ap.add_argument("--truncated-chunks", action="store_true",
                    help="truncated phase with neighbor-restricted shared "
                         "pools (truncated_neg_scheme='chunk_shared')")
    ap.add_argument("--presampled", action="store_true",
                    help="hoist sampling out of the scan (the shipped "
                         "presampled path): the 'sample' phase then measures "
                         "the bulk draw amortized per step")
    ap.add_argument("--dense-apply", action="store_true",
                    help="measure the dense-optax-style apply in the 'full' "
                         "phase instead of the row-sparse one")
    ap.add_argument("--cpu", action="store_true")
    ns = ap.parse_args()

    if ns.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from multike_tpu.config import Config
    from multike_tpu.losses import (chunk_shared_relation_logistic_loss,
                                    lean_relation_logistic_loss)
    from multike_tpu.params import l2_normalize, lookup_norm_fast
    from multike_tpu.sampling import (build_neighbor_state,
                                      build_triple_filter,
                                      sample_corruptions,
                                      sample_shared_corruptions)
    from multike_tpu.train import sparse_adagrad
    from multike_tpu.train.streams import _chunk_layout, proportional_sizes

    cfg = Config(dim=75, batch_size=ns.batch, neg_triple_num=10)
    n_ent = ns.n_ent
    E = 2 * n_ent
    n_tri = 6 * n_ent
    rng = np.random.RandomState(7)
    tri = np.stack([rng.randint(0, E, 2 * n_tri),
                    rng.randint(0, 500, 2 * n_tri),
                    rng.randint(0, E, 2 * n_tri)], axis=1).astype(np.int32)
    (lo1, hi1), (lo2, hi2) = (0, n_ent), (n_ent, E)
    bs1, bs2 = proportional_sizes(n_tri, n_tri, cfg.batch_size)
    K, C = cfg.neg_triple_num, cfg.neg_pool_size
    dim = cfg.dim
    neg_w = K / (2.0 * C)
    trunc_chunks = ns.truncated_chunks
    if trunc_chunks:
        ns.truncated = True
    use_chunks = not ns.truncated or trunc_chunks
    chunk_size = cfg.truncated_chunk_size if trunc_chunks else cfg.neg_chunk_size
    nc1, s1 = _chunk_layout(bs1, chunk_size)
    nc2, s2 = _chunk_layout(bs2, chunk_size)
    bsp1, bsp2 = (nc1 * s1, nc2 * s2) if use_chunks else (bs1, bs2)

    tfilter = build_triple_filter(tri)
    nbr = None
    if ns.truncated:
        # 30% 'useful' entities with top-2% neighbor rows, like bench.py
        parts = []
        for lo, hi in ((lo1, hi1), (lo2, hi2)):
            n_useful = (hi - lo) * 3 // 10
            k = max(1, (hi - lo) // 50)
            useful = lo + rng.permutation(hi - lo)[:n_useful]
            nb = lo + rng.randint(0, hi - lo, size=(n_useful, k))
            parts.append((useful.astype(np.int64), nb.astype(np.int32)))
        nbr = build_neighbor_state(E, parts)

    params = {
        "rv_ent": jnp.asarray(rng.randn(E, dim) * 0.1, jnp.float32),
        "rel": jnp.asarray(rng.randn(500, dim) * 0.1, jnp.float32),
    }
    acc = {k: sparse_adagrad.init_acc(v) for k, v in params.items()}
    t1 = jnp.asarray(tri[:n_tri])
    t2 = jnp.asarray(tri[n_tri:])
    m1 = jnp.ones((bsp1,), jnp.float32).at[bs1:].set(0.0)
    m2 = jnp.ones((bsp2,), jnp.float32).at[bs2:].set(0.0)

    def sample_phase(key, nbr):
        """Returns (row ids for the fused gather, aux, pos triples)."""
        key, ki1, ki2, k1, k2 = jax.random.split(key, 5)
        i1 = jax.random.randint(ki1, (bsp1,), 0, n_tri)
        i2 = jax.random.randint(ki2, (bsp2,), 0, n_tri)
        t1b, t2b = t1[i1], t2[i2]
        if use_chunks:
            if trunc_chunks:
                from multike_tpu.sampling import \
                    sample_shared_neighbor_corruptions

                ch1, ct1 = sample_shared_neighbor_corruptions(
                    k1, t1b, nc1, s1, C, lo1, hi1, nbr)
                ch2, ct2 = sample_shared_neighbor_corruptions(
                    k2, t2b, nc2, s2, C, lo2, hi2, nbr)
            else:
                ch1, ct1 = sample_shared_corruptions(k1, nc1, C, lo1, hi1)
                ch2, ct2 = sample_shared_corruptions(k2, nc2, C, lo2, hi2)
            parts = [t1b[:, 0], t1b[:, 2], ch1.ravel(), ct1.ravel(),
                     t2b[:, 0], t2b[:, 2], ch2.ravel(), ct2.ravel()]
            aux = None
        else:
            c1, hb1, keep1 = sample_corruptions(
                k1, t1b, lo1, hi1, K, nbr, tfilter=tfilter,
                retries=cfg.neg_rejection_tries,
                reject_mode=cfg.neg_reject_mode)
            c2, hb2, keep2 = sample_corruptions(
                k2, t2b, lo2, hi2, K, nbr, tfilter=tfilter,
                retries=cfg.neg_rejection_tries,
                reject_mode=cfg.neg_reject_mode)
            parts = [t1b[:, 0], t1b[:, 2], c1.ravel(),
                     t2b[:, 0], t2b[:, 2], c2.ravel()]
            aux = (hb1, keep1, hb2, keep2)
        return jnp.concatenate(parts), aux, t1b, t2b

    if use_chunks:
        sizes = [bsp1, bsp1, nc1 * C, nc1 * C, bsp2, bsp2, nc2 * C, nc2 * C]
    else:
        sizes = [bsp1, bsp1, bsp1 * K, bsp2, bsp2, bsp2 * K]

    def split(rows):
        out, off = [], 0
        for sz in sizes:
            out.append(rows[off:off + sz])
            off += sz
        return out

    def loss_of(rows, rel_tab, aux, t1b, t2b):
        rv = l2_normalize(rows, axis=-1)
        prs = lookup_norm_fast(rel_tab,
                               jnp.concatenate([t1b[:, 1], t2b[:, 1]]))
        prs1, prs2 = prs[:bsp1], prs[bsp1:]
        if use_chunks:
            ph1, pt1, ch1, ct1, ph2, pt2, ch2, ct2 = split(rv)
            loss = chunk_shared_relation_logistic_loss(
                ph1.reshape(nc1, s1, dim), prs1.reshape(nc1, s1, dim),
                pt1.reshape(nc1, s1, dim), ch1.reshape(nc1, C, dim),
                ct1.reshape(nc1, C, dim), neg_weight=neg_w,
                pos_mask=m1.reshape(nc1, s1))
            loss += chunk_shared_relation_logistic_loss(
                ph2.reshape(nc2, s2, dim), prs2.reshape(nc2, s2, dim),
                pt2.reshape(nc2, s2, dim), ch2.reshape(nc2, C, dim),
                ct2.reshape(nc2, C, dim), neg_weight=neg_w,
                pos_mask=m2.reshape(nc2, s2))
        else:
            hb1, keep1, hb2, keep2 = aux
            ph1, pt1, c1, ph2, pt2, c2 = split(rv)
            loss = lean_relation_logistic_loss(
                ph1, prs1, pt1, c1.reshape(bsp1, K, dim), hb1, m1,
                neg_keep=keep1)
            loss += lean_relation_logistic_loss(
                ph2, prs2, pt2, c2.reshape(bsp2, K, dim), hb2, m2,
                neg_keep=keep2)
        return loss

    def step(phase, params, acc, key, nbr_arg, pre=None):
        if pre is None:
            ids, aux, t1b, t2b = sample_phase(key, nbr_arg)
        else:
            ids, aux, t1b, t2b = pre
        if phase == "sample":
            return params, acc, jnp.sum(ids.astype(jnp.float32))
        rows = params["rv_ent"][ids]
        if phase == "gather":
            return params, acc, jnp.sum(rows)
        if phase == "forward":
            return params, acc, loss_of(rows, params["rel"], aux, t1b, t2b)

        def f(rows_, rel_):
            return loss_of(rows_, rel_, aux, t1b, t2b)

        loss, (g_rows, g_rel) = jax.value_and_grad(f, argnums=(0, 1))(
            rows, params["rel"])
        if phase == "backward":
            return params, acc, loss + jnp.sum(g_rows[0]) + jnp.sum(g_rel[0])
        params = dict(params)
        acc = dict(acc)
        if ns.dense_apply:
            # dense-optax-style update: scatter the row grads into a full
            # (E, d) gradient table, then Adagrad over the whole table —
            # what the trainer's 'auto' mode does below row_sparse_min_rows
            g_tab = jnp.zeros_like(params["rv_ent"]).at[ids].add(g_rows)
            params["rv_ent"], acc["rv_ent"] = sparse_adagrad.dense_apply(
                params["rv_ent"], acc["rv_ent"], g_tab, cfg.learning_rate)
        else:
            params["rv_ent"], acc["rv_ent"] = sparse_adagrad.row_apply(
                params["rv_ent"], acc["rv_ent"], ids, g_rows,
                cfg.learning_rate)
        params["rel"], acc["rel"] = sparse_adagrad.dense_apply(
            params["rel"], acc["rel"], g_rel, cfg.learning_rate)
        return params, acc, loss

    S = ns.steps
    results = {}
    prev = 0.0
    for phase in ["sample", "gather", "forward", "backward", "full"]:
        if ns.presampled:
            # bulk-draw all S steps' samples in one op (vmapped sample_phase
            # == the shipped presampled path's op shapes), then scan the
            # remaining phases over the presampled slices
            @jax.jit
            def run(params, acc, key, nbr_arg, _phase=phase):
                ks = jax.random.split(key, S)
                pre = jax.vmap(lambda k: sample_phase(k, nbr_arg))(ks)
                if _phase == "sample":
                    return jnp.sum(pre[0].astype(jnp.float32))

                def body(carry, xs):
                    p, a = carry
                    p, a, out = step(_phase, p, a, None, None, pre=xs)
                    return (p, a), out

                (p, a), outs = jax.lax.scan(body, (params, acc), pre)
                return jnp.sum(outs)
        else:
            @jax.jit
            def run(params, acc, key, nbr_arg, _phase=phase):
                ks = jax.random.split(key, S)

                def body(carry, sk):
                    p, a = carry
                    p, a, out = step(_phase, p, a, sk, nbr_arg)
                    return (p, a), out

                (p, a), outs = jax.lax.scan(body, (params, acc), ks)
                return jnp.sum(outs)

        key = jax.random.PRNGKey(0)
        float(run(params, acc, key, nbr))        # compile + warm
        t0 = time.perf_counter()
        float(run(params, acc, key, nbr))
        dt = time.perf_counter() - t0
        ms = dt / S * 1e3
        results[phase] = round(ms, 4)
        log(f"{phase:>9}: {ms:8.3f} ms/step  (+{ms - prev:7.3f})")
        prev = ms

    mode = ("truncated_chunk_shared" if trunc_chunks else
            "truncated_per_slot" if ns.truncated else "uniform_chunk_shared")
    print(json.dumps({"metric": f"rel_view_step_breakdown_{mode}",
                      "unit": "ms/step", "phases_cumulative": results,
                      "batch_size": cfg.batch_size, "entities": E,
                      "presampled": ns.presampled,
                      "apply": "dense" if ns.dense_apply else "row_sparse"}))


if __name__ == "__main__":
    main()
