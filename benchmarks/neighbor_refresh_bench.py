"""Truncated-neighbor refresh benchmark at DWY100K scale.

The reference refreshes per-entity top-2% cosine neighbor lists every
truncated_freq epochs via an mp.Pool over the full similarity matrix
(base/batch.py:119-150, called MultiKE_Late.py:256-269). Here the refresh is
one `_topk_global_ids` dispatch per KG (scan of MXU matmul + approx_max_k
blocks) plus device scatters into the dense NeighborState — the (100K, 2000)
id block (800 MB/KG) never touches the host.

Usage: python benchmarks/neighbor_refresh_bench.py [--n-ent 100000] [--cpu]
Prints one JSON line.
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
    ap.add_argument("--n-ent", type=int, default=100_000,
                    help="entities per KG (DWY100K: 100K)")
    ap.add_argument("--dim", type=int, default=75)
    ap.add_argument("--useful-frac", type=float, default=1.0,
                    help="fraction of each KG in the 'useful' list (the "
                         "reference uses all linked entities)")
    ap.add_argument("--cpu", action="store_true")
    ns = ap.parse_args()

    if ns.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from multike_tpu.train.trainer import _refresh_neighbor_state

    E = 2 * ns.n_ent
    k = max(1, int(0.02 * ns.n_ent))            # top 2% (epsilon=0.98)
    rng = np.random.RandomState(0)
    rv = jnp.asarray(rng.randn(E, ns.dim).astype(np.float32))
    rv = rv / jnp.linalg.norm(rv, axis=1, keepdims=True)
    n_useful = int(ns.useful_frac * ns.n_ent)
    use_approx = jax.default_backend() == "tpu"
    u1 = jnp.asarray(rng.permutation(ns.n_ent)[:n_useful].astype(np.int32))
    u2 = jnp.asarray(
        (ns.n_ent + rng.permutation(ns.n_ent)[:n_useful]).astype(np.int32))

    def refresh():
        return _refresh_neighbor_state(rv, (u1, u2), E=E, kmax=max(k, 8),
                                       ks=(k, k), use_approx=use_approx)

    st = refresh()
    float(st.cnt.sum())                          # force
    log(f"warmup done (E={E}, useful={n_useful}/KG, k={k})")
    t0 = time.perf_counter()
    st = refresh()
    float(st.cnt.sum())
    dt = time.perf_counter() - t0
    log(f"refresh: {dt:.3f}s")
    print(json.dumps({
        "metric": "neighbor_refresh_seconds",
        "value": round(dt, 3),
        "unit": f"s @ {n_useful} useful/KG, k={k}, d={ns.dim}",
        "device_resident": True,
    }))


if __name__ == "__main__":
    main()
