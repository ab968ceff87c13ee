"""Scaling measurement of the REAL relation-view training epoch over a
('dp', 'tp') mesh (strong scaling: fixed global batch / dataset).

On real hardware this is the BASELINE 'triples/s at 1 chip / 1 host /
2 hosts, >=80% scaling' measurement; on the virtual CPU mesh it validates
the *method* (per-dp-size throughput of the identical program). The epoch
function measured is ``train/streams.build_rel_view_epoch`` with a live
``MeshContext`` — exactly what ``MultiKETrainer`` drives, not a demo step.

All runs force the row-sparse Adagrad path so dp sizes are compared
like-for-like (mesh mode requires it; see streams._make_stream_update).

Usage: python benchmarks/scaling_bench.py [--devices 8] [--batch 4096]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--entities", type=int, default=20000)
    ap.add_argument("--triples", type=int, default=60000)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--cpu", action="store_true", default=None)
    ns = ap.parse_args()

    import jax

    if ns.cpu or "axon" in os.environ.get("JAX_PLATFORMS", ""):
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={ns.devices}"
            ).strip()
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from multike_tpu.config import Config
    from multike_tpu.parallel.context import MeshContext
    from multike_tpu.params import init_params
    from multike_tpu.train import streams

    E, R = ns.entities, 512
    half = E // 2
    rng = np.random.RandomState(0)

    def synth(lo, hi):
        return np.stack([rng.randint(lo, hi, ns.triples),
                         rng.randint(0, R, ns.triples),
                         rng.randint(lo, hi, ns.triples)], 1).astype(np.int32)

    t1, t2 = synth(0, half), synth(half, E)
    ranges = ((0, half), (half, E))

    results = {}
    ndev = len(jax.devices())
    dp_sizes = [d for d in (1, 2, 4, 8) if d <= ndev]
    shapes = [(dp, 1) for dp in dp_sizes]
    if ndev >= 8:
        shapes.append((4, 2))  # tp=2 variant: row-sharded entity tables
    for dp, tp in shapes:
        cfg = Config(dim=75, neg_triple_num=10, batch_size=ns.batch,
                     mesh_dp=dp, mesh_tp=tp, row_sparse_updates=True)
        pctx = MeshContext.from_config(cfg)
        params = init_params(cfg, E, R, 2)
        if pctx is not None and pctx.tp > 1:
            from multike_tpu.parallel.context import ROW_SHARDED_TABLES

            for t in ROW_SHARDED_TABLES:
                params[t] = pctx.pad_table_rows(params[t])
        opt_states = streams.init_stream_opt_states(cfg, params, pctx=pctx)
        if pctx is not None:
            params = pctx.shard_params(params)
            opt_states = pctx.shard_stream_opt_states(opt_states)
        epoch_fn, steps, trained = streams.build_rel_view_epoch(
            cfg, ns.triples, ns.triples, ranges, with_neighbors=False,
            pctx=pctx)
        opt = opt_states["rel_view"]
        key = jax.random.PRNGKey(0)
        jt1, jt2 = jnp.asarray(t1), jnp.asarray(t2)
        params, opt, key, loss = epoch_fn(params, opt, key, jt1, jt2)  # compile
        float(loss)
        t0 = time.perf_counter()
        for _ in range(ns.epochs):
            params, opt, key, loss = epoch_fn(params, opt, key, jt1, jt2)
        float(loss)
        dt = time.perf_counter() - t0
        tps = trained * ns.epochs / dt
        results[(dp, tp)] = tps
        print(f"dp={dp} tp={tp}: {tps:,.0f} triples/s ({steps} steps/epoch)",
              file=sys.stderr, flush=True)

    base = results[(dp_sizes[0], 1)]
    effs = {k: v / (base * k[0] * k[1]) for k, v in results.items()}
    print(json.dumps({
        "metric": "rel_view_epoch_scaling",
        "throughput": {f"dp{d}_tp{t}": round(v, 1)
                       for (d, t), v in results.items()},
        "efficiency_vs_dp1": {f"dp{d}_tp{t}": round(e, 3)
                              for (d, t), e in effs.items()},
        "devices": ndev,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
