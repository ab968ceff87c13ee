"""Batch-size x apply-path sweep for the rel-view epoch on the real chip.

VERDICT r3 item 2c: batch 5000 is reference parity (args.json:21), not
physics. The optimizer apply is the measured wall at 100K entities/KG
(docs/EXPERIMENTS.md r3): the dense Adagrad pass is ~flat per step in batch
size and the row-sparse pass scales with the scattered-row count — so a
bigger batch amortizes the dense apply over more triples 1:1, while for the
row-sparse path it only helps via fixed-dispatch amortization. This sweep
measures the crossover on hardware; the quality cost of the bigger batch at
equal epochs is A/B'd separately (benchmarks/view_signal_quality.py
--batch-size, docs/EXPERIMENTS.md r4).

Usage: python benchmarks/batch_size_bench.py [--entities 100000]
           [--batches 5000,10000,20000,40000] [--truncated]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=100_000)
    ap.add_argument("--batches", default="5000,10000,20000,40000")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--truncated", action="store_true")
    ap.add_argument("--paths", default="auto,on,off",
                    help="row_sparse_updates settings to sweep")
    ns = ap.parse_args()

    from multike_tpu.config import Config

    bench.ensure_usable_backend()
    bench.enable_compile_cache()
    import jax

    bench.log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    n_ent = ns.entities
    n_tri, n_rel = 6 * n_ent, 500
    rng = np.random.RandomState(7)
    triples1 = bench.synthetic_triples(rng, n_tri, 0, n_ent, n_rel, 0)
    triples2 = bench.synthetic_triples(rng, n_tri, n_ent, 2 * n_ent, n_rel,
                                       n_rel)
    ranges = ((0, n_ent), (n_ent, 2 * n_ent))

    rows = []
    for bs in [int(b) for b in ns.batches.split(",")]:
        for path in ns.paths.split(","):
            cfg = Config(dim=75, batch_size=bs, neg_triple_num=10,
                         row_sparse_updates=path)
            tps, fps, _ = bench.bench_jax(cfg, triples1, triples2, ranges,
                                       ns.epochs, truncated=ns.truncated)
            row = {"batch_size": bs, "row_sparse_updates": path,
                   "truncated": ns.truncated,
                   "triples_per_s": round(tps, 1),
                   "xla_tflops_per_s": round(fps / 1e12, 3)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    print(json.dumps({"metric": "batch_size_sweep", "entities_per_kg": n_ent,
                      "rows": rows}), flush=True)


if __name__ == "__main__":
    main()
