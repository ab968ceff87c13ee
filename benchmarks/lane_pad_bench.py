"""Lane-alignment A/B: does the d=75 embedding width pay 128-lane time?

VERDICT r4 item 4a. The v5e vector registers are (8, 128)-shaped; dim 75
fills 59% of the 128-lane minor axis. Two competing models of what that
costs the (memory-bound) rel-view step:

  compact-HBM model   arrays are stored compactly in HBM and padded only in
                      VMEM/registers -> step time scales ~linearly with d;
                      storing tables d=128-padded would move 128/75 = 1.71x
                      the bytes and SLOW the step down.
  lane-quantized model d=75 tiles are already moved/processed as full
                      128-lane tiles end to end -> time(75) == time(128);
                      padding is free but also gains nothing, and any
                      achieved-GB/s computed from 75-wide bytes understates
                      true traffic by 1.71x (part of the observed 3-7x
                      roofline gap is then phantom, not headroom).

Sweeping d in {64, 75, 128} at fixed batch separates the models: linear
scaling gives ratios 0.50 : 0.59 : 1.0 vs flat 1 : 1 : 1. The same sweep on
the apply micro-bench (benchmarks/apply_bench.py --dim) isolates the
optimizer wall specifically.

Usage: python benchmarks/lane_pad_bench.py [--dims 64,75,128]
           [--batches 40000] [--entities 100000] [--epochs 3]
Writes LANE_PAD_AB.json at the repo root.
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
    ap.add_argument("--dims", default="64,75,128")
    ap.add_argument("--batches", default="40000")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--out", default=None)
    ns = ap.parse_args()
    if ns.out is None:
        ns.out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "LANE_PAD_AB.json")

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
        for d in [int(x) for x in ns.dims.split(",")]:
            cfg = Config(dim=d, batch_size=bs, neg_triple_num=10)
            for truncated in (False, True):
                tps, _, _ = bench.bench_jax(cfg, triples1, triples2, ranges,
                                         ns.epochs, truncated=truncated)
                rows.append({"dim": d, "batch": bs,
                             "phase": "truncated" if truncated else "uniform",
                             "triples_per_s": round(tps, 1)})
                bench.log(f"dim={d} batch={bs} "
                          f"{'truncated' if truncated else 'uniform'}: "
                          f"{tps:,.0f} triples/s")

    # per (batch, phase): time ratio of each dim vs the d=128 run
    verdicts = {}
    for bs in {r["batch"] for r in rows}:
        for phase in ("uniform", "truncated"):
            sel = {r["dim"]: r["triples_per_s"] for r in rows
                   if r["batch"] == bs and r["phase"] == phase}
            if 128 in sel:
                verdicts[f"b{bs}_{phase}_time_vs_d128"] = {
                    str(d): round(sel[128] / sel[d], 3) for d in sel}
    out = {"metric": "lane_pad_ab", "entities_per_kg": n_ent,
           "epochs": ns.epochs, "backend": jax.default_backend(),
           "device": str(jax.devices()[0].device_kind),
           "rows": rows, "time_ratio_vs_d128": verdicts}
    print(json.dumps(out), flush=True)
    with open(ns.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
