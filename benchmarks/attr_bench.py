"""Attribute-view (CNN) training throughput at DWY100K shape.

The relation view's throughput is the headline (bench.py); the attribute
view is the other compute-heavy stream — per step it runs the TF1-parity
conv scorer (views/attr_conv.py: 2x conv + dense head on 2x75 maps) over
the batch plus the av_ent Adagrad apply. The reference trains it with
weighted positives only (MultiKE_model.py:324-331). This bench times the
REAL build_attr_view_epoch at 100K entities / 300K weighted attr triples
per KG (DWY100K is ~380K per side).

Usage: python benchmarks/attr_bench.py [--entities 100000]
           [--batch 40000] [--epochs 3]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=40_000)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--values", type=int, default=50_000,
                    help="distinct literal values (rows of literal_embeds)")
    ns = ap.parse_args()

    bench.ensure_usable_backend()
    bench.enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from multike_tpu.config import Config
    from multike_tpu.params import init_params
    from multike_tpu.train import streams

    bench.log(f"backend: {jax.default_backend()}")
    n_ent = ns.entities
    n_attr = max(6, n_ent // 500)
    n_tri = 3 * n_ent
    cfg = Config(dim=75, batch_size=ns.batch,
                 attribute_batch_size=ns.batch, neg_triple_num=10)
    rng = np.random.RandomState(5)

    def synth(lo, hi):
        return np.stack([rng.randint(lo, hi, n_tri),
                         rng.randint(0, n_attr, n_tri),
                         rng.randint(0, ns.values, n_tri)], 1).astype(np.int32)

    t1, t2 = synth(0, n_ent), synth(n_ent, 2 * n_ent)
    w1 = rng.rand(n_tri).astype(np.float32)
    w2 = rng.rand(n_tri).astype(np.float32)
    params = init_params(cfg, 2 * n_ent, 500, n_attr)
    opt = streams.init_stream_opt_states(cfg, params)["attr_view"]
    constants = {
        "literal_embeds": jnp.asarray(
            rng.randn(ns.values, cfg.dim).astype(np.float32)),
        "name_embeds": jnp.zeros((1, cfg.dim), jnp.float32),
    }
    epoch_fn, steps, trained = streams.build_attr_view_epoch(
        cfg, n_tri, n_tri)
    key = jax.random.PRNGKey(0)
    args = (constants, jnp.asarray(t1), jnp.asarray(w1),
            jnp.asarray(t2), jnp.asarray(w2))
    params, opt, key, loss = epoch_fn(params, opt, key, *args)
    bench.log(f"warmup done, steps/epoch={steps}, loss={float(loss):.3f}")

    t0 = time.perf_counter()
    for _ in range(ns.epochs):
        params, opt, key, loss = epoch_fn(params, opt, key, *args)
    float(loss)
    dt = time.perf_counter() - t0
    tps = trained * ns.epochs / dt
    out = {"metric": "attribute_view_conv_training_throughput",
           "value": round(tps, 1), "unit": "triples/s/chip",
           "entities_per_kg": n_ent, "attr_triples_per_kg": n_tri,
           "batch_size": ns.batch}
    bench.log(f"{ns.epochs} epochs in {dt:.3f}s -> {tps:,.0f} triples/s")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
