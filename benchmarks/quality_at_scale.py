"""Quality pin at the largest feasible scale (VERDICT r2 item 5).

Trains the FULL ITC driver on a DWY-shaped synthetic pair — default 50K
entities/KG, 300K rel + 150K attr triples/KG, dim 75, truncated-neighbor
sampling active for most epochs — and records Hits@1/MRR per view plus
seconds/epoch. This is the closest available proxy for "reference Hits@1 on
DBP-WD" (BASELINE.json) while the DWY100K archive is absent from the
reference checkout (BASELINE.md): same per-KG entity/triple scale class, same
schedule shape (uniform epochs -> truncated epochs at truncated_freq,
predicate soft alignment, neighbor refreshes), same eval protocol
(eval/views.test, accurate mode).

Runs on the default backend (the TPU chip when JAX_PLATFORMS=axon); pass
--cpu to force the host. Prints per-view JSON lines and writes
QUALITY_AT_SCALE.json at the repo root.

Usage: python benchmarks/quality_at_scale.py [--entities 50000]
           [--epochs 50] [--check-band]
--check-band asserts the committed regression band (docs/EXPERIMENTS.md) and
exits nonzero on violation.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Regression band (floors, not targets: a run under these is a quality
# regression). Set observed-minus-noise from the recorded 50K-entity/
# 50-epoch round-4 run on the complementary-noise generator
# (QUALITY_AT_SCALE.json: rv 0.977, final 0.8999, av 0.6168, TPU,
# 5.53 s/epoch). The frozen nv view is excluded — it measures the
# generator's name_noise, not training.
BAND = {"rv": 0.95, "final": 0.86, "av": 0.55}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=50_000)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--mode", choices=["ITC", "SSL"], default="ITC")
    ap.add_argument("--dim", type=int, default=75)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch-size", type=int, default=5000,
                    help="positives per step (5000 = reference parity; the "
                         "TPU-native bench default 20000/40000 is quality-"
                         "A/B'd with this flag, docs/EXPERIMENTS.md r4)")
    ap.add_argument("--check-band", action="store_true")
    ap.add_argument("--rel-noise", type=float, default=None,
                    help="generator rel_noise override (the combination-"
                         "property demo raises it so the relation view is "
                         "comparably imperfect to nv/av)")
    ap.add_argument("--name-noise", type=float, default=None,
                    help="generator name_noise override")
    ap.add_argument("--rel-triples-mult", type=int, default=6,
                    help="relation triples per entity (6 = DWY100K-shaped; "
                         "2 gives a sparse graph whose relation view lands "
                         "in the paper's ~0.6-0.8 band)")
    ap.add_argument("--neg-chunk-size", type=int, default=None,
                    help="override Config.neg_chunk_size (uniform-phase "
                         "chunk lever A/B)")
    ap.add_argument("--neg-pool-size", type=int, default=None)
    ap.add_argument("--truncated-chunk-size", type=int, default=None,
                    help="override Config.truncated_chunk_size (equal-epoch "
                         "quality A/B for the truncated-phase scatter-row "
                         "lever, docs/EXPERIMENTS.md r5)")
    ap.add_argument("--truncated-pool-size", type=int, default=None)
    ap.add_argument("--attr-triples-mult", type=int, default=3,
                    help="attribute triples per entity (3 = DWY100K-shaped; "
                         "6 strengthens the attribute view for "
                         "comparable-views combination runs)")
    ap.add_argument("--n-attributes", type=int, default=None,
                    help="number of attribute predicates (default n/500)")
    ap.add_argument("--folder-tag", default="",
                    help="suffix for the dataset folder (overrides reuse)")
    ap.add_argument("--out", default=None,
                    help="default: QUALITY_AT_SCALE.json (ITC) / "
                         "QUALITY_AT_SCALE_SSL.json at the repo root")
    ns = ap.parse_args()
    if ns.out is None:
        name = "QUALITY_AT_SCALE.json" if ns.mode == "ITC" \
            else "QUALITY_AT_SCALE_SSL.json"
        ns.out = os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), name)

    if ns.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from multike_tpu.align.predicates import PredicateAlignModel
    from multike_tpu.config import Config
    from multike_tpu.data import synthetic
    from multike_tpu.data.dataset import DataModel
    from multike_tpu.eval import views as vw

    if ns.mode == "SSL":
        from multike_tpu.train.ssl import MultiKE_SSL as Model
    else:
        from multike_tpu.train.itc import MultiKE_ITC as Model

    n = ns.entities
    knobs = {}
    if ns.rel_noise is not None:
        knobs["rel_noise"] = ns.rel_noise
    if ns.name_noise is not None:
        knobs["name_noise"] = ns.name_noise
    folder = synthetic.generate(
        f"/tmp/qscale_{n}{ns.folder_tag}/", seed=11, n_entities=n,
        n_relations=max(8, n // 100),
        n_attributes=ns.n_attributes or max(6, n // 500),
        n_rel_triples=ns.rel_triples_mult * n,
        n_attr_triples=ns.attr_triples_mult * n,
        **knobs)
    log(f"dataset generated at {folder} ({n} entities/KG, "
        f"{ns.rel_triples_mult*n} rel + {ns.attr_triples_mult*n} attr triples/KG), "
        f"backend={jax.default_backend()}")

    cfg_extra = {}
    if ns.neg_chunk_size is not None:
        cfg_extra["neg_chunk_size"] = ns.neg_chunk_size
    if ns.neg_pool_size is not None:
        cfg_extra["neg_pool_size"] = ns.neg_pool_size
    if ns.truncated_chunk_size is not None:
        cfg_extra["truncated_chunk_size"] = ns.truncated_chunk_size
    if ns.truncated_pool_size is not None:
        cfg_extra["truncated_pool_size"] = ns.truncated_pool_size
    cfg = Config(
        training_data=folder, dim=ns.dim, batch_size=ns.batch_size,
        entity_batch_size=5000, attribute_batch_size=5000, **cfg_extra,
        encoder_epoch=5, neg_triple_num=10, max_epoch=ns.epochs,
        shared_learning_max_epoch=max(10, ns.epochs // 2),
        learning_rate=0.01, truncated_freq=max(5, ns.epochs // 5),
        start_predicate_soft_alignment=max(5, ns.epochs // 5),
        start_valid=999, eval_freq=999, is_save=False,
        word2vec_path=folder + "mini_word2vec.vec")
    t0 = time.time()
    data = DataModel(cfg)
    pam = PredicateAlignModel(data.kgs, cfg)
    prep_s = time.time() - t0
    log(f"data+predicates prepared in {prep_s:.1f}s")

    model = Model(cfg, data, pam, verbose=True)
    t0 = time.time()
    model.run()
    train_s = time.time() - t0
    log(f"trained {ns.epochs} epochs in {train_s:.1f}s "
        f"({train_s / ns.epochs:.2f} s/epoch)")

    out = {
        "metric": f"{ns.mode.lower()}_quality_at_scale",
        "entities_per_kg": n, "epochs": ns.epochs, "dim": ns.dim,
        "backend": jax.default_backend(),
        "prep_seconds": round(prep_s, 1),
        "train_seconds": round(train_s, 1),
        "seconds_per_epoch": round(train_s / ns.epochs, 2),
        "batch_size": ns.batch_size,
        "truncated_freq": cfg.truncated_freq,
        "generator": {"rel_triples_mult": ns.rel_triples_mult,
                      "attr_triples_mult": ns.attr_triples_mult,
                      "n_attributes": ns.n_attributes or max(6, n // 500),
                      **knobs},
        "views": {},
    }
    views = ("rv", "final", "av", "nv") if ns.mode == "ITC" else \
        ("rv", "final", "av", "nv", "avg", "wva")
    for choice in views:
        t0 = time.time()
        mrr = float(vw.test_WVA(model)) if choice == "wva" \
            else float(vw.test(model, embed_choice=choice))
        out["views"][choice] = {
            "test_mrr": round(mrr, 4),
            "eval_seconds": round(time.time() - t0, 2),
        }
        log(f"view {choice}: test MRR {mrr:.4f}")
    print(json.dumps(out), flush=True)
    with open(ns.out, "w") as f:
        json.dump(out, f, indent=1)

    if ns.check_band:
        if ns.mode != "ITC":
            log("--check-band is calibrated for ITC (skipped)")
            return
        bad = {v: (out["views"][v]["test_mrr"], floor)
               for v, floor in BAND.items()
               if out["views"][v]["test_mrr"] < floor}
        if bad:
            log(f"QUALITY BAND VIOLATION: {bad}")
            sys.exit(1)
        log("quality band ok")


if __name__ == "__main__":
    main()
