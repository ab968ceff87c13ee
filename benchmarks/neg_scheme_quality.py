"""Quality parity check for the negative-batching schemes (chunk_shared vs
per_slot) on the 5K-entity synthetic pair: trains the full ITC driver twice
and prints rv/final view metrics for each scheme.

Run on CPU (the conftest-style virtual platform):
    python benchmarks/neg_scheme_quality.py [epochs]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def run(scheme: str, folder: str, epochs: int, pool: int = 0,
        reject_mode: str = "drop", truncated_scheme: str = "per_slot",
        truncated_chunk: int = 256, truncated_pool: int = 0):
    from multike_tpu.align.predicates import PredicateAlignModel
    from multike_tpu.config import Config
    from multike_tpu.data.dataset import DataModel
    from multike_tpu.eval import views as vw
    from multike_tpu.train.itc import MultiKE_ITC

    cfg = Config(training_data=folder, dim=32, batch_size=2048,
                 entity_batch_size=1024, attribute_batch_size=2048,
                 encoder_epoch=3, neg_triple_num=10, max_epoch=epochs,
                 learning_rate=0.01, neg_scheme=scheme, neg_pool_size=pool,
                 start_valid=999, eval_freq=999, truncated_freq=8,
                 neg_reject_mode=reject_mode,
                 truncated_neg_scheme=truncated_scheme,
                 truncated_chunk_size=truncated_chunk,
                 truncated_pool_size=truncated_pool,
                 start_predicate_soft_alignment=5, is_save=False,
                 word2vec_path=folder + "mini_word2vec.vec")
    data = DataModel(cfg)
    pam = PredicateAlignModel(data.kgs, cfg)
    model = MultiKE_ITC(cfg, data, pam, verbose=False)
    t0 = time.time()
    model.run()
    dt = time.time() - t0
    out = {"scheme": scheme, "epochs": epochs, "seconds": round(dt, 1)}
    for choice in ("rv", "final"):
        out[f"{choice}_test_mrr"] = round(float(
            vw.test(model, embed_choice=choice)), 4)
    return out


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from multike_tpu.data import synthetic

    folder = synthetic.generate("/tmp/negq_ds/", seed=5, n_entities=5000,
                                n_rel_triples=30000, n_attr_triples=15000)
    # (scheme, pool, reject_mode). The per_slot drop-vs-resample pair is the
    # A/B behind Config.neg_reject_mode's default: truncated-neighbor sampling
    # activates at epoch 8 (truncated_freq=8), so most epochs exercise the
    # rejection path under neighbor-restricted candidate pools — the regime
    # where 'drop' thins negatives non-uniformly toward high-degree entities.
    # (scheme, pool, reject, truncated_scheme, truncated_chunk). Final pair
    # of entries: the truncated-phase chunk_shared A/B (neighbor-restricted
    # shared pools vs per-entity per_slot draws; Config.truncated_neg_scheme).
    configs = (("chunk_shared", 0, "drop", "per_slot", 256, 0),
               ("chunk_shared", 256, "drop", "per_slot", 256, 0),
               ("per_slot", 0, "drop", "per_slot", 256, 0),
               ("per_slot", 0, "resample", "per_slot", 256, 0),
               ("chunk_shared", 256, "drop", "chunk_shared", 256, 0),
               ("chunk_shared", 256, "drop", "chunk_shared", 1024, 0),
               ("chunk_shared", 256, "drop", "chunk_shared", 256, 128),
               ("chunk_shared", 256, "drop", "chunk_shared", 512, 0))
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    for scheme, pool, reject, tsch, tchunk, tpool in configs:
        tag = f"{scheme}:{pool}:{reject}:{tsch}:{tchunk}:{tpool}"
        if only and tag not in only:
            continue
        out = run(scheme, folder, epochs, pool=pool, reject_mode=reject,
                  truncated_scheme=tsch, truncated_chunk=tchunk,
                  truncated_pool=tpool)
        out["neg_pool_size"] = pool
        out["neg_reject_mode"] = reject
        out["truncated_neg_scheme"] = tsch
        out["truncated_chunk_size"] = tchunk
        out["truncated_pool_size"] = tpool
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
