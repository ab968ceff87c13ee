"""Per-view signal A/B over the synthetic generator's noise knobs.

Two purposes (VERDICT r3 item 3):

1. **Diagnose the r3 SSL av collapse** (QUALITY_AT_SCALE_SSL.json av MRR
   0.0017): the r3 generator drew attribute values independently per KG, so
   the attribute view had ZERO cross-KG signal by construction. Running the
   same training on ``attr_noise=1.0`` (every KG2 fact dropped or re-drawn —
   the r3 regime) vs the default shared-fact generator separates "generator
   artifact" from "av pipeline bug": if av learns under shared facts and
   collapses under independent ones, the pipeline is fine.

2. **Demonstrate the MultiKE combination property** (final/avg/WVA > best
   single view, reference MultiKE_Late.py:275-280): with each view noisy in
   a DIFFERENT subset of entities (rel_noise/attr_noise/name_noise), the
   combined embedding should beat every single view.

Run on CPU: python benchmarks/view_signal_quality.py [epochs] [--entities N]
            [--mode ITC|SSL] [--out FILE]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def run(folder: str, epochs: int, mode: str):
    from multike_tpu.align.predicates import PredicateAlignModel
    from multike_tpu.config import Config
    from multike_tpu.data.dataset import DataModel
    from multike_tpu.eval import views as vw

    if mode == "SSL":
        from multike_tpu.train.ssl import MultiKE_SSL as Model
    else:
        from multike_tpu.train.itc import MultiKE_ITC as Model

    cfg = Config(training_data=folder, dim=32, batch_size=2048,
                 entity_batch_size=1024, attribute_batch_size=2048,
                 encoder_epoch=3, neg_triple_num=10, max_epoch=epochs,
                 shared_learning_max_epoch=max(10, epochs // 2),
                 learning_rate=0.01, start_valid=999, eval_freq=999,
                 truncated_freq=8, start_predicate_soft_alignment=5,
                 is_save=False, word2vec_path=folder + "mini_word2vec.vec")
    data = DataModel(cfg)
    pam = PredicateAlignModel(data.kgs, cfg)
    model = Model(cfg, data, pam, verbose=False)
    t0 = time.time()
    model.run()
    out = {"seconds": round(time.time() - t0, 1)}
    views = ("nv", "rv", "av", "final") if mode == "ITC" else \
            ("nv", "rv", "av", "avg", "wva", "final")
    for choice in views:
        mrr = vw.test_WVA(model) if choice == "wva" \
            else vw.test(model, embed_choice=choice)
        out[choice] = round(float(mrr), 4)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("epochs", nargs="?", type=int, default=20)
    ap.add_argument("--entities", type=int, default=5000)
    ap.add_argument("--mode", choices=["ITC", "SSL"], default="ITC")
    ap.add_argument("--out", default=None)
    ns = ap.parse_args()
    from multike_tpu.data import synthetic

    n = ns.entities
    results = {}
    for label, knobs in (
            ("default", {}),
            ("attr_independent_r3regime", {"attr_noise": 1.0,
                                           "complementary": False}),
            # individually-weak views: the regime where the MultiKE
            # combination claim (final > best single view) has headroom —
            # with complementary placement each entity's weak view is
            # covered by its two clean views
            ("balanced_hard", {"rel_noise": 0.3, "name_noise": 0.3,
                               "attr_noise": 0.3})):
        folder = synthetic.generate(
            f"/tmp/viewsig_{label}/", seed=5, n_entities=n,
            n_relations=max(8, n // 100), n_attributes=max(6, n // 500),
            n_rel_triples=6 * n, n_attr_triples=3 * n, **knobs)
        res = run(folder, ns.epochs, ns.mode)
        res["generator_knobs"] = knobs
        results[label] = res
        print(json.dumps({label: res}), flush=True)

    out = {"metric": "view_signal_quality", "mode": ns.mode,
           "entities_per_kg": n, "epochs": ns.epochs, "runs": results}
    path = ns.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "VIEW_SIGNAL_AB.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
