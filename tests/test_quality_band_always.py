"""Always-on quality band (VERDICT r3 item 5): a 5K-entity full-cadence ITC
run in the DEFAULT suite — no env gate — so quality regressions fail CI.

Floors are observed-minus-noise from the recorded r4 baseline (CPU, 5K
entities, 20 epochs, complementary-noise generator, seed 5:
nv 0.9061 / rv 0.9725 / av 0.3665 / final 0.7946 — VIEW_SIGNAL_AB.json,
docs/EXPERIMENTS.md r4). The run exercises the full cadence: predicate soft
alignment + refresh, truncated-neighbor refreshes, and eval on cadence.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_quality_band_small(tmp_path_factory):
    from multike_tpu.align.predicates import PredicateAlignModel
    from multike_tpu.config import Config
    from multike_tpu.data import synthetic
    from multike_tpu.data.dataset import DataModel
    from multike_tpu.eval import views as vw
    from multike_tpu.train.itc import MultiKE_ITC

    folder = synthetic.generate(
        str(tmp_path_factory.mktemp("qband")) + "/", seed=5,
        n_entities=5000, n_relations=50, n_attributes=10,
        n_rel_triples=30000, n_attr_triples=15000)
    cfg = Config(training_data=folder, dim=32, batch_size=2048,
                 entity_batch_size=1024, attribute_batch_size=2048,
                 encoder_epoch=3, neg_triple_num=10, max_epoch=20,
                 learning_rate=0.01, start_valid=10, eval_freq=10,
                 truncated_freq=8, start_predicate_soft_alignment=5,
                 is_save=False, word2vec_path=folder + "mini_word2vec.vec")
    data = DataModel(cfg)
    pam = PredicateAlignModel(data.kgs, cfg)
    model = MultiKE_ITC(cfg, data, pam, verbose=False)
    model.run()
    views = {c: float(vw.test(model, embed_choice=c))
             for c in ("nv", "rv", "av", "final")}
    # observed-minus-noise floors (see module docstring); the eval cadence
    # (start_valid=10 vs 999 in the baseline) only ADDS early-stop checks,
    # it does not change training
    assert views["rv"] >= 0.92, views
    assert views["nv"] >= 0.85, views
    assert views["av"] >= 0.25, views
    assert views["final"] >= 0.70, views


def test_combination_property_sparse(tmp_path_factory):
    """The property that defines MultiKE — the combined embedding beats
    EVERY single view (reference eval sweep MultiKE_Late.py:275-280) — is
    CI-guarded on the regime where it demonstrably holds (VERDICT r4 item
    2b): a sparse relation graph (1 triple/entity) with each view noisy in
    its own subset (name_noise 0.2, rel_noise 0.25, rich attributes) — the
    5K analog of COMBINATION_DEMO4/5's premise that the views must be
    COMPARABLE for combination to win. On dense synthetic graphs the
    near-perfect rv sits above the equal-weight combination (reference
    objective, cv weights 1 — args.json:39-40). Calibrated over seeds
    5/6/7: final beats the best single view by +1.3/+1.9/+2.8pt
    (docs/EXPERIMENTS.md r5); the pinned seed 5 is the thinnest of the
    three."""
    from multike_tpu.align.predicates import PredicateAlignModel
    from multike_tpu.config import Config
    from multike_tpu.data import synthetic
    from multike_tpu.data.dataset import DataModel
    from multike_tpu.eval import views as vw
    from multike_tpu.train.itc import MultiKE_ITC

    folder = synthetic.generate(
        str(tmp_path_factory.mktemp("qcomb")) + "/", seed=5,
        n_entities=5000, n_relations=50, n_attributes=25,
        n_rel_triples=5000, n_attr_triples=30000,
        name_noise=0.2, rel_noise=0.25)
    cfg = Config(training_data=folder, dim=75, batch_size=2048,
                 entity_batch_size=1024, attribute_batch_size=2048,
                 encoder_epoch=3, neg_triple_num=10, max_epoch=30,
                 learning_rate=0.01, start_valid=999, eval_freq=999,
                 truncated_freq=8, start_predicate_soft_alignment=5,
                 is_save=False, word2vec_path=folder + "mini_word2vec.vec")
    data = DataModel(cfg)
    pam = PredicateAlignModel(data.kgs, cfg)
    model = MultiKE_ITC(cfg, data, pam, verbose=False)
    model.run()
    views = {c: float(vw.test(model, embed_choice=c))
             for c in ("nv", "rv", "av", "final")}
    assert views["final"] > max(views["nv"], views["rv"], views["av"]), views


def test_combination_property_sparse_ssl(tmp_path_factory):
    """SSL analog of the combination guard: on the same comparable-views
    sparse regime, the LATE combinations — plain average and the
    reference's weighted view averaging (MultiKE_Late.py:64-173) — must
    beat every single view. Calibrated over seeds 5/6/7: wva margin
    +1.7/+5.4/+8.4pt, avg +3.5/+4.5/+6.4pt (docs/EXPERIMENTS.md r5). NB on
    regimes with one strictly dominant view, late averaging legitimately
    loses to it (COMBINATION_DEMO_SSL.json) — comparable views making
    independent errors are the property's premise."""
    from multike_tpu.align.predicates import PredicateAlignModel
    from multike_tpu.config import Config
    from multike_tpu.data import synthetic
    from multike_tpu.data.dataset import DataModel
    from multike_tpu.eval import views as vw
    from multike_tpu.train.ssl import MultiKE_SSL

    folder = synthetic.generate(
        str(tmp_path_factory.mktemp("qcombssl")) + "/", seed=5,
        n_entities=5000, n_relations=50, n_attributes=25,
        n_rel_triples=5000, n_attr_triples=30000,
        name_noise=0.2, rel_noise=0.25)
    cfg = Config(training_data=folder, dim=75, batch_size=2048,
                 entity_batch_size=1024, attribute_batch_size=2048,
                 encoder_epoch=3, neg_triple_num=10, max_epoch=25,
                 shared_learning_max_epoch=12,
                 learning_rate=0.01, start_valid=999, eval_freq=999,
                 truncated_freq=8, start_predicate_soft_alignment=5,
                 is_save=False, word2vec_path=folder + "mini_word2vec.vec")
    data = DataModel(cfg)
    pam = PredicateAlignModel(data.kgs, cfg)
    model = MultiKE_SSL(cfg, data, pam, verbose=False)
    model.run()
    views = {c: float(vw.test(model, embed_choice=c))
             for c in ("nv", "rv", "av", "avg")}
    views["wva"] = float(vw.test_WVA(model))
    best_single = max(views["nv"], views["rv"], views["av"])
    assert views["wva"] > best_single, views
    assert views["avg"] > best_single, views
