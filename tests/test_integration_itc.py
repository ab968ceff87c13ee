"""End-to-end ITC integration: the full driver must improve alignment on the
synthetic dataset (training-time evaluation as oracle, SURVEY.md §4)."""
import numpy as np
import pytest


@pytest.mark.slow
def test_full_itc_improves_alignment(tmp_path):
    from multike_tpu.align.predicates import PredicateAlignModel
    from multike_tpu.config import Config
    from multike_tpu.data import synthetic
    from multike_tpu.data.dataset import DataModel
    from multike_tpu.eval import views as vw
    from multike_tpu.train.itc import MultiKE_ITC

    folder = synthetic.generate(str(tmp_path / "ds") + "/", seed=9)
    cfg = Config(training_data=folder, dim=16, batch_size=256,
                 entity_batch_size=128, attribute_batch_size=256,
                 encoder_epoch=2, neg_triple_num=5, max_epoch=12,
                 learning_rate=0.02,
                 start_valid=99, eval_freq=99, truncated_freq=6,
                 start_predicate_soft_alignment=4, is_save=False,
                 word2vec_path=folder + "mini_word2vec.vec")
    data = DataModel(cfg)
    pam = PredicateAlignModel(data.kgs, cfg)
    model = MultiKE_ITC(cfg, data, pam, verbose=False)

    before_rv = vw.valid(model, embed_choice="rv")
    before_final = vw.valid(model, embed_choice="final")
    results = model.run()

    after_rv = vw.valid(model, embed_choice="rv")
    after_final = vw.valid(model, embed_choice="final")
    assert after_rv > before_rv, (before_rv, after_rv)
    assert after_final > before_final, (before_final, after_final)
    # all final test MRRs finite, nv view strong on name-shared data
    assert all(np.isfinite(v) for v in results.values())
    assert results["nv"] > 0.9
    # metrics recorded with throughput numbers
    assert model.metrics.throughput("rel_view") is not None


def _early_stop_epochs(tmp_path, monkeypatch, tag, enable, metric="mrr"):
    """Run a tiny ITC driver with a monkeypatched (declining) validation
    trajectory; return the number of eval-cadence epochs executed."""
    from multike_tpu.align.predicates import PredicateAlignModel
    from multike_tpu.config import Config
    from multike_tpu.data import synthetic
    from multike_tpu.data.dataset import DataModel
    from multike_tpu.eval import views as vw
    from multike_tpu.train.itc import MultiKE_ITC

    folder = synthetic.generate(str(tmp_path / tag) + "/", seed=9)
    cfg = Config(training_data=folder, dim=16, batch_size=256,
                 entity_batch_size=128, attribute_batch_size=256,
                 encoder_epoch=2, neg_triple_num=5, max_epoch=6,
                 start_valid=1, eval_freq=1, truncated_freq=6,
                 start_predicate_soft_alignment=99, is_save=False,
                 enable_early_stop=enable, stop_metric=metric,
                 word2vec_path=folder + "mini_word2vec.vec")
    data = DataModel(cfg)
    pam = PredicateAlignModel(data.kgs, cfg)
    model = MultiKE_ITC(cfg, data, pam, verbose=False)

    calls = []
    # strictly declining validation metric from the first eval onward
    monkeypatch.setattr(vw, "valid", lambda *a, **k: 0.0)
    monkeypatch.setattr(vw, "test", lambda *a, **k: 0.0)

    def fake_valid_metrics(trainer, embed_choice="avg", w=(1, 1, 1)):
        calls.append(embed_choice)
        v = 0.9 - 0.1 * len(calls)
        return v, v

    monkeypatch.setattr(vw, "valid_metrics", fake_valid_metrics)
    model.run()
    return len(calls)


def test_early_stop_gate_off_is_reference_parity(tmp_path, monkeypatch):
    """Default enable_early_stop=False trains to max_epoch even on a
    strictly declining validation metric (MultiKE_CSL.py:77-78 parity)."""
    n = _early_stop_epochs(tmp_path, monkeypatch, "off", enable=False)
    assert n == 6, n


def test_early_stop_gate_on_stops_after_two_declines(tmp_path, monkeypatch):
    """enable_early_stop=True arms the two-step decline rule: with the
    trajectory 0.8, 0.7, 0.6, ... the third eval satisfies
    flag <= flag2 <= flag1 and the driver stops."""
    n = _early_stop_epochs(tmp_path, monkeypatch, "on", enable=True)
    assert n == 3, n
    n = _early_stop_epochs(tmp_path, monkeypatch, "on-h1", enable=True,
                           metric="hits1")
    assert n == 3, n
