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
