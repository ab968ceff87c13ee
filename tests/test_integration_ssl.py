"""End-to-end SSL integration: full driver incl. phase-2 shared-space
mapping and WVA test sweep."""
import numpy as np
import pytest


@pytest.mark.slow
def test_full_ssl_runs_and_learns(tmp_path):
    from multike_tpu.align.predicates import PredicateAlignModel
    from multike_tpu.config import Config
    from multike_tpu.data import synthetic
    from multike_tpu.data.dataset import DataModel
    from multike_tpu.eval import views as vw
    from multike_tpu.train.ssl import MultiKE_SSL

    folder = synthetic.generate(str(tmp_path / "ds") + "/", seed=13)
    cfg = Config(training_data=folder, dim=16, batch_size=256,
                 entity_batch_size=128, attribute_batch_size=256,
                 encoder_epoch=2, neg_triple_num=5, max_epoch=8,
                 shared_learning_max_epoch=6, learning_rate=0.02,
                 start_valid=99, eval_freq=99, truncated_freq=5,
                 start_predicate_soft_alignment=3, is_save=False,
                 word2vec_path=folder + "mini_word2vec.vec")
    data = DataModel(cfg)
    pam = PredicateAlignModel(data.kgs, cfg)
    model = MultiKE_SSL(cfg, data, pam, verbose=False)

    before_rv = vw.valid(model, embed_choice="rv")
    results = model.run()
    after_rv = vw.valid(model, embed_choice="rv")

    assert after_rv > before_rv, (before_rv, after_rv)
    assert set(results) == {"nv", "rv", "av", "avg", "wva", "final"}
    assert all(np.isfinite(v) for v in results.values())
    # phase 2 trained the shared space: mapping loss stream recorded epochs
    assert len(model.metrics.stream_records("space_mapping")) == 6
