"""Quality-parity CI (slow): the TPU-native chunk-shared negative scheme
must match the reference-exact per_slot scheme on final alignment MRR, and
both must clear an absolute regression band (VERDICT r1 item 5).

A compressed version of benchmarks/neg_scheme_quality.py (2K entities,
12 epochs) so it is runnable in CI; the 5K/20-epoch numbers live in
docs/EXPERIMENTS.md.
"""
import numpy as np
import pytest


def _run_itc(folder: str, scheme: str, epochs: int = 12):
    from multike_tpu.align.predicates import PredicateAlignModel
    from multike_tpu.config import Config
    from multike_tpu.data.dataset import DataModel
    from multike_tpu.eval import views as vw
    from multike_tpu.train.itc import MultiKE_ITC

    cfg = Config(training_data=folder, dim=24, batch_size=1024,
                 entity_batch_size=512, attribute_batch_size=1024,
                 encoder_epoch=2, neg_triple_num=10, max_epoch=epochs,
                 learning_rate=0.01, neg_scheme=scheme,
                 start_valid=999, eval_freq=999, truncated_freq=6,
                 start_predicate_soft_alignment=4, is_save=False,
                 word2vec_path=folder + "mini_word2vec.vec")
    data = DataModel(cfg)
    pam = PredicateAlignModel(data.kgs, cfg)
    model = MultiKE_ITC(cfg, data, pam, verbose=False)
    model.run()
    return {c: float(vw.test(model, embed_choice=c)) for c in ("rv", "final")}


@pytest.mark.slow
def test_chunk_shared_quality_matches_per_slot(tmp_path_factory):
    from multike_tpu.data import synthetic

    folder = synthetic.generate(
        str(tmp_path_factory.mktemp("negq")) + "/", seed=5,
        n_entities=2000, n_rel_triples=12000, n_attr_triples=6000)
    chunk = _run_itc(folder, "chunk_shared")
    slot = _run_itc(folder, "per_slot")

    # scheme parity: the shared-pool estimator must not cost quality
    assert chunk["rv"] >= slot["rv"] - 0.05, (chunk, slot)
    # absolute regression band (measured at the fixed r2 HEAD: rv MRR ~0.9+
    # on this 2K synthetic after 12 epochs for both schemes)
    assert chunk["rv"] > 0.75, chunk
    assert slot["rv"] > 0.75, slot
