"""Distributed helpers + failure-handling tests."""
import numpy as np
import pytest


def test_local_data_slice_single_process():
    from multike_tpu.parallel.distributed import local_data_slice

    s = local_data_slice(100)
    assert s == slice(0, 100)


def test_init_distributed_noop_single():
    from multike_tpu.parallel.distributed import init_distributed

    init_distributed(num_processes=1)  # must be a no-op


def test_task_divide_parity():
    from multike_tpu.utils.misc import task_divide

    # utils.py:35-49 semantics
    assert task_divide([1, 2, 3], 0) == [[1, 2, 3]]
    assert task_divide([], 3) == [[]]
    assert task_divide([1, 2], 5) == [[1, 2]]
    assert task_divide([1, 2, 3], 3) == [[1], [2], [3]]
    out = task_divide(list(range(10)), 3)
    assert out == [[0, 1, 2], [3, 4, 5], [6, 7, 8, 9]]


def test_interrupt_writes_checkpoint(tmp_path, monkeypatch):
    from multike_tpu.align.predicates import PredicateAlignModel
    from multike_tpu.config import Config
    from multike_tpu.data import synthetic
    from multike_tpu.data.dataset import DataModel
    from multike_tpu.train.itc import MultiKE_ITC

    folder = synthetic.generate(str(tmp_path / "ds") + "/", seed=6,
                                n_entities=40, n_rel_triples=120,
                                n_attr_triples=80)
    cfg = Config(training_data=folder, dim=8, batch_size=64,
                 entity_batch_size=32, attribute_batch_size=64,
                 encoder_epoch=1, neg_triple_num=2, max_epoch=3,
                 start_valid=99, eval_freq=99, truncated_freq=99,
                 start_predicate_soft_alignment=99, is_save=False,
                 checkpoint_dir=str(tmp_path / "ck"),
                 word2vec_path=folder + "mini_word2vec.vec")
    data = DataModel(cfg)
    pam = PredicateAlignModel(data.kgs, cfg)
    model = MultiKE_ITC(cfg, data, pam, verbose=False)

    calls = {"n": 0}
    orig = model.train_attribute_view_1epo

    def boom(epoch):
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt
        return orig(epoch)

    monkeypatch.setattr(model, "train_attribute_view_1epo", boom)
    with pytest.raises(KeyboardInterrupt):
        model.run()
    import os

    assert os.path.exists(tmp_path / "ck" / "itc_interrupt.npz")
