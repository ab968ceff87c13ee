"""Shared FULL-DRIVER workload for the multi-process equivalence test
(VERDICT r3 item 1): a complete compressed ITC run — all 8 streams, the
truncated phase after neighbor refreshes, a predicate-alignment refresh
(epoch 10 cadence), eval on cadence, checkpoint save — through
``MultiKE_ITC.run()``. Kept in its own module so the pytest process and the
spawned jax.distributed workers build bit-identical inputs.

This retires the reference's producer pipeline end-to-end
(/root/reference/code/MultiKE_Late.py:209-211): the mp workers replace its
multiprocessing batch producers with edge-partitioned jax.distributed
processes over one mesh.
"""
from __future__ import annotations


def make_cfg(folder: str, ckpt_dir: str, dp: int = 1, tp: int = 1):
    from multike_tpu.config import Config

    return Config(
        training_data=folder, dim=16, batch_size=100, entity_batch_size=64,
        attribute_batch_size=100, encoder_epoch=1, neg_triple_num=2,
        max_epoch=10, start_valid=4, eval_freq=4, truncated_freq=3,
        start_predicate_soft_alignment=2, checkpoint_dir=ckpt_dir,
        checkpoint_freq=5, is_save=False, seed=11,
        row_sparse_updates=True, mesh_dp=dp, mesh_tp=tp,
        word2vec_path=folder + "mini_word2vec.vec")


def run_driver(cfg):
    """Full ITC run; returns (model, per-view final test MRRs)."""
    from multike_tpu.align.predicates import PredicateAlignModel
    from multike_tpu.data.dataset import DataModel
    from multike_tpu.train.itc import MultiKE_ITC

    data = DataModel(cfg)
    pam = PredicateAlignModel(data.kgs, cfg)
    model = MultiKE_ITC(cfg, data, pam, verbose=False)
    results = model.run()
    return model, {k: float(v) for k, v in results.items()}
