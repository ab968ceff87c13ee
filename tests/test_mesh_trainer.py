"""Mesh-integrated trainer tests: the real MultiKETrainer driving all its
epoch fns over a ('dp','tp') mesh built from cfg.mesh_dp/mesh_tp, with
per-stream losses equal to the single-device run (VERDICT r1 item 2 /
BASELINE config 5's edge-partitioned training)."""
import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def mesh_dataset(tmp_path_factory):
    from multike_tpu.data import synthetic

    folder = str(tmp_path_factory.mktemp("mesh_ds")) + "/"
    return synthetic.generate(folder, seed=5)


def _make_trainer(folder, **mesh):
    from multike_tpu.align.predicates import PredicateAlignModel
    from multike_tpu.config import Config
    from multike_tpu.data.dataset import DataModel
    from multike_tpu.train.trainer import MultiKETrainer

    cfg = Config(training_data=folder, dim=16, batch_size=200,
                 entity_batch_size=120, encoder_epoch=2, neg_triple_num=4,
                 learning_rate=0.05,
                 word2vec_path=folder + "mini_word2vec.vec", **mesh)
    data = DataModel(cfg)
    pam = PredicateAlignModel(data.kgs, cfg)
    return MultiKETrainer(cfg, data, pam, verbose=False)


def _run_all_streams(tr):
    """One epoch of every stream, in the ITC driver's order. Returns
    {stream: loss}."""
    kgs = tr.kgs
    pam = tr.predicate_align_model
    losses = {}
    losses["rel_view"] = tr.train_relation_view_1epo(1)
    losses["ckge_rel"] = tr.train_cross_kg_entity_inference_relation_view_1epo(
        1, kgs.kg1.sup_relation_triples_list + kgs.kg2.sup_relation_triples_list)
    rel_inf = (pam.sup_relation_alignment_triples1
               + pam.sup_relation_alignment_triples2)
    if rel_inf:
        losses["ckgp_rel"] = tr.train_cross_kg_relation_inference_1epo(1, rel_inf)
    losses["attr_view"] = tr.train_attribute_view_1epo(1)
    sup_attr = (kgs.kg1.sup_attribute_triples_list
                + kgs.kg2.sup_attribute_triples_list)
    if sup_attr:
        losses["ckge_attr"] = \
            tr.train_cross_kg_entity_inference_attribute_view_1epo(1, sup_attr)
    attr_inf = (pam.sup_attribute_alignment_triples1
                + pam.sup_attribute_alignment_triples2)
    if attr_inf:
        losses["ckga_attr"] = tr.train_cross_kg_attribute_inference_1epo(1, attr_inf)
    ents = kgs.kg1.entities_list + kgs.kg2.entities_list
    losses["common_space"] = tr.train_common_space_learning_1epo(1, ents)
    losses["space_mapping"] = tr.train_shared_space_mapping_1epo(1, ents)
    return losses


@pytest.mark.parametrize("mesh", [dict(mesh_dp=8, mesh_tp=1),
                                  dict(mesh_dp=2, mesh_tp=4)])
def test_mesh_trainer_equals_single_device(mesh_dataset, mesh):
    """dp=8 (and dp=2/tp=4) trainer epochs produce the same per-stream
    losses and parameters as the single-device trainer: same RNG -> same
    batches/negatives; mesh collectives only change float reduction order."""
    base = _make_trainer(mesh_dataset)
    assert base.pctx is None
    meshed = _make_trainer(mesh_dataset, **mesh)
    assert meshed.pctx is not None
    assert meshed.pctx.dp == mesh["mesh_dp"]

    l0 = _run_all_streams(base)
    l1 = _run_all_streams(meshed)
    assert set(l0) == set(l1)
    for k in l0:
        assert np.isclose(l0[k], l1[k], rtol=2e-3), (k, l0[k], l1[k])

    E = base.kgs.entities_num
    for t in ("rv_ent", "av_ent", "ent"):
        a = np.asarray(base.params[t])[:E]
        b = np.asarray(meshed.params[t])[:E]
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-6, err_msg=t)


def test_mesh_eval_matches_single_device(mesh_dataset):
    """views.valid/test on a meshed trainer go through the ring-distributed
    ranker (eval/ring.py) and must return the same MRR as the single-device
    blockwise engine."""
    from multike_tpu.eval import views as vw

    base = _make_trainer(mesh_dataset)
    meshed = _make_trainer(mesh_dataset, mesh_dp=8, mesh_tp=1)
    for choice in ("nv", "rv"):
        a = vw.valid(base, embed_choice=choice)
        b = vw.valid(meshed, embed_choice=choice)
        assert np.isclose(a, b, rtol=1e-6), (choice, a, b)
    # accurate mode compared on the trained rv view: the frozen nv view has
    # exact-duplicate rows (shared synthetic names), where 1-ulp reduction-
    # order differences between the engines legitimately flip tie ranks.
    a = vw.test(base, embed_choice="rv")
    b = vw.test(meshed, embed_choice="rv")
    assert np.isclose(a, b, rtol=1e-6), (a, b)


def test_mesh_trainer_truncated_phase(mesh_dataset):
    """Neighbor refresh + the truncated (per_slot) epoch also run on the
    mesh."""
    tr = _make_trainer(mesh_dataset, mesh_dp=4, mesh_tp=2)
    tr.generate_neighbors()
    assert bool(np.asarray(tr.neighbors.has).any())
    loss = tr.train_relation_view_1epo(2)
    assert np.isfinite(loss)
