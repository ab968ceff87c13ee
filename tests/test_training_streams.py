"""Training-stream tests: sampling properties, Adagrad parity with a manual
update, and an end-to-end relation-view run that must improve alignment on
the synthetic dataset (the 'training-time evaluation as oracle' strategy,
SURVEY.md §4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multike_tpu.config import Config
from multike_tpu.sampling import (build_neighbor_state, empty_neighbor_state,
                                  sample_negatives)


def test_sample_negatives_properties():
    key = jax.random.PRNGKey(0)
    pos = jnp.asarray(np.array([[0, 0, 1], [2, 1, 3]] * 10, np.int32))
    lo = jnp.zeros(20, jnp.int32)
    hi = jnp.full((20,), 10, jnp.int32)
    neg = np.asarray(sample_negatives(key, pos, lo, hi, 5))
    assert neg.shape == (100, 3)
    pos_np = np.asarray(pos)
    rep = np.repeat(pos_np, 5, axis=0)
    # relation never corrupted; exactly one of head/tail differs or equals
    assert np.array_equal(neg[:, 1], rep[:, 1])
    changed_h = neg[:, 0] != rep[:, 0]
    changed_t = neg[:, 2] != rep[:, 2]
    assert not np.any(changed_h & changed_t)
    # all sampled entities within range
    assert neg[:, 0].min() >= 0 and neg[:, 0].max() < 10
    assert neg[:, 2].min() >= 0 and neg[:, 2].max() < 10


def test_sample_negatives_uses_neighbors():
    key = jax.random.PRNGKey(1)
    E = 20
    nbr = build_neighbor_state(E, [(np.array([0, 1]),
                                    np.array([[5, 6, 7], [8, 9, 10]], np.int32))])
    pos = jnp.asarray(np.array([[0, 0, 1]] * 50, np.int32))
    lo = jnp.zeros(50, jnp.int32)
    hi = jnp.full((50,), E, jnp.int32)
    neg = np.asarray(sample_negatives(key, pos, lo, hi, 4, nbr))
    # corrupted heads (head=0 has neighbors) must come from {5,6,7}
    ch = neg[neg[:, 0] != 0][:, 0]
    assert set(ch.tolist()) <= {5, 6, 7}
    # corrupted tails (tail=1 has neighbors) must come from {8,9,10}
    ct = neg[neg[:, 2] != 1][:, 2]
    assert set(ct.tolist()) <= {8, 9, 10}


def test_adagrad_matches_manual_sparse_update():
    """One rel_view step == manual TF-style Adagrad (acc0=0.1) on the rows
    touched, identity elsewhere."""
    import optax

    from multike_tpu.params import init_params, l2_normalize
    from multike_tpu.train import streams

    cfg = Config(dim=4, batch_size=4, neg_triple_num=1, learning_rate=0.1,
                 seed=0)
    params = init_params(cfg, entities_num=10, relations_num=3,
                         attributes_num=2)
    opt_states = streams.init_stream_opt_states(cfg, params)

    pos = jnp.asarray(np.array([[0, 0, 1], [2, 1, 3]], np.int32))
    mask = jnp.ones(2, jnp.float32)
    neg = jnp.asarray(np.array([[4, 0, 1], [2, 1, 5]], np.int32))

    def loss_fn(sub):
        from multike_tpu.losses import relation_logistic_loss
        from multike_tpu.params import lookup_norm

        return relation_logistic_loss(
            lookup_norm(sub["rv_ent"], pos[:, 0]),
            lookup_norm(sub["rel"], pos[:, 1]),
            lookup_norm(sub["rv_ent"], pos[:, 2]),
            lookup_norm(sub["rv_ent"], neg[:, 0]),
            lookup_norm(sub["rel"], neg[:, 1]),
            lookup_norm(sub["rv_ent"], neg[:, 2]), mask, mask)

    sub = {"rv_ent": params["rv_ent"], "rel": params["rel"]}
    grads = jax.grad(loss_fn)(sub)
    # manual adagrad
    want = {}
    for k in sub:
        g = np.asarray(grads[k])
        acc = 0.1 + g * g
        want[k] = np.asarray(sub[k]) - 0.1 * g / np.sqrt(acc)

    update = streams._make_update(cfg, "rel_view", lambda m, p, pm, n, nm:
                                  loss_fn({"rv_ent": m["rv_ent"], "rel": m["rel"]}))
    new_params, _, loss = update(params, opt_states["rel_view"], pos, mask,
                                 neg, mask)
    np.testing.assert_allclose(np.asarray(new_params["rv_ent"]),
                               want["rv_ent"], rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(new_params["rel"]), want["rel"],
                               rtol=2e-5, atol=1e-7)
    # untouched tables unchanged
    np.testing.assert_array_equal(np.asarray(new_params["av_ent"]),
                                  np.asarray(params["av_ent"]))


@pytest.fixture(scope="module")
def trained_trainer(request):
    """Train a few relation-view epochs on the synthetic dataset."""
    from multike_tpu.align.predicates import PredicateAlignModel
    from multike_tpu.data import synthetic
    from multike_tpu.data.dataset import DataModel
    from multike_tpu.train.trainer import MultiKETrainer

    folder = synthetic.generate(
        str(request.config.cache.mkdir("multike_ds2")) + "/", seed=3)
    cfg = Config(training_data=folder, dim=16, batch_size=200,
                 encoder_epoch=2, neg_triple_num=5, learning_rate=0.05,
                 word2vec_path=folder + "mini_word2vec.vec")
    data = DataModel(cfg)
    pam = PredicateAlignModel(data.kgs, cfg)
    return MultiKETrainer(cfg, data, pam), data


def test_relation_view_training_improves_alignment(trained_trainer):
    from multike_tpu.eval import views as vw

    trainer, data = trained_trainer
    before = vw.valid(trainer, embed_choice="rv")
    for ep in range(1, 16):
        trainer.train_relation_view_1epo(ep)
        trainer.train_cross_kg_entity_inference_relation_view_1epo(
            ep, trainer.kgs.kg1.sup_relation_triples_list
            + trainer.kgs.kg2.sup_relation_triples_list)
    after = vw.valid(trainer, embed_choice="rv")
    assert after > before, (before, after)


def test_neighbor_refresh_and_truncated_epoch(trained_trainer):
    trainer, _ = trained_trainer
    trainer.generate_neighbors()
    assert bool(np.asarray(trainer.neighbors.has).any())
    # one more epoch using truncated candidates must run fine
    loss = trainer.train_relation_view_1epo(99)
    assert np.isfinite(loss)


def test_attribute_and_combination_epochs(trained_trainer):
    trainer, _ = trained_trainer
    l1 = trainer.train_attribute_view_1epo(1)
    assert np.isfinite(l1)
    ents = trainer.kgs.kg1.entities_list + trainer.kgs.kg2.entities_list
    l2 = trainer.train_common_space_learning_1epo(1, ents)
    assert np.isfinite(l2)
    l3 = trainer.train_shared_space_mapping_1epo(1, ents)
    assert np.isfinite(l3)
    sup_attr = (trainer.kgs.kg1.sup_attribute_triples_list
                + trainer.kgs.kg2.sup_attribute_triples_list)
    if sup_attr:
        l4 = trainer.train_cross_kg_entity_inference_attribute_view_1epo(1, sup_attr)
        assert np.isfinite(l4)
    pam = trainer.predicate_align_model
    rel_inf = (pam.sup_relation_alignment_triples1
               + pam.sup_relation_alignment_triples2)
    if rel_inf:
        l5 = trainer.train_cross_kg_relation_inference_1epo(1, rel_inf)
        assert np.isfinite(l5)
    attr_inf = (pam.sup_attribute_alignment_triples1
                + pam.sup_attribute_alignment_triples2)
    if attr_inf:
        l6 = trainer.train_cross_kg_attribute_inference_1epo(1, attr_inf)
        assert np.isfinite(l6)


def test_checkpoint_roundtrip(tmp_path, trained_trainer):
    from multike_tpu.persistence import load_checkpoint, save_checkpoint

    trainer, _ = trained_trainer
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, trainer.params, trainer.opt_states, trainer.key, 7,
                    {"note": "x"})
    p2, o2, k2, epoch, extra = load_checkpoint(path, trainer.params,
                                               trainer.opt_states, trainer.key)
    assert epoch == 7 and extra == {"note": "x"}
    np.testing.assert_array_equal(np.asarray(p2["rv_ent"]),
                                  np.asarray(trainer.params["rv_ent"]))
