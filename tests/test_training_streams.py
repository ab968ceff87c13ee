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


def test_row_adagrad_apply_matches_dense_optax():
    """sparse_adagrad.row_apply on (possibly duplicated) batch ids ==
    dense optax.adagrad on the scatter-summed dense gradient. Duplicate ids
    must combine BEFORE squaring (TF1 IndexedSlices semantics)."""
    import optax

    from multike_tpu.train import sparse_adagrad

    rng = np.random.RandomState(0)
    E, d, N = 12, 5, 9
    param = jnp.asarray(rng.randn(E, d), jnp.float32)
    ids = jnp.asarray(np.array([3, 7, 3, 0, 7, 7, 11, 3, 5]), jnp.int32)
    g_rows = jnp.asarray(rng.randn(N, d), jnp.float32)

    # dense reference
    gdense = np.zeros((E, d), np.float32)
    np.add.at(gdense, np.asarray(ids), np.asarray(g_rows))
    opt = optax.adagrad(0.1, initial_accumulator_value=0.1)
    st = opt.init(param)
    upd, _ = opt.update(jnp.asarray(gdense), st, param)
    want = np.asarray(optax.apply_updates(param, upd))

    acc = sparse_adagrad.init_acc(param)
    got, new_acc = sparse_adagrad.row_apply(param, acc, ids, g_rows, 0.1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-6, atol=1e-7)
    # untouched rows: param and accumulator bit-identical
    untouched = sorted(set(range(E)) - {0, 3, 5, 7, 11})
    np.testing.assert_array_equal(np.asarray(got)[untouched],
                                  np.asarray(param)[untouched])
    np.testing.assert_array_equal(np.asarray(new_acc)[untouched],
                                  np.asarray(acc)[untouched])


@pytest.mark.parametrize("stream_cfg", ["chunk_shared", "per_slot"])
def test_row_sparse_epoch_equals_dense_optax(stream_cfg):
    """A rel_view epoch must produce identical parameters under the
    row-sparse Adagrad path and the dense optax path (same RNG key =>
    same batches/negatives; the two updates are the same math)."""
    from multike_tpu.params import init_params
    from multike_tpu.train import streams

    E, R = 40, 5
    rng = np.random.RandomState(1)
    t1 = np.stack([rng.randint(0, 20, 90), rng.randint(0, R, 90),
                   rng.randint(0, 20, 90)], 1).astype(np.int32)
    t2 = np.stack([rng.randint(20, 40, 70), rng.randint(0, R, 70),
                   rng.randint(20, 40, 70)], 1).astype(np.int32)

    results = {}
    for sparse in (True, False):
        cfg = Config(dim=8, batch_size=32, neg_triple_num=3,
                     learning_rate=0.05, neg_scheme=stream_cfg,
                     neg_chunk_size=8, row_sparse_updates=sparse)
        params = init_params(cfg, E, R, 2)
        opt = streams.init_stream_opt_states(cfg, params)["rel_view"]
        epoch, _, _ = streams.build_rel_view_epoch(
            cfg, len(t1), len(t2), ((0, 20), (20, 40)),
            with_neighbors=False)
        key = jax.random.PRNGKey(7)
        for _ in range(2):
            params, opt, key, loss = epoch(params, opt, key,
                                           jnp.asarray(t1), jnp.asarray(t2))
        results[sparse] = (np.asarray(params["rv_ent"]),
                           np.asarray(params["rel"]), float(loss))

    np.testing.assert_allclose(results[True][0], results[False][0],
                               rtol=3e-5, atol=1e-6)
    np.testing.assert_allclose(results[True][1], results[False][1],
                               rtol=3e-5, atol=1e-6)
    assert np.isclose(results[True][2], results[False][2], rtol=1e-4)


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


def test_row_adagrad_apply_with_row_offset_matches_dense():
    """row_apply on a tp row shard (row_offset > 0) must apply exactly the
    dense update restricted to the shard's rows — with duplicate ids in the
    batch and ids both below and above the shard (ADVICE r3 high: dropped
    slots must keep the scatter's unique_indices promise)."""
    import optax

    from multike_tpu.train import sparse_adagrad

    rng = np.random.RandomState(2)
    total, d = 20, 4
    off, E_local = 5, 8               # shard owns global rows [5, 13)
    full = rng.randn(total, d).astype(np.float32)
    ids = jnp.asarray(np.array([1, 7, 7, 3, 12, 18, 7, 5, 12]), jnp.int32)
    g_rows = jnp.asarray(rng.randn(len(ids), d), jnp.float32)

    gdense = np.zeros((total, d), np.float32)
    np.add.at(gdense, np.asarray(ids), np.asarray(g_rows))
    opt = optax.adagrad(0.1, initial_accumulator_value=0.1)
    st = opt.init(jnp.asarray(full))
    upd, _ = opt.update(jnp.asarray(gdense), st, jnp.asarray(full))
    want = np.asarray(optax.apply_updates(jnp.asarray(full), upd))

    shard = jnp.asarray(full[off:off + E_local])
    acc = sparse_adagrad.init_acc(shard)
    got, _ = sparse_adagrad.row_apply(shard, acc, ids, g_rows, 0.1,
                                      row_offset=off, total_rows=total)
    np.testing.assert_allclose(np.asarray(got), want[off:off + E_local],
                               rtol=2e-6, atol=1e-7)


def test_neg_scheme_validated():
    """A misspelled neg_scheme must raise instead of silently falling back
    to per_slot (VERDICT r3 weak 4)."""
    from multike_tpu.train import streams

    cfg = Config(dim=8, batch_size=50, neg_triple_num=2, neg_scheme="typo")
    with pytest.raises(ValueError, match="neg_scheme"):
        streams.build_rel_view_epoch(cfg, 100, 100, ((0, 50), (50, 100)),
                                     with_neighbors=False)
