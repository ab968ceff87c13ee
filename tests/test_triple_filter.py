"""Bloom-filter exact-rejection sampling tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multike_tpu.sampling import (TripleFilter, _filter_contains,
                                  build_triple_filter, sample_negatives)


def test_filter_no_false_negatives():
    rng = np.random.RandomState(0)
    triples = rng.randint(0, 1000, size=(5000, 3)).astype(np.int32)
    f = build_triple_filter(triples, log2m=20)
    got = np.asarray(_filter_contains(
        f, jnp.asarray(triples[:, 0]), jnp.asarray(triples[:, 1]),
        jnp.asarray(triples[:, 2])))
    assert got.all()  # every true triple tests positive


def test_filter_low_false_positive_rate():
    rng = np.random.RandomState(1)
    triples = rng.randint(0, 500, size=(2000, 3)).astype(np.int32)
    f = build_triple_filter(triples, log2m=20)
    probe = rng.randint(1000, 2000, size=(20000, 3)).astype(np.int32)  # disjoint
    got = np.asarray(_filter_contains(
        f, jnp.asarray(probe[:, 0]), jnp.asarray(probe[:, 1]),
        jnp.asarray(probe[:, 2])))
    assert got.mean() < 0.01


def test_rejection_sampling_removes_true_triples():
    """A dense graph where false negatives are frequent without rejection."""
    rng = np.random.RandomState(2)
    E = 12
    # dense KG: ~60% of all (h, r, t) pairs exist for a single relation
    all_pairs = [(h, 0, t) for h in range(E) for t in range(E) if h != t]
    rng.shuffle(all_pairs)
    triples = np.asarray(all_pairs[: int(0.6 * len(all_pairs))], np.int32)
    tset = {tuple(x) for x in triples}
    f = build_triple_filter(triples, log2m=16)

    pos = jnp.asarray(triples[:50])
    lo = jnp.zeros(50, jnp.int32)
    hi = jnp.full((50,), E, jnp.int32)
    key = jax.random.PRNGKey(0)

    neg_plain = np.asarray(sample_negatives(key, pos, lo, hi, 10))
    frac_plain = np.mean([tuple(x) in tset for x in neg_plain])

    neg_rej = np.asarray(sample_negatives(key, pos, lo, hi, 10,
                                          tfilter=f, retries=8))
    frac_rej = np.mean([tuple(x) in tset for x in neg_rej])
    assert frac_plain > 0.3          # dense graph: plain sampling hits many
    assert frac_rej < frac_plain / 4  # rejection eliminates nearly all


def test_trainer_uses_filter(tmp_path):
    from multike_tpu.align.predicates import PredicateAlignModel
    from multike_tpu.config import Config
    from multike_tpu.data import synthetic
    from multike_tpu.data.dataset import DataModel
    from multike_tpu.train.trainer import MultiKETrainer

    folder = synthetic.generate(str(tmp_path / "ds") + "/", seed=4,
                                n_entities=50, n_rel_triples=150,
                                n_attr_triples=100)
    cfg = Config(training_data=folder, dim=8, batch_size=64, encoder_epoch=1,
                 neg_triple_num=3, neg_rejection_tries=3,
                 word2vec_path=folder + "mini_word2vec.vec")
    data = DataModel(cfg)
    pam = PredicateAlignModel(data.kgs, cfg)
    tr = MultiKETrainer(cfg, data, pam, verbose=False)
    assert tr.triple_filter is not None
    loss = tr.train_relation_view_1epo(1)
    assert np.isfinite(loss)

def test_drop_mode_masks_all_true_triples():
    """reject_mode='drop': every sampled candidate that assembles into a true
    triple must carry keep == 0 (the Bloom filter has no false negatives)."""
    from multike_tpu.sampling import sample_corruptions

    rng = np.random.RandomState(3)
    E = 12
    all_pairs = [(h, 0, t) for h in range(E) for t in range(E) if h != t]
    rng.shuffle(all_pairs)
    triples = np.asarray(all_pairs[: int(0.6 * len(all_pairs))], np.int32)
    tset = {tuple(x) for x in triples}
    f = build_triple_filter(triples, log2m=16)

    pos = jnp.asarray(triples[:50])
    key = jax.random.PRNGKey(1)
    cand, ch, keep = sample_corruptions(key, pos, 0, E, 10, tfilter=f,
                                        reject_mode="drop")
    assert keep is not None and keep.shape == (50, 10)
    cand, ch, keep = np.asarray(cand), np.asarray(ch), np.asarray(keep)
    h, r, t = triples[:50, 0], triples[:50, 1], triples[:50, 2]
    for i in range(50):
        for k in range(10):
            neg = ((cand[i, k], r[i], t[i]) if ch[i, k]
                   else (h[i], r[i], cand[i, k]))
            if tuple(int(x) for x in neg) in tset:
                assert keep[i, k] == 0.0


def test_resample_mode_returns_none_keep():
    from multike_tpu.sampling import sample_corruptions

    pos = jnp.asarray(np.asarray([[0, 0, 1], [1, 0, 2]], np.int32))
    _, _, keep = sample_corruptions(jax.random.PRNGKey(0), pos, 0, 10, 4)
    assert keep is None
