"""Predicate-alignment tests: Levenshtein seeding, zoom weights, sup/weighted
triple generation, embedding refresh blending."""
import numpy as np
import pytest

from multike_tpu.align.predicates import (add_weights,
                                          find_predicate_alignment_by_embedding,
                                          generate_sup_predicate_triples,
                                          init_predicate_alignment,
                                          predicate2id_matched_pairs,
                                          zoom_weight)


def test_zoom_weight():
    # predicate_alignment.py:129-131: rescale [min_w_before, 1] -> [0.5, 1]
    assert zoom_weight(1.0, 0.85) == 1.0
    assert np.isclose(zoom_weight(0.85, 0.85), 0.5)
    mid = zoom_weight(0.925, 0.85)
    assert 0.5 < mid < 1.0


def test_init_predicate_alignment_mutual_best():
    d1 = {"p1": "birth date", "p2": "name", "p3": "zzz"}
    d2 = {"q1": "birth date", "q2": "naame"}
    pairs, latent = init_predicate_alignment(d1, d2, 0.9)
    names = {(p1, p2) for (p1, p2, w) in pairs}
    assert ("p1", "q1") in names          # exact match, sim 1.0 > 0.9
    assert all(w > 0.9 for (_, _, w) in pairs)
    # latent keeps mutual best matches below threshold too
    assert ("p2", "q2") in latent


def test_generate_sup_predicate_triples():
    links = [(0, 10, 0.95)]
    triples1 = [(1, 0, 2), (1, 5, 2)]
    triples2 = [(3, 10, 4)]
    sup1, sup2 = generate_sup_predicate_triples(links, triples1, triples2)
    assert set(sup1) == {(1, 10, 2, 0.95)}   # p replaced by aligned partner
    assert set(sup2) == {(3, 0, 4, 0.95)}


def test_add_weights():
    links = [(0, 10, 0.95)]
    triples1 = [(1, 0, 2), (1, 5, 2)]
    triples2 = [(3, 10, 4)]
    w1, w2, _, _ = add_weights(links, triples1, triples2, 0.85)
    d1 = {(h, p, t): w for (h, p, t, w) in w1}
    assert np.isclose(d1[(1, 0, 2)], zoom_weight(0.95, 0.85))
    assert d1[(1, 5, 2)] == 0.2              # unaligned predicate weight


def test_find_predicate_alignment_by_embedding():
    # union table: ids 0,1 in kg1; 2,3 in kg2. 0~2 and 1~3 by construction.
    emb = np.array([[1, 0], [0, 1], [0.9, 0.1], [0.1, 0.9]], np.float32)
    latent = find_predicate_alignment_by_embedding(emb, [0, 1], [2, 3])
    assert set(latent) == {(0, 2), (1, 3)}
    assert latent[(0, 2)] > 0.9


def test_full_model_on_tiny_dataset(tiny_dataset, tiny_kgs):
    from multike_tpu.align.predicates import PredicateAlignModel
    from multike_tpu.config import Config

    cfg = Config(training_data=tiny_dataset)
    pam = PredicateAlignModel(tiny_kgs, cfg)
    # synthetic predicate names are identical across KGs -> full alignment
    assert len(pam.relation_id_alignment_set) > 0
    assert len(pam.attribute_id_alignment_set) > 0
    # weighted triples cover every local triple
    assert len(pam.relation_triples_w_weights1) == \
        tiny_kgs.kg1.local_relation_triples_num
    # refresh from random embeddings keeps a subset of the seed
    emb = np.random.RandomState(0).randn(
        tiny_kgs.relations_num, 8).astype(np.float32)
    before = set(pam.relation_alignment_set_init)
    pam.update_predicate_alignment(emb, "relation")
    after = pam.relation_alignment_set
    assert {(a, b) for a, b, _ in after} <= {(a, b) for a, b, _ in before}
