"""Synthetic two-KG dataset generator in the reference folder layout.

Produces the exact file set ``read_kgs_from_folder`` + ``DataModel`` expect
(rel_triples_{1,2}, attr_triples_{1,2}, entity_local_name_{1,2},
predicate_local_name_{1,2}, <division>/{train,valid,test}_links and a small
fastText-style ``.vec`` word-embedding file), so tests and benchmarks can run
end-to-end without the (absent) DWY100K archive. The two KGs are generated as
noisy copies of one underlying graph so entity alignment is learnable.
"""
from __future__ import annotations

import os
import random
from typing import List, Tuple

import numpy as np

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "red", "green", "blue", "amber", "coral",
    "ivory", "jade", "onyx", "pearl", "ruby", "slate", "topaz", "umber",
]


def _entity_name(i: int) -> str:
    return f"{WORDS[i % len(WORDS)]} {WORDS[(7 * i + 3) % len(WORDS)]} {i}"


def generate(folder: str,
             n_entities: int = 120,
             n_relations: int = 8,
             n_attributes: int = 6,
             n_rel_triples: int = 600,
             n_attr_triples: int = 400,
             division: str = "631/",
             link_fracs: Tuple[float, float, float] = (0.6, 0.1, 0.3),
             seed: int = 7,
             write_word2vec: bool = True) -> str:
    rng = random.Random(seed)
    os.makedirs(folder, exist_ok=True)
    os.makedirs(os.path.join(folder, division.strip("/")), exist_ok=True)

    ents1 = [f"http://kg1/e{i}" for i in range(n_entities)]
    ents2 = [f"http://kg2/ent{i}" for i in range(n_entities)]
    rels1 = [f"http://kg1/r{i}" for i in range(n_relations)]
    rels2 = [f"http://kg2/rel{i}" for i in range(n_relations)]
    attrs1 = [f"http://kg1/a{i}" for i in range(n_attributes)]
    attrs2 = [f"http://kg2/attr{i}" for i in range(n_attributes)]

    # Underlying graph; KG2 is a perturbed copy (drop/replace ~20% of edges).
    base_edges = set()
    while len(base_edges) < n_rel_triples:
        h = rng.randrange(n_entities)
        t = rng.randrange(n_entities)
        if h == t:
            continue
        r = rng.randrange(n_relations)
        base_edges.add((h, r, t))
    base_edges = sorted(base_edges)

    def write_rel(path: str, ents: List[str], rels: List[str], flip: bool):
        with open(path, "w", encoding="utf8") as f:
            for (h, r, t) in base_edges:
                if flip and rng.random() < 0.2:
                    t = rng.randrange(n_entities)  # perturb
                    if t == h:
                        continue
                f.write(f"{ents[h]}\t{rels[r]}\t{ents[t]}\n")

    write_rel(os.path.join(folder, "rel_triples_1"), ents1, rels1, flip=False)
    write_rel(os.path.join(folder, "rel_triples_2"), ents2, rels2, flip=True)

    # Attribute triples: values are small word phrases; some numeric; some
    # carry datatype suffixes to exercise the cleaner; every attribute gets
    # >= MIN_ATTR_FREQ triples so cleaning keeps them.
    def make_value(i: int) -> str:
        roll = rng.random()
        if roll < 0.2:
            return f"{rng.randrange(1900, 2030)}"
        if roll < 0.3:
            return f'"{rng.randrange(100)}"^^<http://www.w3.org/2001/XMLSchema#integer>'
        w1 = WORDS[rng.randrange(len(WORDS))]
        w2 = WORDS[rng.randrange(len(WORDS))]
        return f"{w1} {w2}"

    def write_attr(path: str, ents: List[str], attrs: List[str]):
        with open(path, "w", encoding="utf8") as f:
            n = 0
            while n < n_attr_triples:
                e = rng.randrange(n_entities)
                a = n % n_attributes  # round-robin => every attr is frequent
                f.write(f"{ents[e]}\t{attrs[a]}\t{make_value(n)}\n")
                n += 1

    write_attr(os.path.join(folder, "attr_triples_1"), ents1, attrs1)
    write_attr(os.path.join(folder, "attr_triples_2"), ents2, attrs2)

    # Entity local names: aligned pairs share (mostly) the same name.
    with open(os.path.join(folder, "entity_local_name_1"), "w", encoding="utf8") as f:
        for i, e in enumerate(ents1):
            f.write(f"{e}\t{_entity_name(i)}\n")
    with open(os.path.join(folder, "entity_local_name_2"), "w", encoding="utf8") as f:
        for i, e in enumerate(ents2):
            name = _entity_name(i)
            if rng.random() < 0.1:  # noise
                name = name + " jr"
            f.write(f"{e}\t{name}\n")

    # Predicate local names: relation and attribute URIs in one file per KG
    # (predicate_alignment.py:138-141 splits them by the relation URI set).
    def write_pred(path: str, rels: List[str], attrs: List[str]):
        with open(path, "w", encoding="utf8") as f:
            for i, r in enumerate(rels):
                f.write(f"{r}\trelation {WORDS[i % len(WORDS)]}\n")
            for i, a in enumerate(attrs):
                f.write(f"{a}\tattribute {WORDS[i % len(WORDS)]}\n")

    write_pred(os.path.join(folder, "predicate_local_name_1"), rels1, attrs1)
    write_pred(os.path.join(folder, "predicate_local_name_2"), rels2, attrs2)

    # Links: identity alignment i <-> i, split 6/1/3 (dataset_division '631/').
    pairs = list(range(n_entities))
    rng.shuffle(pairs)
    n_train = int(link_fracs[0] * n_entities)
    n_valid = int(link_fracs[1] * n_entities)
    splits = {
        "train_links": pairs[:n_train],
        "valid_links": pairs[n_train:n_train + n_valid],
        "test_links": pairs[n_train + n_valid:],
    }
    for name, idxs in splits.items():
        with open(os.path.join(folder, division.strip("/"), name), "w",
                  encoding="utf8") as f:
            for i in idxs:
                f.write(f"{ents1[i]}\t{ents2[i]}\n")

    if write_word2vec:
        vec_path = os.path.join(folder, "mini_word2vec.vec")
        nprng = np.random.RandomState(seed)
        vocab = sorted(set(WORDS) | {"relation", "attribute", "jr"})
        with open(vec_path, "w", encoding="utf8") as f:
            for w in vocab:
                v = nprng.normal(size=300).astype(np.float32)
                f.write(w + " " + " ".join(f"{x:.4f}" for x in v) + "\n")
    if not folder.endswith("/"):
        folder = folder + "/"
    return folder
