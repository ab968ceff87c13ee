"""DataModel: the top-level data facade (parity with data_model.py:66-159).

Pipeline: read KGs (sequential ids, swapping sup triples) -> entity local
names -> literal list (cleaned attribute values + local names) -> literal
encoder (cached to ``literal_vectors.npy`` + ``literals.txt`` keyed on
``retrain_literal_embeds``) -> per-entity name matrix -> attribute values
re-indexed to literal ids + value matrix.
"""
from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from multike_tpu.config import Config
from multike_tpu.data.cleaning import clear_attribute_triples
from multike_tpu.data.kg import KGs, generate_sup_attribute_triples, read_kgs_from_folder
from multike_tpu.data.readers import read_local_names
from multike_tpu.text.word2vec import read_word2vec

LITERAL_EMBEDDINGS_FILE = "literal_vectors.npy"
LITERAL_FILE = "literals.txt"


def _row_normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return np.where(norms > 0, mat / np.maximum(norms, 1e-30), mat)


def save_literal_vectors(folder: str, literal_list: List[str], vectors: np.ndarray):
    np.save(os.path.join(folder, LITERAL_EMBEDDINGS_FILE), vectors)
    assert len(literal_list) == len(vectors)
    with open(os.path.join(folder, LITERAL_FILE), "w", encoding="utf-8") as f:
        for lit in literal_list:
            f.write(lit + "\n")


def load_literal_vectors(folder: str):
    mat = np.load(os.path.join(folder, LITERAL_EMBEDDINGS_FILE))
    literal_list = []
    with open(os.path.join(folder, LITERAL_FILE), "r", encoding="utf-8") as f:
        for line in f:
            literal_list.append(line.strip("\n"))
    return literal_list, np.asarray(mat)


class DataModel:
    def __init__(self, cfg: Config, word2vec: Dict[str, np.ndarray] | None = None,
                 verbose: bool = False):
        """``word2vec`` can be injected (tests); otherwise read from
        ``cfg.word2vec_path`` (utils.py:94-105)."""
        self.cfg = cfg
        self.verbose = verbose
        self.kgs: KGs = read_kgs_from_folder(cfg.training_data,
                                             cfg.dataset_division,
                                             cfg.alignment_module, False)
        self.entities = self.kgs.kg1.entities_set | self.kgs.kg2.entities_set
        self.entity_local_name_dict = read_local_names(
            cfg.training_data,
            set(self.kgs.kg1.entities_id_dict.keys()),
            set(self.kgs.kg2.entities_id_dict.keys()))
        self._word2vec_injected = word2vec
        self._generate_literal_vectors()
        self._generate_name_vectors_mat()
        self._generate_attribute_value_vectors()

    # ------------------------------------------------------------------
    def _generate_literal_vectors(self):
        cache = os.path.join(self.cfg.training_data, LITERAL_EMBEDDINGS_FILE)
        if not self.cfg.retrain_literal_embeds and os.path.exists(cache):
            self.literal_list, self.literal_vectors_mat = load_literal_vectors(
                self.cfg.training_data)
        else:
            cleaned1, _, _ = clear_attribute_triples(
                self.kgs.kg1.local_attribute_triples_list)
            cleaned2, _, _ = clear_attribute_triples(
                self.kgs.kg2.local_attribute_triples_list)
            value_list = [v for (_, _, v) in cleaned1 + cleaned2]
            local_name_list = list(self.entity_local_name_dict.values())
            self.literal_list = sorted(set(value_list + local_name_list))
            word2vec = self._word2vec_injected
            if word2vec is None:
                word2vec = read_word2vec(self.cfg.word2vec_path,
                                         self.cfg.word2vec_dim)
            from multike_tpu.text.literal_encoder import LiteralEncoder

            enc = LiteralEncoder(self.literal_list, word2vec, self.cfg,
                                 verbose=self.verbose)
            self.literal_vectors_mat = enc.encoded_literal_vector
            save_literal_vectors(self.cfg.training_data, self.literal_list,
                                 self.literal_vectors_mat)
        assert self.literal_vectors_mat.shape[0] == len(self.literal_list)
        self.literal_id_dic = {lit: i for i, lit in enumerate(self.literal_list)}
        assert len(self.literal_id_dic) == len(self.literal_list)

    # ------------------------------------------------------------------
    def _generate_name_vectors_mat(self):
        """Entity-id-ordered name matrix (data_model.py:97-118)."""
        num = len(self.entities)
        id_to_uri = {v: k for k, v in self.kgs.kg1.entities_id_dict.items()}
        id_to_uri.update({v: k for k, v in self.kgs.kg2.entities_id_dict.items()})
        assert len(id_to_uri) == num
        name_ordered = []
        for i in range(num):
            uri = id_to_uri[i]
            name = self.entity_local_name_dict[uri]
            idx = self.literal_id_dic.get(name)
            assert idx is not None, f"local name {name!r} missing from literals"
            name_ordered.append(idx)
        mat = np.asarray(self.literal_vectors_mat)[name_ordered, :].astype(np.float32)
        if self.cfg.literal_normalize:
            mat = _row_normalize(mat)
        self.local_name_vectors = mat

    # ------------------------------------------------------------------
    def _generate_attribute_value_vectors(self):
        """Re-index attribute-triple values to value ids, rebuild KG attribute
        sets + swapped sup attribute triples, build the value matrix
        (data_model.py:120-159)."""
        literal_set = set(self.literal_list)
        cleaned1, _, _ = clear_attribute_triples(
            self.kgs.kg1.local_attribute_triples_list)
        cleaned2, _, _ = clear_attribute_triples(
            self.kgs.kg2.local_attribute_triples_list)
        values_set = set()
        keep1, keep2 = set(), set()
        for h, a, v in cleaned1:
            if v in literal_set:
                values_set.add(v)
                keep1.add((h, a, v))
        for h, a, v in cleaned2:
            if v in literal_set:
                values_set.add(v)
                keep2.add((h, a, v))
        values_list = sorted(values_set)
        values_id_dic = {v: i for i, v in enumerate(values_list)}
        id_triples1 = {(h, a, values_id_dic[v]) for (h, a, v) in keep1}
        id_triples2 = {(h, a, values_id_dic[v]) for (h, a, v) in keep2}
        self.kgs.kg1.set_attributes(id_triples1)
        self.kgs.kg2.set_attributes(id_triples2)
        sup1, sup2 = generate_sup_attribute_triples(
            self.kgs.train_links, self.kgs.kg1.av_dict, self.kgs.kg2.av_dict)
        self.kgs.kg1.add_sup_attribute_triples(sup1)
        self.kgs.kg2.add_sup_attribute_triples(sup2)

        value_ordered = [self.literal_id_dic[v] for v in values_list]
        mat = np.asarray(self.literal_vectors_mat)[value_ordered, :].astype(np.float32)
        if self.cfg.literal_normalize:
            mat = _row_normalize(mat)
        self.value_vectors = mat
        self.values_id_dic = values_id_dic
