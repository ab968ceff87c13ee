"""Word-embedding loading and lookup utilities.

Parity targets:
  * ``read_word2vec``     — utils.py:94-105 (fastText-style .vec text file)
  * ``tokens2vec_*``      — utils.py:175-230
  * char-level fallback   — utils.py:140-172; the reference trains a gensim
    ``Word2Vec`` over character sequences of the unlisted words. gensim is not
    available here, so the equivalent skip-gram-negative-sampling trainer is
    implemented in JAX (multike_tpu.text.char_sgns) and runs on device.
"""
from __future__ import annotations

from typing import Dict, Iterable, List

import numpy as np


def read_word2vec(file_path: str, vector_dimension: int = 300) -> Dict[str, np.ndarray]:
    """Reference semantics (utils.py:94-105). Uses the native C++ parser when
    available — the 1M x 300 text scan is a cold-start hot spot (SURVEY §3.1)
    that costs minutes in pure Python."""
    from multike_tpu.utils.native import read_word2vec_native

    native = read_word2vec_native(file_path, vector_dimension)
    if native is not None:
        return native
    word2vec: Dict[str, np.ndarray] = {}
    with open(file_path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.strip("\n").split(" ")
            if len(parts) != vector_dimension + 1:
                continue  # skips header / malformed rows (utils.py:100-101)
            word2vec[parts[0]] = np.array(list(map(float, parts[1:])),
                                          dtype=np.float32)
    return word2vec


def build_alphabet(word_list: Iterable[str], min_char_frac: float = 0.0001) -> str:
    """Characters covering >= min_char_frac of total char mass, frequency
    ordered (utils.py:143-155)."""
    ch_num: Dict[str, int] = {}
    for word in word_list:
        for ch in word:
            ch_num[ch] = ch_num.get(ch, 0) + 1
    ordered = sorted(ch_num.items(), key=lambda x: x[1], reverse=True)
    ch_sum = sum(n for _, n in ordered)
    if ch_sum == 0:
        return ""
    return "".join(ch for ch, n in ordered if n / ch_sum >= min_char_frac)


def words_from_char_vectors(word_list: Iterable[str],
                            character_vectors: Dict[str, np.ndarray],
                            alphabet: str,
                            vector_dimension: int = 300) -> Dict[str, np.ndarray]:
    """word vector = mean of its in-alphabet char vectors (utils.py:164-172)."""
    alpha = set(alphabet)
    word2vec: Dict[str, np.ndarray] = {}
    for word in word_list:
        vec = np.zeros(vector_dimension, dtype=np.float32)
        for ch in word:
            if ch in alpha and ch in character_vectors:
                vec += character_vectors[ch]
        if len(word) != 0:
            word2vec[word] = vec / len(word)
    return word2vec


def generate_word2vec_by_character_embedding(word_list: List[str],
                                             vector_dimension: int = 300,
                                             seed: int = 0) -> Dict[str, np.ndarray]:
    """Char-level fallback embeddings for OOV words (utils.py:140-172).

    Trains skip-gram-with-negative-sampling character embeddings on device
    (JAX) instead of gensim on host.
    """
    from multike_tpu.text.char_sgns import train_char_sgns

    character_vectors = train_char_sgns(word_list, dim=vector_dimension, seed=seed)
    alphabet = build_alphabet(word_list)
    return words_from_char_vectors(word_list, character_vectors, alphabet,
                                   vector_dimension)


def generate_unlisted_word2vec(word2vec: Dict[str, np.ndarray],
                               literal_list: Iterable[str],
                               seed: int = 0) -> Dict[str, np.ndarray]:
    """Extend word2vec with char-level vectors for unlisted words
    (literal_encoder.py:147-156)."""
    unlisted = []
    for literal in literal_list:
        for word in literal.split(" "):
            if word not in word2vec:
                unlisted.append(word)
    if unlisted:
        word2vec.update(generate_word2vec_by_character_embedding(unlisted, seed=seed))
    return word2vec


def tokens2vec_add(id_tokens_dict: Dict, word2vec: Dict[str, np.ndarray],
                   vector_dimension: int = 300,
                   keep_unlist: bool = False) -> Dict:
    """Sum-of-token-vectors lookup, l2-normalized; entries whose tokens are
    all OOV are dropped unless keep_unlist (utils.py:201-217)."""
    out = {}
    for e_id, name in id_tokens_dict.items():
        vec = np.zeros(vector_dimension, np.float32)
        for word in name.split(" "):
            if word in word2vec:
                vec += word2vec[word]
        if vec.sum() != 0:
            vec = vec / np.linalg.norm(vec)
        elif not keep_unlist:
            continue
        out[e_id] = vec
    return out


def tokens2vec_encoder(id_tokens_dict: Dict, word2vec: Dict[str, np.ndarray],
                       vector_dimension: int = 300, tokens_max_len: int = 5,
                       keep_unlist: bool = False) -> Dict:
    """First-k-token stacked vectors per entry (utils.py:182-198)."""
    out = {}
    for v_id, tokens in id_tokens_dict.items():
        words = tokens.split(" ")
        vectors = np.zeros((tokens_max_len, vector_dimension), np.float32)
        flag = False
        for i in range(min(tokens_max_len, len(words))):
            if words[i] in word2vec:
                vectors[i] = word2vec[words[i]]
                flag = True
        if flag:
            out[v_id] = vectors
    if keep_unlist:
        for v_id in id_tokens_dict:
            if v_id not in out:
                out[v_id] = np.zeros((tokens_max_len, vector_dimension),
                                     np.float32)
    return out


def look_up_word2vec(id_tokens_dict: Dict, word2vec: Dict[str, np.ndarray],
                     tokens2vec_mode: str = "add", keep_unlist: bool = False,
                     vector_dimension: int = 300, tokens_max_len: int = 5):
    """utils.py:175-179."""
    if tokens2vec_mode == "add":
        return tokens2vec_add(id_tokens_dict, word2vec, vector_dimension,
                              keep_unlist)
    return tokens2vec_encoder(id_tokens_dict, word2vec, vector_dimension,
                              tokens_max_len, keep_unlist)


def look_up_char2vec(id_tokens_dict: Dict,
                     character_vectors: Dict[str, np.ndarray],
                     vector_dimension: int = 300) -> Dict:
    """Sum-of-char-vectors lookup, normalized (utils.py:220-230)."""
    out = {}
    for e_id, ln in id_tokens_dict.items():
        vec = np.zeros(vector_dimension, np.float32)
        for ch in ln:
            if ch in character_vectors:
                vec += character_vectors[ch]
        if vec.sum() != 0:
            vec = vec / np.linalg.norm(vec)
        out[e_id] = vec
    return out


def literal_token_matrix(literal_list: List[str], word2vec: Dict[str, np.ndarray],
                         tokens_max_len: int = 5,
                         dim: int = 300) -> np.ndarray:
    """Each literal -> (tokens_max_len, dim) of its first token vectors,
    stacked to (n, tokens_max_len*dim) (literal_encoder.py:168-176)."""
    n = len(literal_list)
    out = np.zeros((n, tokens_max_len, dim), dtype=np.float32)
    for idx, literal in enumerate(literal_list):
        words = literal.split(" ")
        for i in range(min(tokens_max_len, len(words))):
            vec = word2vec.get(words[i])
            if vec is not None:
                out[idx, i] = vec
    return out.reshape(n, tokens_max_len * dim)
