"""Literal encoder: tokens -> word vectors -> autoencoder -> dim-d vectors.

Parity with literal_encoder.py:159-181:
  * extend word2vec with char-level vectors for unlisted words;
  * each literal -> first 5 token vectors, flattened to 1500-d;
  * train the autoencoder ``encoder_epoch`` epochs;
  * encode the literal matrix with the raw encoder.

Reproduced quirk: the autoencoder *trains* on row-normalized inputs
(auto_encoder.py:34-35) but *encodes* the raw, unnormalized token matrix
(literal_encoder.py:180 passes ``literal_vector_list`` directly to
``encoder_multi_batches``, which never normalizes).
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from multike_tpu.config import Config
from multike_tpu.text.autoencoder import AutoEncoder
from multike_tpu.text.word2vec import (generate_unlisted_word2vec,
                                       literal_token_matrix)


class LiteralEncoder:
    def __init__(self, literal_list: List[str], word2vec: Dict[str, np.ndarray],
                 cfg: Config, verbose: bool = False):
        self.cfg = cfg
        self.literal_list = literal_list
        self.word2vec = generate_unlisted_word2vec(word2vec, literal_list,
                                                   seed=cfg.seed)
        raw = literal_token_matrix(literal_list, self.word2vec,
                                   cfg.tokens_max_len, cfg.word2vec_dim)
        input_dim = cfg.tokens_max_len * cfg.word2vec_dim
        self.auto_encoder = AutoEncoder(raw, cfg, input_dim=input_dim,
                                        seed=cfg.seed)
        self.auto_encoder.train(verbose=verbose)
        # NB: encode the *raw* (unnormalized) matrix — see module docstring.
        self.encoded_literal_vector = self.auto_encoder.encode(raw)
