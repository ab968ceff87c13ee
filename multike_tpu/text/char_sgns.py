"""Skip-gram with negative sampling over character sequences, in JAX.

Replaces the reference's ``gensim.models.Word2Vec(char_sequences, size=300,
window=5, min_count=1)`` call (utils.py:157-162). The exact vectors of the
reference are seed-dependent and not a parity target; what matters is that
characters appearing in similar contexts get similar embeddings so OOV words
receive a usable fallback vector. The trainer is a single jitted
``lax.scan`` over minibatches of (center, context) pairs — embedding gathers,
a dot-product logistic loss with k sampled negatives, and sparse-equivalent
adagrad-free SGD updates via ``segment_sum`` scatter-adds.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp


def _build_pairs(word_list: List[str], window: int):
    """(center, context) char-id pairs, gensim-style dynamic window kept
    simple: full window (no random shrink)."""
    vocab: Dict[str, int] = {}
    for w in word_list:
        for ch in w:
            if ch not in vocab:
                vocab[ch] = len(vocab)
    centers, contexts = [], []
    for w in word_list:
        ids = [vocab[c] for c in w]
        for i, c in enumerate(ids):
            lo = max(0, i - window)
            hi = min(len(ids), i + window + 1)
            for j in range(lo, hi):
                if j != i:
                    centers.append(c)
                    contexts.append(ids[j])
    return vocab, np.asarray(centers, np.int32), np.asarray(contexts, np.int32)


def train_char_sgns(word_list: List[str], dim: int = 300, window: int = 5,
                    negatives: int = 5, epochs: int = 100, batch: int = 4096,
                    lr: float = 0.25, seed: int = 0) -> Dict[str, np.ndarray]:
    vocab, centers, contexts = _build_pairs(word_list, window)
    v = len(vocab)
    if v == 0:
        return {}
    n_pairs = len(centers)
    if n_pairs == 0:
        # single-char words only: random but deterministic vectors
        rng = np.random.RandomState(seed)
        return {ch: rng.uniform(-0.5 / dim, 0.5 / dim, size=dim).astype(np.float32)
                for ch in vocab}

    rng = jax.random.PRNGKey(seed)
    k_in, k_shuf = jax.random.split(rng)
    # gensim init: input vectors uniform(-0.5/dim, 0.5/dim), output zeros
    w_in = jax.random.uniform(k_in, (v, dim), jnp.float32,
                              -0.5 / dim, 0.5 / dim)
    w_out = jnp.zeros((v, dim), jnp.float32)

    # pad pairs to a multiple of batch with weight 0
    steps = -(-n_pairs // batch)
    pad = steps * batch - n_pairs
    cen = jnp.asarray(np.concatenate([centers, np.zeros(pad, np.int32)]))
    ctx = jnp.asarray(np.concatenate([contexts, np.zeros(pad, np.int32)]))
    wgt = jnp.asarray(np.concatenate([np.ones(n_pairs, np.float32),
                                      np.zeros(pad, np.float32)]))

    def step(carry, xs):
        w_in, w_out, key = carry
        c_ids, o_ids, w = xs
        key, k_neg = jax.random.split(key)
        neg = jax.random.randint(k_neg, (batch, negatives), 0, v)

        c_vec = w_in[c_ids]                      # (B, d)
        o_vec = w_out[o_ids]                     # (B, d)
        n_vec = w_out[neg]                       # (B, k, d)

        pos_logit = jnp.sum(c_vec * o_vec, axis=1)
        neg_logit = jnp.einsum("bd,bkd->bk", c_vec, n_vec)
        g_pos = (jax.nn.sigmoid(pos_logit) - 1.0) * w        # (B,)
        g_neg = jax.nn.sigmoid(neg_logit) * w[:, None]       # (B, k)

        d_c = g_pos[:, None] * o_vec + jnp.einsum("bk,bkd->bd", g_neg, n_vec)
        d_o = g_pos[:, None] * c_vec
        d_n = g_neg[:, :, None] * c_vec[:, None, :]

        # Batched equivalent of gensim's per-sample SGD: with a tiny alphabet
        # the same row receives many colliding scatter-adds per batch, so the
        # update is averaged over the batch to stay stable.
        scale = lr / batch
        w_in = w_in.at[c_ids].add(-scale * d_c)
        w_out = w_out.at[o_ids].add(-scale * d_o)
        w_out = w_out.at[neg.reshape(-1)].add(
            -scale * d_n.reshape(batch * negatives, dim))
        return (w_in, w_out, key), None

    @jax.jit
    def epoch(w_in, w_out, key, perm):
        xs = (cen[perm].reshape(steps, batch),
              ctx[perm].reshape(steps, batch),
              wgt[perm].reshape(steps, batch))
        (w_in, w_out, key), _ = jax.lax.scan(step, (w_in, w_out, key), xs)
        return w_in, w_out, key

    key = k_shuf
    total = steps * batch
    for _ in range(epochs):
        key, k_p = jax.random.split(key)
        perm = jax.random.permutation(k_p, total)
        w_in, w_out, key = epoch(w_in, w_out, key, perm)

    mat = np.asarray(w_in)
    return {ch: mat[i] for ch, i in vocab.items()}
