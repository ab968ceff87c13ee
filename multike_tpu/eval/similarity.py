"""Pairwise similarity API (parity with base/similarity.py:9-100).

``sim`` materializes the n1 x n2 matrix like the reference — it is the
compatibility surface for external callers and for CSLS. The framework's own
evaluation path (eval/alignment.py) never materializes the matrix; it uses a
blockwise rank-count engine.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _normalize_rows(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    return np.where(n > 0, x / np.maximum(n, 1e-30), x)


def sim(embed1, embed2, metric: str = "inner", normalize: bool = False,
        csls_k: int = 0) -> np.ndarray:
    """base/similarity.py:9-52. Metrics: inner, cosine, euclidean, manhattan."""
    embed1 = np.asarray(embed1, np.float32)
    embed2 = np.asarray(embed2, np.float32)
    if normalize:
        embed1 = _normalize_rows(embed1)
        embed2 = _normalize_rows(embed2)
    if metric == "inner" or (metric == "cosine" and normalize):
        mat = np.asarray(jnp.matmul(jnp.asarray(embed1), jnp.asarray(embed2).T))
    elif metric == "euclidean":
        sq1 = np.sum(embed1 ** 2, axis=1)[:, None]
        sq2 = np.sum(embed2 ** 2, axis=1)[None, :]
        d2 = np.maximum(sq1 + sq2 - 2.0 * (embed1 @ embed2.T), 0.0)
        mat = (1.0 - np.sqrt(d2)).astype(np.float32)
    elif metric == "cosine":
        e1 = _normalize_rows(embed1)
        e2 = _normalize_rows(embed2)
        mat = (e1 @ e2.T).astype(np.float32)  # 1 - cosine distance
    elif metric == "manhattan":
        mat = np.zeros((len(embed1), len(embed2)), np.float32)
        for i in range(len(embed1)):
            mat[i] = 1.0 - np.abs(embed1[i][None, :] - embed2).sum(axis=1)
    else:
        # reference parity: base/similarity.py:36-52 serves any remaining
        # metric name through scipy's cdist as 1 - distance (e.g.
        # 'chebyshev', 'cityblock'); scipy raises for truly unknown names
        from scipy.spatial.distance import cdist

        mat = (1.0 - cdist(embed1, embed2, metric=metric)).astype(np.float32)
    if csls_k > 0:
        mat = csls_sim(mat, csls_k)
    return mat


def calculate_nearest_k(sim_mat: np.ndarray, k: int) -> np.ndarray:
    """Row-wise mean of the k largest entries (base/similarity.py:78-81)."""
    sorted_mat = -np.partition(-sim_mat, k + 1, axis=1)
    return np.mean(sorted_mat[:, 0:k], axis=1)


def csls_sim(sim_mat: np.ndarray, k: int) -> np.ndarray:
    """CSLS correction 2*sim - r1 - r2 (base/similarity.py:55-75)."""
    nearest1 = calculate_nearest_k(sim_mat, k)        # per-row mean top-k
    nearest2 = calculate_nearest_k(sim_mat.T, k)      # per-col mean top-k
    out = 2.0 * sim_mat.T - nearest1
    return (out.T - nearest2).astype(np.float32)


def csls_sim_multi_threads(sim_mat: np.ndarray, k: int,
                           nums_threads: int = 1) -> np.ndarray:
    """API parity with base/similarity.py:84-100 (host-pool row top-k means).
    The vectorized computation needs no thread pool; the argument is
    accepted for signature compatibility. NB the reference helper returns
    only the row means — same here."""
    return calculate_nearest_k(sim_mat, k)


def csls_penalties_blockwise(e1: jnp.ndarray, e2: jnp.ndarray, k: int,
                             col_block: int = 8192):
    """(r1, r2): row/col mean-top-k neighborhood terms computed blockwise on
    device without materializing the full matrix — feeds the scalable CSLS
    ranking path in eval/alignment.py."""
    n1, _ = e1.shape
    n2, _ = e2.shape

    def topk_means(a, b):
        # mean of top-k of (a @ b.T) per row of a, scanning b in blocks
        nb = b.shape[0]
        steps = -(-nb // col_block)
        pad = steps * col_block - nb
        bp = jnp.concatenate([b, jnp.zeros((pad, b.shape[1]), b.dtype)])
        valid = jnp.concatenate([jnp.zeros(nb, bool), jnp.ones(pad, bool)])

        def body(carry, xs):
            buf = carry  # (n_a, k) running top-k values
            blk, inval = xs
            s = a @ blk.T
            s = jnp.where(inval[None, :], -jnp.inf, s)
            cat = jnp.concatenate([buf, s], axis=1)
            buf, _ = jax.lax.top_k(cat, k)
            return buf, None

        init = jnp.full((a.shape[0], k), -jnp.inf, a.dtype)
        buf, _ = jax.lax.scan(
            body, init, (bp.reshape(steps, col_block, -1),
                         valid.reshape(steps, col_block)))
        return jnp.mean(buf, axis=1)

    r1 = topk_means(e1, e2)
    r2 = topk_means(e2, e1)
    return r1, r2
