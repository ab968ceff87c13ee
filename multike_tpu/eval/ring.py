"""Ring-decomposed rank computation (the ring-attention-shaped eval
component, SURVEY.md §2.3 row 7 / §5 long-context row).

For pod-scale evaluation where the right-side embedding matrix is too large
to replicate: shard BOTH sides over the mesh axis. Each device keeps its
resident left rows and a rotating right block; at every ring step it updates

    count_i  += #{ j in resident block : s_ij > gold_i, j != gold_col_i }
    best_i    = running argmax

then passes its right block to the next device with ``jax.lax.ppermute``.
After P steps every row has seen every column; communication per step is the
block (n2/P rows), fully overlapped with the local matmul by XLA's
latency-hiding scheduler — the same pass-blocks-around-the-ring structure as
ring attention, with a running top-1/count instead of softmax accumulation.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def make_ring_rank(mesh: Mesh, axis_name: str = "dp",
                   n2_valid: int | None = None, use_csls: bool = False):
    """Returns ranker(e1, gold, gold_idx, e2[, r2]) -> (count, best_idx).

    e1 (n1, d) and e2 (n2, d) sharded over ``axis_name`` rows (n1, n2 both
    divisible by the axis size); gold/gold_idx (n1,) sharded likewise.
    ``gold`` is the gold score per left row; gold's column id in gold_idx.
    Columns >= ``n2_valid`` (host padding) are masked to -inf.

    ``use_csls``: scores become 2*s_ij - r2_j (the CSLS column penalty; the
    row term r1_i is rank-invariant within a row). ``r2`` (n2,) is sharded
    like e2 and its block rotates around the ring together with the
    embedding block; ``gold`` must already be CSLS-adjusted.
    """
    P_axis = mesh.shape[axis_name]

    def ranker_local(e1, gold, gold_idx, e2_blk, r2_blk):
        # e1: (n1/P, d); e2_blk: (n2/P, d) resident block
        my = jax.lax.axis_index(axis_name)
        n2_blk = e2_blk.shape[0]

        def step(carry, p):
            count, best_val, best_idx, blk, r2b = carry
            # blocks rotate forward (i -> i+1), so at ring step p the
            # resident block originated at device my - p
            owner = jax.lax.rem(my - p + P_axis, P_axis)
            col0 = owner * n2_blk
            s = jnp.dot(e1, blk.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            if use_csls:
                s = 2.0 * s - r2b[None, :]
            cols = col0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            if n2_valid is not None:
                s = jnp.where(cols < n2_valid, s, -jnp.inf)
            beats = jnp.logical_and(s > gold[:, None],
                                    cols != gold_idx[:, None])
            count = count + jnp.sum(beats.astype(jnp.int32), axis=1)
            blk_best = jnp.max(s, axis=1)
            blk_arg = jnp.argmax(s, axis=1).astype(jnp.int32) + col0
            take = blk_best > best_val
            best_val = jnp.where(take, blk_best, best_val)
            best_idx = jnp.where(take, blk_arg, best_idx)
            # rotate: send our block to the next device in the ring
            perm = [(i, (i + 1) % P_axis) for i in range(P_axis)]
            blk = jax.lax.ppermute(blk, axis_name, perm)
            if use_csls:
                r2b = jax.lax.ppermute(r2b, axis_name, perm)
            return (count, best_val, best_idx, blk, r2b), None

        n1_loc = e1.shape[0]
        init = (jnp.zeros((n1_loc,), jnp.int32),
                jnp.full((n1_loc,), -jnp.inf, jnp.float32),
                jnp.zeros((n1_loc,), jnp.int32),
                e2_blk, r2_blk)
        (count, _, best_idx, _, _), _ = jax.lax.scan(
            step, init, jnp.arange(P_axis))
        return count, best_idx

    specs = P(axis_name)
    ranker = shard_map(
        ranker_local, mesh=mesh,
        in_specs=(P(axis_name, None), specs, specs, P(axis_name, None),
                  specs),
        out_specs=(specs, specs),
        check_rep=False,
    )
    return jax.jit(ranker)


def make_ring_topk_means(mesh: Mesh, k: int, axis_name: str = "dp",
                         n_valid: int | None = None):
    """Returns f(a, b) -> (len(a),) mean of each a-row's top-k similarities
    against ALL b rows — the CSLS neighborhood term, ring-decomposed.

    a and b are both row-sharded over ``axis_name``. Each device keeps its
    resident a rows and folds a rotating b block into a running per-row
    top-k buffer (the same rotate-and-accumulate structure as the ranker,
    with a k-merge instead of a count). b rows >= ``n_valid`` (host padding)
    are masked to -inf so they never enter the top-k."""
    P_axis = mesh.shape[axis_name]

    def local(a, b_blk):
        my = jax.lax.axis_index(axis_name)
        nb = b_blk.shape[0]

        def step(carry, p):
            buf, blk = carry
            owner = jax.lax.rem(my - p + P_axis, P_axis)
            col0 = owner * nb
            s = jnp.dot(a, blk.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            if n_valid is not None:
                cols = col0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(cols < n_valid, s, -jnp.inf)
            buf, _ = jax.lax.top_k(jnp.concatenate([buf, s], axis=1), k)
            perm = [(i, (i + 1) % P_axis) for i in range(P_axis)]
            blk = jax.lax.ppermute(blk, axis_name, perm)
            return (buf, blk), None

        init = (jnp.full((a.shape[0], k), -jnp.inf, jnp.float32), b_blk)
        (buf, _), _ = jax.lax.scan(step, init, jnp.arange(P_axis))
        return jnp.mean(buf, axis=1)

    spec = P(axis_name)
    f = shard_map(local, mesh=mesh,
                  in_specs=(P(axis_name, None), P(axis_name, None)),
                  out_specs=spec, check_rep=False)
    return jax.jit(f)


def ring_rank_and_align(mesh: Mesh, e1: np.ndarray, e2: np.ndarray,
                        normalize: bool = True, csls_k: int = 0,
                        axis_name: str = "dp") -> Tuple[np.ndarray, np.ndarray]:
    """Host wrapper: pads both sides to the axis size, runs the ring, strips
    padding. Gold for row i is column i. ``csls_k`` > 0 first computes the
    column penalty r2 with a ring top-k pass, then ranks the CSLS-adjusted
    scores 2*s_ij - r2_j (row term r1_i is rank-invariant)."""
    P_axis = mesh.shape[axis_name]
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    n1, n2 = len(e1), len(e2)
    assert n2 >= n1
    if normalize:
        def nrm(x):
            n = np.linalg.norm(x, axis=1, keepdims=True)
            return np.where(n > 0, x / np.maximum(n, 1e-30), x)

        e1, e2 = nrm(e1), nrm(e2)

    def pad_rows(x, mult, fill=0.0):
        pad = (-len(x)) % mult
        if pad == 0:
            return x
        return np.concatenate([x, np.full((pad,) + x.shape[1:], fill, x.dtype)])

    e1p = pad_rows(e1, P_axis)
    e2p = pad_rows(e2, P_axis)
    gold = np.einsum("ij,ij->i", e1p, e2p[:len(e1p)]).astype(np.float32)
    gold_idx = np.arange(len(e1p), dtype=np.int32)

    if csls_k > 0:
        # r2_j = mean top-csls_k of column j of s == of row j of e2 @ e1.T
        topk_f = make_ring_topk_means(mesh, csls_k, axis_name, n_valid=n1)
        r2 = topk_f(jnp.asarray(e2p), jnp.asarray(e1p))
        gold = 2.0 * gold - np.asarray(r2)[:len(e1p)]
        ranker = make_ring_rank(mesh, axis_name, n2_valid=n2, use_csls=True)
        count, best = ranker(jnp.asarray(e1p), jnp.asarray(gold),
                             jnp.asarray(gold_idx), jnp.asarray(e2p), r2)
    else:
        r2_dummy = jnp.zeros((len(e2p),), jnp.float32)
        ranker = make_ring_rank(mesh, axis_name, n2_valid=n2)
        count, best = ranker(jnp.asarray(e1p), jnp.asarray(gold),
                             jnp.asarray(gold_idx), jnp.asarray(e2p),
                             r2_dummy)
    return np.asarray(count)[:n1], np.asarray(best)[:n1]
