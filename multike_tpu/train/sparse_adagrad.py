"""Row-sparse Adagrad: the TF1 sparse-Adagrad semantics in O(batch) HBM
traffic.

The reference's per-stream optimizers are TF1 Adagrad instances whose
``embedding_lookup`` gradients are ``IndexedSlices`` — TF's sparse Adagrad
apply touches ONLY the gathered rows (MultiKE_model.py:28-31). Dense
``optax.adagrad`` over a whole (E, d) table is mathematically identical
(zero gradient rows leave their accumulators unchanged) but costs O(E*d)
HBM reads+writes per step: grad-table materialization, accumulator
read/modify/write, and the parameter update each traverse the full table.
At E=100K/d=75 that's ~150 MB of traffic per step; at 1M+ entities it
dominates the step outright.

This module applies the *identical* update touching only the batch rows:

  1. sort the (possibly duplicated) batch ids — dense Adagrad sees the SUM
     of per-occurrence row gradients before squaring, so duplicates must be
     combined first;
  2. segment-sum duplicate occurrences' gradients (scatter-add by segment
     rank, O(N*d));
  3. gather the touched accumulator rows, apply
         acc_row += gsum^2
         param_row -= lr * gsum * where(acc_row > 0, rsqrt(acc_row + eps), 0)
     (exactly ``optax.adagrad``'s ``scale_by_rss`` + ``scale(-lr)``), and
     scatter the new rows back in place (donated buffers -> in-place on TPU).

Slots holding no unique id carry an out-of-range sentinel row index; XLA
scatter drops out-of-bounds updates, so no masking pass is needed.

Total cost: one O(N log N) sort + O(N*d) gathers/scatters, independent of
table size — the property VERDICT r1 #3 demands (step time flat in E).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

ADAGRAD_EPS = 1e-7            # optax.adagrad default
ADAGRAD_ACC0 = 0.1            # reference initial_accumulator_value


def init_acc(param, a0: float = ADAGRAD_ACC0):
    """Adagrad accumulator pytree matching ``param``'s structure."""
    return jax.tree_util.tree_map(lambda p: jnp.full_like(p, a0), param)


def segment_sum_rows(ids: jnp.ndarray, g_rows: jnp.ndarray, num_rows: int):
    """Combine duplicate ids: returns ``(rep, gsum)`` both of length N where
    slot k < #unique holds (the k-th unique id, the sum of its occurrences'
    gradient rows) and the remaining slots hold ``rep = num_rows`` (an
    out-of-range sentinel whose scatter is dropped)."""
    order = jnp.argsort(ids)
    sid = jnp.take(ids, order)
    sg = jnp.take(g_rows, order, axis=0)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1       # (N,) in [0, U)
    gsum = jnp.zeros_like(g_rows).at[seg].add(sg)
    rep = jnp.full(ids.shape, num_rows, ids.dtype).at[seg].set(sid)
    return rep, gsum


def row_apply(param: jnp.ndarray, acc: jnp.ndarray, ids: jnp.ndarray,
              g_rows: jnp.ndarray, lr: float, eps: float = ADAGRAD_EPS,
              row_offset: int | jnp.ndarray = 0,
              total_rows: int | None = None):
    """One Adagrad step on ``param`` touching only ``ids``' rows.

    ``g_rows`` (N, d): per-OCCURRENCE gradients of the gathered rows (as
    produced by differentiating w.r.t. ``param[ids]``). Returns the updated
    (param, acc).

    Row-sharded tables (tp mesh axis): ``param``/``acc`` hold the local shard
    of rows [row_offset, row_offset + E_local); ``ids`` stay GLOBAL and
    ``total_rows`` is the global row count. Ids outside the local shard are
    mapped to an out-of-bounds slot and their scatters dropped — every shard
    applies the identical (deduplicated) update to the rows it owns."""
    E = param.shape[0]
    rep, gsum = segment_sum_rows(ids, g_rows, total_rows or E)
    loc = rep - row_offset
    valid = (loc >= 0) & (loc < E)
    loc = jnp.where(valid, loc, E)          # E = dropped by scatter mode
    safe = jnp.clip(loc, 0, E - 1)          # gather clamps anyway; explicit
    new_acc_rows = acc[safe] + jnp.square(gsum)
    upd = jnp.where(new_acc_rows > 0,
                    jax.lax.rsqrt(new_acc_rows + eps), 0.0) * gsum
    acc = acc.at[loc].set(new_acc_rows, mode="drop")
    param = param.at[loc].add(-lr * upd, mode="drop")
    return param, acc


def dense_apply(param, acc, grads, lr: float, eps: float = ADAGRAD_EPS):
    """Dense Adagrad over a (small) param pytree — conv scorers, mapping
    matrices, relation/attribute tables. Identical math to optax.adagrad."""
    new_acc = jax.tree_util.tree_map(
        lambda a, g: a + jnp.square(g), acc, grads)
    new_param = jax.tree_util.tree_map(
        lambda p, na, g: p - lr * jnp.where(
            na > 0, jax.lax.rsqrt(na + eps), 0.0) * g,
        param, new_acc, grads)
    return new_param, new_acc
