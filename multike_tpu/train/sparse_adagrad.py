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

This module applies the *identical* update touching only the batch rows,
with NO sort (dense Adagrad sees the SUM of per-occurrence row gradients
before squaring, so duplicates must be combined first — the classic way is
sort + segment-sum, but a 60K-id argsort costs ~1 ms on a v5e and dominated
the r2 apply):

  1. scatter-add every occurrence's gradient into a zeroed (E, d) scratch
     table (one memset + O(N*d) scatter traffic);
  2. gather the scratch back at the ORIGINAL (duplicated) ids — every
     occurrence of a row id reads the same per-row total ``gsum``;
  3. compute per-occurrence
         new_acc_row = acc_row + gsum^2
         new_param_row = param_row - lr * gsum *
                         where(new_acc_row > 0, rsqrt(new_acc_row + eps), 0)
     (exactly ``optax.adagrad``'s ``scale_by_rss`` + ``scale(-lr)``) and
     scatter them back with ``set`` — duplicate ids write IDENTICAL values,
     so the racy-looking scatter is deterministic (donated buffers ->
     in-place on TPU).

Out-of-shard ids (tp row-sharding) and sentinels map to an out-of-range row
index; XLA's ``mode="drop"`` scatter discards them.

Total cost: one (E, d) memset + O(N*d) gathers/scatters — no sort, no
full-table read-modify-write passes (the dense-optax path traverses the
whole table ~5x per step; this touches it once, write-only).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

ADAGRAD_EPS = 1e-7            # optax.adagrad default
ADAGRAD_ACC0 = 0.1            # reference initial_accumulator_value


def init_acc(param, a0: float = ADAGRAD_ACC0):
    """Adagrad accumulator pytree matching ``param``'s structure."""
    return jax.tree_util.tree_map(lambda p: jnp.full_like(p, a0), param)


def row_apply(param: jnp.ndarray, acc: jnp.ndarray, ids: jnp.ndarray,
              g_rows: jnp.ndarray, lr: float, eps: float = ADAGRAD_EPS,
              row_offset: int | jnp.ndarray = 0,
              total_rows: int | None = None):
    """One Adagrad step on ``param`` touching only ``ids``' rows (sort-free,
    see module docstring for the scatter-dedup scheme).

    ``g_rows`` (N, d): per-OCCURRENCE gradients of the gathered rows (as
    produced by differentiating w.r.t. ``param[ids]``). Returns the updated
    (param, acc).

    Row-sharded tables (tp mesh axis): ``param``/``acc`` hold the local shard
    of rows [row_offset, row_offset + E_local); ``ids`` stay GLOBAL and
    ``total_rows`` is the global row count. Ids outside the local shard are
    mapped to an out-of-bounds slot and their scatters dropped — every shard
    applies the identical (deduplicated) update to the rows it owns."""
    E = param.shape[0]
    loc = ids - row_offset
    valid = (loc >= 0) & (loc < E)
    loc = jnp.where(valid, loc, E)          # E = dropped by scatter mode
    safe = jnp.clip(loc, 0, E - 1)          # gather clamps anyway; explicit
    # per-row totals without a sort: one scatter-add into a zeroed scratch,
    # one gather back — duplicate occurrences read the same total
    gsum = jnp.zeros_like(param).at[loc].add(g_rows, mode="drop")[safe]
    gsum = jnp.where(valid[:, None], gsum, 0.0)
    new_acc_rows = acc[safe] + jnp.square(gsum)
    upd = jnp.where(new_acc_rows > 0,
                    jax.lax.rsqrt(new_acc_rows + eps), 0.0) * gsum
    # duplicate ids write identical rows, so 'set' scatters are deterministic
    acc = acc.at[loc].set(new_acc_rows, mode="drop")
    param = param.at[loc].set(param[safe] - lr * upd, mode="drop")
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
