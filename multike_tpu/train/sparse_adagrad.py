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

This module applies the *identical* update touching only the batch rows
(dense Adagrad sees the SUM of per-occurrence row gradients before squaring,
so duplicates must be combined first):

  1. sort the (possibly duplicated) batch ids and segment-sum duplicate
     occurrences' gradients;
  2. gather the touched accumulator rows, apply
         acc_row += gsum^2
         param_row -= lr * gsum * where(acc_row > 0, rsqrt(acc_row + eps), 0)
     (exactly ``optax.adagrad``'s ``scale_by_rss`` + ``scale(-lr)``), and
     scatter the new rows back in place (donated buffers -> in-place on TPU).

Slots holding no unique id carry an out-of-range sentinel row index; XLA
scatter drops out-of-bounds updates, so no masking pass is needed.

PERFORMANCE (measured v5e, benchmarks/apply_bench.py): XLA:TPU *scatters*
serialize per updated row (~30 ns/row, flat in row width d) while gathers
are parallel — so apply cost is set by how many rows are scattered. Every
scatter/gather here is flagged ``indices_are_sorted`` (+ ``unique_indices``
where true): the flagged sorted form measures 1.30 ms at 20K ids / 2.42 ms
at 60K ids over a (200K, 75) table vs 2.1 ms for a full dense-optax table
update and 3.7-4.7 ms for a sort-free scatter-dedup variant (nonmonotonic,
pathological — r3 tried and reverted it). The structural lever above this
function is scattering FEWER rows: Config.truncated_neg_scheme.
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
              total_rows: int | None = None,
              use_pallas: bool = False):
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
    total = total_rows or E
    order = jnp.argsort(ids)
    sid = jnp.take(ids, order)
    sg = jnp.take(g_rows, order, axis=0)
    is_start = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1       # (N,) in [0, U)
    gsum = jnp.zeros_like(g_rows).at[seg].add(sg, indices_are_sorted=True)
    # sentinel base total+arange keeps rep sorted AND globally unique (the
    # unique_indices promise below must hold for the dropped slots too)
    rep = (total + jnp.arange(ids.shape[0], dtype=ids.dtype)).at[seg].set(
        sid, indices_are_sorted=True)
    loc = rep - row_offset
    valid = (loc >= 0) & (loc < E)
    # Invalid slots (sentinels + out-of-shard ids) map to DISTINCT >=E
    # indices so the unique_indices promise below holds unconditionally;
    # scatter mode="drop" discards them. Sortedness only survives when
    # row_offset is statically 0 (below-shard ids land at the FRONT of the
    # sorted order but get remapped to large E+i values, breaking
    # monotonicity for nonzero offsets) — claim it only then.
    loc = jnp.where(valid, loc,
                    E + jnp.arange(ids.shape[0], dtype=ids.dtype))
    is_sorted = isinstance(row_offset, int) and row_offset == 0
    if use_pallas:
        # fused one-pass kernel (kernels/apply_kernel.py) — identical math,
        # gated by Config.use_pallas_apply (dormant on the axon tunnel);
        # non-TPU backends run it interpreted so the path stays testable
        from multike_tpu.kernels.apply_kernel import fused_row_adagrad_pallas

        return fused_row_adagrad_pallas(
            param, acc, loc, gsum, lr, eps,
            interpret=jax.default_backend() != "tpu")
    safe = jnp.clip(loc, 0, E - 1)          # gather clamps anyway; explicit
    new_acc_rows = (acc.at[safe].get(indices_are_sorted=is_sorted)
                    + jnp.square(gsum))
    upd = jnp.where(new_acc_rows > 0,
                    jax.lax.rsqrt(new_acc_rows + eps), 0.0) * gsum
    acc = acc.at[loc].set(new_acc_rows, mode="drop",
                          indices_are_sorted=is_sorted, unique_indices=True)
    param = param.at[loc].add(-lr * upd, mode="drop",
                              indices_are_sorted=is_sorted,
                              unique_indices=True)
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
