"""Parallel execution context: the ('dp', 'tp') mesh wiring for the trainer.

The reference's only parallelism is host multiprocessing (SURVEY.md §2.3);
this module is new TPU-first design. A ``MeshContext`` carries the device
mesh and the sharding rules every training stream uses:

  * 'dp' (data parallel / edge partitioning): each step's batch — positive
    triples, masks, candidate pools, Bloom keep masks — is split over 'dp' on
    its leading axis. Per-step cross-device traffic is ONE all-gather of the
    touched (row-id, row-gradient) pairs, O(batch * d) bytes over ICI,
    independent of table size.
  * 'tp' (table parallel): entity tables + their Adagrad accumulators are
    row-sharded over 'tp' so table memory scales with devices. A batch gather
    becomes masked-local-gather + psum over 'tp' (O(batch * d), see
    parallel/tp_lookup.py for the standalone primitive); the row-sparse
    update applies only to locally-owned rows.

Dense (small) parameters — relation/attribute tables, conv scorers, mapping
matrices — stay replicated; their gradients psum over 'dp'.

Determinism: negative sampling and batch permutations run OUTSIDE the
shard_map core on replicated RNG keys, so a dp=N run draws bit-identical
batches/candidates to dp=1 — the dp-equivalence tests rely on this.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Tables large enough to row-shard over 'tp' (entity-indexed).
ROW_SHARDED_TABLES = ("rv_ent", "av_ent", "ent")


class MeshContext:
    """Holds the mesh and sharding helpers. ``None``-mesh context methods are
    never called (builders check ``pctx is None`` first)."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self.dp = mesh.shape.get("dp", 1)
        self.tp = mesh.shape.get("tp", 1)
        # one jitted replicate-gather per context: jit caches on the
        # function object, so a fresh lambda per to_host call would
        # re-trace the all-gather for every leaf of every checkpoint/eval
        self._gather_to_replicated = jax.jit(
            lambda x: x, out_shardings=NamedSharding(self.mesh, P()))

    # ------------------------------------------------------------------
    @staticmethod
    def from_config(cfg, devices=None) -> Optional["MeshContext"]:
        """Build from cfg.mesh_dp/mesh_tp; None when the mesh is trivial.

        Multi-process (``jax.process_count() > 1``, see
        parallel/distributed.py): ``jax.devices()`` is the global list
        ordered process-major, so the reshaped 'dp' rows line up with
        processes — each host's edge partition trains on its own devices.
        The mesh must then cover every device (JAX requires sharded
        computations to span all processes) and tp is currently
        single-process-only."""
        dp, tp = cfg.mesh_dp, cfg.mesh_tp
        if dp * tp <= 1:
            return None
        devices = devices if devices is not None else jax.devices()
        n = dp * tp
        assert n <= len(devices), \
            f"mesh {dp}x{tp} needs {n} devices, have {len(devices)}"
        if jax.process_count() > 1:
            assert n == len(devices), \
                "multi-process mesh must span all global devices"
            # tp row-sharding across processes: with the process-major
            # (dp, tp) device layout every process's addressable devices
            # cover all tp columns, so each process holds (and passes to
            # make_array_from_process_local_data) the full table — the
            # addressable portion equals the global array. Verified by the
            # dp=4 x tp=2 two-process equivalence test
            # (tests/test_multiprocess.py).
            assert len(devices) % tp == 0 and \
                (len(devices) // jax.process_count()) % tp == 0, \
                "tp must divide each process's device count"
        arr = np.asarray(devices[:n]).reshape(dp, tp)
        return MeshContext(Mesh(arr, ("dp", "tp")))

    # ------------------------------------------------------------------
    def table_spec(self, name: str) -> P:
        if name in ROW_SHARDED_TABLES and self.tp > 1:
            return P("tp", None)
        return P()

    def param_specs(self, params) -> Dict:
        """PartitionSpec pytree matching a params/opt-state dict keyed by
        variable name (nested conv dicts replicate)."""
        def spec_for(name, leaf):
            return jax.tree_util.tree_map(
                lambda _: self.table_spec(name), leaf)

        return {k: spec_for(k, v) for k, v in params.items()}

    def _put(self, leaf, spec: P):
        """device_put that also works when the mesh spans processes (plain
        device_put cannot target non-addressable devices)."""
        sharding = NamedSharding(self.mesh, spec)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(leaf), np.shape(leaf))
        return jax.device_put(leaf, sharding)

    def shard_params(self, params):
        """Place a params-shaped pytree onto the mesh. Row-sharded
        tables must have row counts divisible by tp (pad first)."""
        return {k: jax.tree_util.tree_map(
            lambda l, n=k: self._put(l, self.table_spec(n)), v)
            for k, v in params.items()}

    def shard_stream_opt_states(self, opt_states):
        return {s: self.shard_params(st) for s, st in opt_states.items()}

    def replicate(self, tree):
        return jax.tree_util.tree_map(lambda l: self._put(l, P()), tree)

    def put_replicated(self, arr):
        """One array, replicated over the (possibly multi-process) mesh."""
        return self._put(np.asarray(arr), P())

    def to_host(self, arr) -> np.ndarray:
        """Full host value of a (possibly process-spanning) array.

        Fully-addressable and fully-replicated arrays read directly; a
        sharded process-spanning array (tp row-sharding) is first gathered
        to a replicated layout by a jitted identity (an all-gather over the
        mesh — MUST be called on every process). The driver's host
        touch-points (checkpointing, predicate refresh, eval reads) run
        symmetrically on all processes, satisfying that."""
        if not isinstance(arr, jax.Array):
            return np.asarray(arr)
        if arr.is_fully_addressable:
            return np.asarray(arr)
        if not arr.is_fully_replicated:
            arr = self._gather_to_replicated(arr)
        return np.asarray(arr.addressable_data(0))

    def to_host_tree(self, tree):
        return jax.tree_util.tree_map(self.to_host, tree)

    def put_edge_partitioned(self, triples: np.ndarray):
        """Edge-partition a host triple array over 'dp'. Multi-process: each
        process contributes only its local_data_slice (padded by wraparound
        so blocks are equal); rows are globally identical to the input, so
        gathers by true-index stay exact. Returns (global_array, true_n)."""
        from multike_tpu.parallel import distributed as dist

        n = len(triples)
        if jax.process_count() <= 1:
            # single process: replicated (tiny arrays; GSPMD slices batches)
            return self._put(np.asarray(triples), P()), n
        # rows must tile evenly over the 'dp' DEVICE axis (not just over
        # processes): P('dp') sharding requires rows % dp == 0
        m = np.lcm(self.dp, jax.process_count())
        rows = int(-(-n // m) * m)
        if rows > n:  # wraparound padding: duplicates of leading rows
            triples = np.concatenate([triples, triples[:rows - n]])
        local = np.ascontiguousarray(triples[dist.local_data_slice(rows)])
        return dist.make_global_array(self.mesh, local, rows), n

    # ------------------------------------------------------------------
    def pad_table_rows(self, table: jnp.ndarray) -> jnp.ndarray:
        """Pad rows to a multiple of tp (padded rows are zeros, never
        addressed by valid entity ids)."""
        pad = (-table.shape[0]) % self.tp
        if pad == 0:
            return table
        return jnp.concatenate(
            [table, jnp.zeros((pad,) + table.shape[1:], table.dtype)])

    def round_batch(self, n: int) -> int:
        """Round a batch/chunk count up to a multiple of dp."""
        return int(-(-n // self.dp) * self.dp)


def masked_row_gather(shard: jnp.ndarray, ids: jnp.ndarray,
                      axis_name: str = "tp") -> jnp.ndarray:
    """Inside shard_map: gather global-id rows from a 'tp'-row-sharded table.
    Local masked gather + psum over the axis — O(B*d) ICI bytes (see
    parallel/tp_lookup.py for the measured rationale). ids may be any shape;
    returns ids.shape + (d,)."""
    rows_per_dev = shard.shape[0]
    lo = jax.lax.axis_index(axis_name) * rows_per_dev
    local = ids - lo
    owned = (local >= 0) & (local < rows_per_dev)
    safe = jnp.clip(local, 0, rows_per_dev - 1)
    out = jnp.where(owned[..., None], shard[safe], 0.0)
    return jax.lax.psum(out, axis_name)


# ---------------------------------------------------------------------------
# Mesh-mode training primitives (used by train/streams._make_stream_update)
# ---------------------------------------------------------------------------

def _dp_pad(pctx: MeshContext, ids: jnp.ndarray, g: jnp.ndarray | None = None):
    """Pad a fused id vector (and optionally its row grads) to a multiple of
    dp so shard_map can split it evenly. Pad ids are 0 with zero gradients —
    an exactly neutral Adagrad contribution (gsum += 0)."""
    n = ids.shape[0]
    pad = (-n) % pctx.dp
    if pad:
        ids = jnp.pad(ids, (0, pad))
        if g is not None:
            g = jnp.pad(g, ((0, pad), (0, 0)))
    return ids, g


def shard_dp(pctx: Optional[MeshContext], x: jnp.ndarray) -> jnp.ndarray:
    """Constrain an array to be sharded over 'dp' on its leading axis (GSPMD
    handles uneven sizes). No-op without a mesh."""
    if pctx is None:
        return x
    from jax.sharding import NamedSharding

    spec = P("dp", *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(pctx.mesh, spec))


def gather_rows(pctx: Optional[MeshContext], name: str, table: jnp.ndarray,
                ids: jnp.ndarray) -> jnp.ndarray:
    """Raw row gather honoring the table's mesh placement.

    Replicated table (or no mesh): a plain local gather (dp-sharded ids =>
    dp-sharded rows, zero comm). 'tp'-row-sharded table: shard_map masked
    gather + psum over 'tp' — O(B*d) ICI bytes instead of the O(E*d)
    whole-table all-gather XLA would emit for a plain gather."""
    if pctx is None or not (name in ROW_SHARDED_TABLES and pctx.tp > 1):
        return table[ids]
    from jax.experimental.shard_map import shard_map

    n = ids.shape[0]
    ids_p, _ = _dp_pad(pctx, ids)

    def inner(shard, ids_loc):
        return masked_row_gather(shard, ids_loc, "tp")

    rows = shard_map(
        inner, mesh=pctx.mesh,
        in_specs=(P("tp", None), P("dp")),
        out_specs=P("dp", None),
        check_rep=False,
    )(table, ids_p)
    return rows[:n]


def row_apply_sharded(pctx: MeshContext, name: str, param, acc, ids, g_rows,
                      lr: float):
    """Mesh-mode row-sparse Adagrad apply.

    The ONLY cross-device traffic of the whole optimizer step: one all-gather
    of the (row-id, row-gradient) pairs over 'dp' (O(batch * d) bytes on
    ICI). Every device then applies the identical deduplicated update to the
    table rows it owns — dp replicas stay bit-identical, tp shards update
    disjoint row ranges. No dense-table gradient ever exists."""
    from jax.experimental.shard_map import shard_map
    from multike_tpu.train import sparse_adagrad

    ids_p, g_p = _dp_pad(pctx, ids, g_rows)
    tp_sharded = name in ROW_SHARDED_TABLES and pctx.tp > 1
    tspec = P("tp", None) if tp_sharded else P()
    total = param.shape[0]

    def inner(p_shard, a_shard, ids_loc, g_loc):
        all_ids = jax.lax.all_gather(ids_loc, "dp", axis=0, tiled=True)
        all_g = jax.lax.all_gather(g_loc, "dp", axis=0, tiled=True)
        offset = (jax.lax.axis_index("tp") * p_shard.shape[0]
                  if tp_sharded else 0)
        return sparse_adagrad.row_apply(
            p_shard, a_shard, all_ids, all_g, lr,
            row_offset=offset, total_rows=total)

    return shard_map(
        inner, mesh=pctx.mesh,
        in_specs=(tspec, tspec, P("dp"), P("dp")),
        out_specs=(tspec, tspec),
        check_rep=False,
    )(param, acc, ids_p, g_p)
