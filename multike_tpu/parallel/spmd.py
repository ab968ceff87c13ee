"""SPMD validation entry points over a ('dp', 'tp') mesh.

``dryrun`` compiles and executes the trainer's REAL per-stream epoch
functions (train/streams.py builders — the exact code ``MultiKETrainer``
drives, with a live ``MeshContext``) on an n-device mesh with tiny shapes:
all 8 loss streams, one epoch each, plus the sharded eval rank oracle check.
``__graft_entry__.dryrun_multichip`` calls this on the driver's virtual
device mesh.

Mesh semantics (parallel/context.py): batches dp-sharded, entity tables
row-sharded over tp (masked gather + psum), optimizer updates exchanged as
(row-id, row-grad) pairs over 'dp' — never a dense-table gradient.
"""
from __future__ import annotations

import functools
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as PSpec

from multike_tpu.config import Config
from multike_tpu.parallel.context import ROW_SHARDED_TABLES, MeshContext
from multike_tpu.params import init_params
from multike_tpu.train import streams


def pad_rows(table: jnp.ndarray, multiple: int) -> jnp.ndarray:
    """Pad a table's row count up to a multiple so it row-shards evenly over
    the 'tp' axis; padded rows are zeros and never referenced by valid ids."""
    n = table.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return table
    return jnp.concatenate(
        [table, jnp.zeros((pad,) + table.shape[1:], table.dtype)])


def make_sharded_rank(mesh):
    """Evaluation sharding: left-entity rows split over the whole mesh, right
    table replicated; each shard counts its rows' beats locally — the
    distributed half of the eval engine (SURVEY.md §2.3 row 3: per-shard
    partial ranks, no cross-device merge needed because rows are
    independent)."""
    rows = NamedSharding(mesh, PSpec(("dp", "tp")))
    rep = NamedSharding(mesh, PSpec())

    @functools.partial(jax.jit, in_shardings=(rows, rep, rows),
                       out_shardings=(rows, rows))
    def ranker(e1, e2, gold_idx):
        s = jnp.einsum("id,jd->ij", e1, e2, precision=jax.lax.Precision.HIGHEST)
        gold = jnp.take_along_axis(s, gold_idx[:, None], axis=1)[:, 0]
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        beats = jnp.logical_and(s > gold[:, None], cols != gold_idx[:, None])
        return jnp.sum(beats.astype(jnp.int32), axis=1), jnp.argmax(s, axis=1)

    return ranker


def dryrun(n_devices: int, dim: int = 8, entities: int = 64,
           relations: int = 8, attributes: int = 5, literals: int = 16) -> Dict:
    """One epoch of each of the 8 training streams on an n-device mesh.

    Tiny shapes; used by the driver's multichip validation (see
    __graft_entry__). Returns per-stream losses (all asserted finite)."""
    tp = 2 if n_devices % 2 == 0 and n_devices >= 4 else 1
    dp = n_devices // tp
    cfg = Config(dim=dim, batch_size=16, entity_batch_size=16,
                 attribute_batch_size=16, neg_triple_num=2,
                 learning_rate=0.05, mesh_dp=dp, mesh_tp=tp)
    pctx = MeshContext.from_config(cfg)   # None when n_devices == 1

    params = init_params(cfg, entities, relations, attributes)
    if pctx is not None:
        if pctx.tp > 1:
            for t in ROW_SHARDED_TABLES:
                params[t] = pctx.pad_table_rows(params[t])
        opt_states = streams.init_stream_opt_states(cfg, params, pctx=pctx)
        params = pctx.shard_params(params)
        opt_states = pctx.shard_stream_opt_states(opt_states)
    else:
        opt_states = streams.init_stream_opt_states(cfg, params)

    rng = np.random.RandomState(0)
    n_tri = 48
    half = entities // 2
    t1 = np.stack([rng.randint(0, half, n_tri),
                   rng.randint(0, relations, n_tri),
                   rng.randint(0, half, n_tri)], 1).astype(np.int32)
    t2 = np.stack([rng.randint(half, entities, n_tri),
                   rng.randint(0, relations, n_tri),
                   rng.randint(half, entities, n_tri)], 1).astype(np.int32)
    attr_t = np.stack([rng.randint(0, entities, n_tri),
                       rng.randint(0, attributes, n_tri),
                       rng.randint(0, literals, n_tri)], 1).astype(np.int32)
    weights = np.abs(rng.randn(n_tri)).astype(np.float32)
    ents = rng.permutation(entities)[:32].astype(np.int32)
    constants = {
        "name_embeds": jnp.asarray(rng.randn(entities, dim), jnp.float32),
        "literal_embeds": jnp.asarray(rng.randn(literals, dim), jnp.float32),
    }
    if pctx is not None:
        constants = pctx.replicate(constants)
    key = jax.random.PRNGKey(0)
    metrics: Dict[str, float] = {}

    def run(stream, fn_steps, *data):
        nonlocal key
        epoch_fn = fn_steps[0]
        new_p, new_o, k2, loss = epoch_fn(params, opt_states[stream], key,
                                          *data)
        params.update(new_p)
        opt_states[stream] = new_o
        key = k2
        metrics[stream] = float(loss)

    jt1, jt2 = jnp.asarray(t1), jnp.asarray(t2)
    ranges = ((0, half), (half, entities))
    run("rel_view", streams.build_rel_view_epoch(
        cfg, n_tri, n_tri, ranges, with_neighbors=False, pctx=pctx), jt1, jt2)
    run("attr_view", streams.build_attr_view_epoch(cfg, n_tri, n_tri, pctx=pctx),
        constants, jnp.asarray(attr_t), jnp.asarray(weights),
        jnp.asarray(attr_t), jnp.asarray(weights))
    run("ckge_rel", streams.build_ckge_rel_epoch(cfg, n_tri, pctx=pctx), jt1)
    run("ckgp_rel", streams.build_ckgp_rel_epoch(cfg, n_tri, pctx=pctx),
        jt1, jnp.asarray(weights))
    run("ckge_attr", streams.build_ckge_attr_epoch(cfg, n_tri, pctx=pctx),
        constants, jnp.asarray(attr_t))
    run("ckga_attr", streams.build_ckga_attr_epoch(cfg, n_tri, pctx=pctx),
        constants, jnp.asarray(attr_t), jnp.asarray(weights))
    run("common_space", streams.build_common_space_epoch(
        cfg, len(ents), pctx=pctx), constants, jnp.asarray(ents))
    run("space_mapping", streams.build_space_mapping_epoch(
        cfg, len(ents), pctx=pctx), constants, jnp.asarray(ents))

    for k, v in metrics.items():
        assert np.isfinite(v), (k, metrics)

    if pctx is None:
        return metrics

    # sharded eval step: ranks computed with rows split across the mesh
    ranker = make_sharded_rank(pctx.mesh)
    batch = 32
    e1 = jnp.asarray(rng.randn(batch, dim), jnp.float32)
    e2 = jnp.concatenate([e1, jnp.asarray(rng.randn(batch, dim), jnp.float32)])
    gold_idx = jnp.arange(batch, dtype=jnp.int32)
    ranks, best = ranker(e1, e2, gold_idx)
    sdense = np.asarray(e1) @ np.asarray(e2).T
    want = np.array([np.sum((sdense[i] > sdense[i, i])
                            & (np.arange(2 * batch) != i))
                     for i in range(batch)])
    assert np.array_equal(np.asarray(ranks), want), "sharded eval mismatch"
    metrics["eval_rows"] = float(len(ranks))
    return metrics
