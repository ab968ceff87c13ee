"""Shared workload for the multi-process equivalence test: a fixed synthetic
two-KG rel_view + common_space epoch, runnable with any MeshContext (or
none). Kept in its own module so the pytest process and the spawned
jax.distributed workers build bit-identical inputs."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from multike_tpu.config import Config
from multike_tpu.params import init_params
from multike_tpu.train import streams

WORKLOAD = {
    "cfg": Config(dim=8, batch_size=64, entity_batch_size=64,
                  neg_triple_num=4, neg_pool_size=32, seed=11),
    "E": 200,
    "R": 16,
    "n_tri": 400,
}


def _inputs():
    E, n_tri = WORKLOAD["E"], WORKLOAD["n_tri"]
    half = E // 2
    rng = np.random.RandomState(3)

    def synth(lo, hi):
        return np.stack([rng.randint(lo, hi, n_tri),
                         rng.randint(0, WORKLOAD["R"], n_tri),
                         rng.randint(lo, hi, n_tri)], 1).astype(np.int32)

    t1, t2 = synth(0, half), synth(half, E)
    ranges = ((0, half), (half, E))
    name = rng.randn(E, WORKLOAD["cfg"].dim).astype(np.float32)
    literal = rng.randn(32, WORKLOAD["cfg"].dim).astype(np.float32)
    return t1, t2, ranges, name, literal


def run_workload(cfg: Config, pctx):
    """One rel_view epoch + one common_space epoch; returns the two losses."""
    E, R = WORKLOAD["E"], WORKLOAD["R"]
    t1, t2, ranges, name, literal = _inputs()
    params = init_params(cfg, E, R, 2)
    opt_states = streams.init_stream_opt_states(cfg, params, pctx=pctx)
    constants = {"name_embeds": jnp.asarray(name),
                 "literal_embeds": jnp.asarray(literal)}
    if pctx is not None:
        params = pctx.shard_params(params)
        opt_states = pctx.shard_stream_opt_states(opt_states)
        constants = pctx.replicate(constants)
        jt1, n1 = pctx.put_edge_partitioned(t1)
        jt2, n2 = pctx.put_edge_partitioned(t2)
    else:
        jt1, n1 = jnp.asarray(t1), len(t1)
        jt2, n2 = jnp.asarray(t2), len(t2)

    fn, _, _ = streams.build_rel_view_epoch(cfg, n1, n2, ranges,
                                            with_neighbors=False, pctx=pctx)
    key = jax.random.PRNGKey(cfg.seed)
    params, _, key, loss_rel = fn(params, opt_states["rel_view"], key,
                                  jt1, jt2)

    fn2, _, _ = streams.build_common_space_epoch(cfg, E, pctx=pctx)
    ents = np.arange(E, dtype=np.int32)
    params, _, key, loss_cs = fn2(params, opt_states["common_space"], key,
                                  constants, ents)
    return {"rel": float(loss_rel), "cs": float(loss_cs)}
