"""SPMD training step over a ('dp', 'tp') mesh.

One fused MultiKE training step covering the three compute-heavy loss
families (relation-view TransE with on-device negatives, attribute-view conv
scorer, common-space combination), jitted with NamedShardings:

  * batches sharded over 'dp' (edge partitioning of the triple stream);
  * entity/relation/attribute tables row-sharded over 'tp';
  * per-stream Adagrad updates applied inside the same jit.

XLA inserts the collectives (all-gather for remote-row gathers, psum-style
reductions for cross-dp gradients) over ICI. This is the step
``__graft_entry__.dryrun_multichip`` compiles on an N-device virtual mesh.
"""
from __future__ import annotations

import functools
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as PSpec

from multike_tpu.config import Config
from multike_tpu.losses import (alignment_loss, positive_logistic_from_scores,
                                relation_logistic_loss)
from multike_tpu.params import init_params, lookup_norm
from multike_tpu.parallel.mesh import (batch_sharding, make_mesh, replicated,
                                       shard_params)
from multike_tpu.sampling import sample_negatives
from multike_tpu.train.streams import STREAM_VARS, stream_optimizer
from multike_tpu.views.attr_conv import conv_score


def pad_rows(table: jnp.ndarray, multiple: int) -> jnp.ndarray:
    """Pad a table's row count up to a multiple so it row-shards evenly over
    the 'tp' axis; padded rows are zeros and never referenced by valid ids."""
    n = table.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return table
    return jnp.concatenate(
        [table, jnp.zeros((pad,) + table.shape[1:], table.dtype)])


def make_spmd_train_step(cfg: Config, mesh, entities_num: int):
    """Returns (step_fn, opt_states_init). step_fn signature:
    (params, opt_states, key, constants, rel_pos, attr_pos, attr_w, cs_ents)
    -> (params, opt_states, key, metrics).

    When the mesh has a non-trivial 'tp' axis, relation-view lookups into the
    row-sharded tables go through the shard_map masked-gather + psum
    primitive (parallel/tp_lookup.py) so only O(B*d) bytes cross ICI per
    gather instead of a whole-table all-gather; its autodiff transpose keeps
    gradients sharded."""
    streams_used = ("rel_view", "attr_view", "common_space")
    opts = {s: stream_optimizer(cfg, s) for s in streams_used}
    tp = mesh.shape.get("tp", 1)
    use_tp = tp > 1
    if use_tp:
        from multike_tpu.parallel.tp_lookup import make_tp_lookup

        tp_gather_norm = make_tp_lookup(mesh, "tp", normalize=True,
                                        batch_axis="dp")

    def opt_init(params):
        return {s: opts[s].init({k: params[k] for k in STREAM_VARS[s]})
                for s in streams_used}

    neg_num = cfg.neg_triple_num

    def apply_stream(params, opt_state, stream, loss_fn):
        names = STREAM_VARS[stream]
        subset = {k: params[k] for k in names}

        def wrapped(sub):
            stopped = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
            merged = dict(stopped)
            merged.update(sub)
            return loss_fn(merged)

        loss, grads = jax.value_and_grad(wrapped)(subset)
        updates, opt_state = opts[stream].update(grads, opt_state, subset)
        subset = optax.apply_updates(subset, updates)
        params = dict(params)
        params.update(subset)
        return params, opt_state, loss

    def step(params, opt_states, key, constants, rel_pos, attr_pos, attr_w,
             cs_ents):
        key, k_neg = jax.random.split(key)
        lo = jnp.zeros((rel_pos.shape[0],), jnp.int32)
        hi = jnp.full((rel_pos.shape[0],), entities_num, jnp.int32)
        neg = sample_negatives(k_neg, rel_pos, lo, hi, neg_num)

        def rel_loss(m):
            rv, rl = m["rv_ent"], m["rel"]
            if use_tp and rv.shape[0] % tp == 0 and rl.shape[0] % tp == 0:
                lk = tp_gather_norm
            else:
                lk = lookup_norm
            return relation_logistic_loss(
                lk(rv, rel_pos[:, 0]), lk(rl, rel_pos[:, 1]),
                lk(rv, rel_pos[:, 2]), lk(rv, neg[:, 0]),
                lk(rl, neg[:, 1]), lk(rv, neg[:, 2]))

        def attr_loss(m):
            phs = lookup_norm(m["av_ent"], attr_pos[:, 0])
            pas = m["attr"][attr_pos[:, 1]]
            pvs = constants["literal_embeds"][attr_pos[:, 2]]
            score = conv_score(m["conv_av"], phs, pas, pvs)
            return positive_logistic_from_scores(score, weights=attr_w)

        def cs_loss(m):
            final = lookup_norm(m["ent"], cs_ents)
            names = constants["name_embeds"][cs_ents]
            cr = lookup_norm(m["rv_ent"], cs_ents)
            ca = lookup_norm(m["av_ent"], cs_ents)
            return cfg.cv_weight * (cfg.cv_name_weight
                                    * alignment_loss(final, names)
                                    + alignment_loss(final, cr)
                                    + alignment_loss(final, ca))

        metrics = {}
        params, opt_states["rel_view"], metrics["rel_loss"] = apply_stream(
            params, opt_states["rel_view"], "rel_view", rel_loss)
        params, opt_states["attr_view"], metrics["attr_loss"] = apply_stream(
            params, opt_states["attr_view"], "attr_view", attr_loss)
        params, opt_states["common_space"], metrics["cs_loss"] = apply_stream(
            params, opt_states["common_space"], "common_space", cs_loss)
        return params, opt_states, key, metrics

    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    step_fn = jax.jit(
        step,
        in_shardings=(None, None, rep, None, bsh, bsh, bsh, bsh),
        donate_argnums=(0, 1),
    )
    return step_fn, opt_init


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


def dryrun(n_devices: int, dim: int = 8, entities: int = 64, relations: int = 8,
           attributes: int = 5, literals: int = 16, batch: int = 32) -> Dict:
    """Compile + execute one SPMD step on tiny shapes over an n-device mesh.

    Used by the driver's multichip validation (see __graft_entry__)."""
    tp = 2 if n_devices % 2 == 0 and n_devices >= 4 else 1
    dp = n_devices // tp
    mesh = make_mesh(dp, tp)
    cfg = Config(dim=dim, neg_triple_num=2)
    params = init_params(cfg, entities, relations, attributes)
    params = shard_params(params, mesh)
    step_fn, opt_init = make_spmd_train_step(cfg, mesh, entities)
    opt_states = opt_init(params)

    rng = np.random.RandomState(0)
    rel_pos = jnp.asarray(
        rng.randint(0, [entities, relations, entities], size=(batch, 3)),
        jnp.int32)
    attr_pos = jnp.asarray(
        rng.randint(0, [entities, attributes, literals], size=(batch, 3)),
        jnp.int32)
    attr_w = jnp.ones((batch,), jnp.float32)
    cs_ents = jnp.asarray(rng.randint(0, entities, size=(batch,)), jnp.int32)
    constants = {
        "name_embeds": jnp.asarray(rng.randn(entities, dim), jnp.float32),
        "literal_embeds": jnp.asarray(rng.randn(literals, dim), jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    params, opt_states, key, metrics = step_fn(
        params, opt_states, key, constants, rel_pos, attr_pos, attr_w, cs_ents)
    metrics = {k: float(v) for k, v in metrics.items()}
    for v in metrics.values():
        assert np.isfinite(v), metrics

    # sharded eval step: ranks computed with rows split across the mesh
    ranker = make_sharded_rank(mesh)
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
