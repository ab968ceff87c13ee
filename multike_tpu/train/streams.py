"""Per-loss training streams as whole-epoch jitted ``lax.scan``s.

The reference trains 8 independent loss streams, each with its own TF1 graph,
feed_dict loop and its own Adagrad accumulator (MultiKE_model.py:28-31 and
291-473; one ``generate_optimizer`` per loss). Here every stream becomes ONE
jitted function that runs a whole epoch on device: shuffle -> static-shape
batch slices (tail masked) -> on-device negative sampling -> loss -> Adagrad
update, scanned over steps. Host<->device traffic per epoch is a handful of
scalars, vs. the reference's per-step feed_dict crossing.

Per-stream optimizer semantics: TF's sparse Adagrad update from
``embedding_lookup`` gradients only touches the gathered rows; dense Adagrad
with zero gradients elsewhere leaves those accumulators unchanged, so the two
are equivalent. Each stream owns an ``optax.adagrad(initial_accumulator=0.1)``
state over exactly the variables that stream trains:

  stream          vars (MultiKE_model.py cite)
  rel_view        rv_ent, rel                (114-132)
  ckge_rel        rv_ent, rel                (158-170)
  ckgp_rel        rv_ent, rel                (187-201)
  attr_view       av_ent, attr, conv_av      (134-151)
  ckge_attr       av_ent, attr, conv_ckge    (172-185)
  ckga_attr       av_ent, attr, conv_ckga    (203-221)
  common_space    ent, rv_ent, av_ent        (225-239; no var_list => grads
                                              flow to every touched trainable)
  space_mapping   ent, nv/rv/av_mapping      (241-261; var_list='shared*')
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multike_tpu.config import Config
from multike_tpu.losses import (alignment_loss, positive_logistic_from_scores,
                                relation_logistic_loss,
                                relation_logistic_loss_wo_negs,
                                space_mapping_loss)
from multike_tpu.params import lookup_norm
from multike_tpu.sampling import sample_negatives
from multike_tpu.views.attr_conv import conv_score

STREAM_VARS: Dict[str, Tuple[str, ...]] = {
    "rel_view": ("rv_ent", "rel"),
    "ckge_rel": ("rv_ent", "rel"),
    "ckgp_rel": ("rv_ent", "rel"),
    "attr_view": ("av_ent", "attr", "conv_av"),
    "ckge_attr": ("av_ent", "attr", "conv_ckge"),
    "ckga_attr": ("av_ent", "attr", "conv_ckga"),
    "common_space": ("ent", "rv_ent", "av_ent"),
    "space_mapping": ("ent", "nv_mapping", "rv_mapping", "av_mapping"),
}


def stream_optimizer(cfg: Config, stream: str) -> optax.GradientTransformation:
    lr = cfg.ITC_learning_rate if stream == "common_space" else cfg.learning_rate
    if cfg.optimizer == "Adagrad":
        return optax.adagrad(lr, initial_accumulator_value=0.1)
    if cfg.optimizer == "Adam":
        return optax.adam(lr)
    if cfg.optimizer == "Adadelta":
        return optax.adadelta(lr)
    return optax.sgd(lr)


def init_stream_opt_states(cfg: Config, params) -> Dict[str, optax.OptState]:
    states = {}
    for stream, names in STREAM_VARS.items():
        sub = {k: params[k] for k in names}
        states[stream] = stream_optimizer(cfg, stream).init(sub)
    return states


def _merged(params, subset):
    """Full param view where only ``subset`` entries carry gradients."""
    stopped = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
    out = dict(stopped)
    out.update(subset)
    return out


def _make_update(cfg: Config, stream: str, loss_of_merged):
    """Build (params, opt_state, batch...) -> (params, opt_state, loss)."""
    opt = stream_optimizer(cfg, stream)
    names = STREAM_VARS[stream]

    def update(params, opt_state, *batch):
        subset = {k: params[k] for k in names}

        def loss_fn(sub):
            return loss_of_merged(_merged(params, sub), *batch)

        loss, grads = jax.value_and_grad(loss_fn)(subset)
        updates, opt_state = opt.update(grads, opt_state, subset)
        subset = optax.apply_updates(subset, updates)
        params = dict(params)
        params.update(subset)
        return params, opt_state, loss

    return update


# ---------------------------------------------------------------------------
# Batch plumbing helpers
# ---------------------------------------------------------------------------

def _mixed_epoch_indices(key, n1: int, n2: int, bs1: int, bs2: int, steps: int):
    """Shuffled wraparound index matrices + tail masks for the proportional
    two-KG batch mix (base/batch.py:33-54). Masks reproduce the reference's
    short tail batches: global position >= n contributes 0."""
    k1, k2 = jax.random.split(key)
    perm1 = jax.random.permutation(k1, n1)
    perm2 = jax.random.permutation(k2, n2)
    pos1 = jnp.arange(steps * bs1)
    pos2 = jnp.arange(steps * bs2)
    idx1 = perm1[pos1 % n1].reshape(steps, bs1)
    idx2 = perm2[pos2 % n2].reshape(steps, bs2)
    m1 = (pos1 < n1).astype(jnp.float32).reshape(steps, bs1)
    m2 = (pos2 < n2).astype(jnp.float32).reshape(steps, bs2)
    return idx1, idx2, m1, m2


def proportional_sizes(n1: int, n2: int, batch_size: int) -> Tuple[int, int]:
    bs1 = int(n1 / (n1 + n2) * batch_size)
    return bs1, batch_size - bs1


# ---------------------------------------------------------------------------
# Stream epoch builders. Each returns a jitted function closed over static
# shapes; the Trainer caches them per dataset.
# ---------------------------------------------------------------------------

def build_rel_view_epoch(cfg: Config, n1: int, n2: int,
                         ranges: Tuple[Tuple[int, int], Tuple[int, int]],
                         with_neighbors: bool = True, tfilter=None):
    """``with_neighbors=False`` compiles the pre-refresh variant whose
    sampling skips the neighbor-table gathers entirely (leaner executable;
    also avoids a degenerate-empty-table XLA pathology). ``tfilter`` (a
    sampling.TripleFilter) enables exact-rejection negative sampling with
    ``cfg.neg_rejection_tries`` resample rounds."""
    steps = int(np.ceil((n1 + n2) / cfg.batch_size))
    bs1, bs2 = proportional_sizes(n1, n2, cfg.batch_size)
    (lo1, hi1), (lo2, hi2) = ranges
    neg_num = cfg.neg_triple_num
    lo_vec = jnp.concatenate([jnp.full((bs1,), lo1, jnp.int32),
                              jnp.full((bs2,), lo2, jnp.int32)])
    hi_vec = jnp.concatenate([jnp.full((bs1,), hi1, jnp.int32),
                              jnp.full((bs2,), hi2, jnp.int32)])

    def loss_of(merged, pos, pos_mask, neg, neg_mask):
        phs = lookup_norm(merged["rv_ent"], pos[:, 0])
        prs = lookup_norm(merged["rel"], pos[:, 1])
        pts = lookup_norm(merged["rv_ent"], pos[:, 2])
        nhs = lookup_norm(merged["rv_ent"], neg[:, 0])
        nrs = lookup_norm(merged["rel"], neg[:, 1])
        nts = lookup_norm(merged["rv_ent"], neg[:, 2])
        return relation_logistic_loss(phs, prs, pts, nhs, nrs, nts,
                                      pos_mask, neg_mask)

    update = _make_update(cfg, "rel_view", loss_of)

    def epoch_impl(params, opt_state, key, triples1, triples2, nbr):
        key, k_idx = jax.random.split(key)
        idx1, idx2, m1, m2 = _mixed_epoch_indices(k_idx, n1, n2, bs1, bs2, steps)
        step_keys = jax.random.split(key, steps + 1)
        key, step_keys = step_keys[0], step_keys[1:]

        def body(carry, xs):
            params, opt_state = carry
            i1, i2, mm1, mm2, sk = xs
            pos = jnp.concatenate([triples1[i1], triples2[i2]])
            pos_mask = jnp.concatenate([mm1, mm2])
            neg = sample_negatives(sk, pos, lo_vec, hi_vec, neg_num, nbr,
                                   tfilter=tfilter,
                                   retries=cfg.neg_rejection_tries)
            neg_mask = jnp.repeat(pos_mask, neg_num)
            params, opt_state, loss = update(params, opt_state,
                                             pos, pos_mask, neg, neg_mask)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (idx1, idx2, m1, m2, step_keys))
        return params, opt_state, key, jnp.sum(losses)

    if with_neighbors:
        epoch = jax.jit(epoch_impl, donate_argnums=(0, 1))
    else:
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def epoch(params, opt_state, key, triples1, triples2):
            return epoch_impl(params, opt_state, key, triples1, triples2, None)

    trained_per_epoch = min(n1, steps * bs1) + min(n2, steps * bs2)
    return epoch, steps, trained_per_epoch


def build_attr_view_epoch(cfg: Config, n1: int, n2: int):
    """Attribute view: weighted positives only (neg_triples_num=0,
    MultiKE_model.py:324-331). Steps counted with ``batch_size`` but slices
    sized with ``attribute_batch_size`` — a reference quirk
    (MultiKE_Late.py:206 vs MultiKE_model.py:330)."""
    steps = int(np.ceil((n1 + n2) / cfg.batch_size))
    bs1, bs2 = proportional_sizes(n1, n2, cfg.attribute_batch_size)

    def loss_of(merged, constants, trip, w, mask):
        phs = lookup_norm(merged["av_ent"], trip[:, 0])
        pas = merged["attr"][trip[:, 1]]          # unnormalized (important!)
        pvs = constants["literal_embeds"][trip[:, 2]]
        score = conv_score(merged["conv_av"], phs, pas, pvs, mask=mask)
        return positive_logistic_from_scores(score, weights=w, mask=mask)

    update = _make_update(cfg, "attr_view", loss_of)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def epoch(params, opt_state, key, constants, trips1, w1, trips2, w2):
        key, k_idx = jax.random.split(key)
        idx1, idx2, m1, m2 = _mixed_epoch_indices(k_idx, n1, n2, bs1, bs2, steps)

        def body(carry, xs):
            params, opt_state = carry
            i1, i2, mm1, mm2 = xs
            trip = jnp.concatenate([trips1[i1], trips2[i2]])
            w = jnp.concatenate([w1[i1], w2[i2]])
            mask = jnp.concatenate([mm1, mm2])
            params, opt_state, loss = update(params, opt_state,
                                             constants, trip, w, mask)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (idx1, idx2, m1, m2))
        return params, opt_state, key, jnp.sum(losses)

    trained_per_epoch = min(n1, steps * bs1) + min(n2, steps * bs2)
    return epoch, steps, trained_per_epoch


def _sampled_epoch(cfg: Config, stream: str, n: int, batch_size: int, loss_of,
                   with_weights: bool, needs_constants: bool,
                   steps: int | None = None):
    """Shared builder for streams that draw ``random.sample`` batches each
    step (MultiKE_model.py:349-473): ckge_rel, ckgp_rel, ckge_attr,
    ckga_attr, common_space, space_mapping.

    ``n`` is the (possibly bucket-padded, see trainer._bucketed) row capacity
    of the data arrays; ``steps`` overrides the step count so a capacity
    bucket serving several true sizes keeps one compiled executable."""
    if steps is None:
        steps = max(1, int(np.ceil(n / batch_size)))
    bs = batch_size if steps > 1 else n
    update = _make_update(cfg, stream, loss_of)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def epoch(params, opt_state, key, *data):
        # data: (constants?), ids, (weights?)
        step_keys = jax.random.split(key, steps + 1)
        key, step_keys = step_keys[0], step_keys[1:]
        if needs_constants:
            constants, ids = data[0], data[1]
            weights = data[2] if with_weights else None
        else:
            constants, ids = None, data[0]
            weights = data[1] if with_weights else None

        def body(carry, sk):
            params, opt_state = carry
            sel = jax.random.permutation(sk, n)[:bs]
            batch = [ids[sel]]
            if with_weights:
                batch.append(weights[sel])
            if needs_constants:
                batch = [constants] + batch
            params, opt_state, loss = update(params, opt_state, *batch)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), step_keys)
        return params, opt_state, key, jnp.sum(losses)

    return epoch, steps, steps * bs


def build_ckge_rel_epoch(cfg: Config, n: int, steps: int | None = None):
    def loss_of(merged, pos):
        phs = lookup_norm(merged["rv_ent"], pos[:, 0])
        prs = lookup_norm(merged["rel"], pos[:, 1])
        pts = lookup_norm(merged["rv_ent"], pos[:, 2])
        return 2.0 * relation_logistic_loss_wo_negs(phs, prs, pts)

    return _sampled_epoch(cfg, "ckge_rel", n, cfg.batch_size, loss_of,
                          with_weights=False, needs_constants=False,
                          steps=steps)


def build_ckgp_rel_epoch(cfg: Config, n: int, steps: int | None = None):
    from multike_tpu.losses import logistic_loss_wo_negs

    def loss_of(merged, pos, w):
        phs = lookup_norm(merged["rv_ent"], pos[:, 0])
        prs = lookup_norm(merged["rel"], pos[:, 1])
        pts = lookup_norm(merged["rv_ent"], pos[:, 2])
        return 2.0 * logistic_loss_wo_negs(phs, prs, pts, w)

    return _sampled_epoch(cfg, "ckgp_rel", n, cfg.batch_size, loss_of,
                          with_weights=True, needs_constants=False,
                          steps=steps)


def build_ckge_attr_epoch(cfg: Config, n: int, steps: int | None = None):
    def loss_of(merged, constants, pos):
        phs = lookup_norm(merged["av_ent"], pos[:, 0])
        pas = merged["attr"][pos[:, 1]]
        pvs = constants["literal_embeds"][pos[:, 2]]
        score = conv_score(merged["conv_ckge"], phs, pas, pvs)
        return 2.0 * positive_logistic_from_scores(score)

    return _sampled_epoch(cfg, "ckge_attr", n, cfg.attribute_batch_size,
                          loss_of, with_weights=False, needs_constants=True,
                          steps=steps)


def build_ckga_attr_epoch(cfg: Config, n: int, steps: int | None = None):
    def loss_of(merged, constants, pos, w):
        phs = lookup_norm(merged["av_ent"], pos[:, 0])
        pas = merged["attr"][pos[:, 1]]
        pvs = constants["literal_embeds"][pos[:, 2]]
        score = conv_score(merged["conv_ckga"], phs, pas, pvs)
        return positive_logistic_from_scores(score, weights=w)

    return _sampled_epoch(cfg, "ckga_attr", n, cfg.attribute_batch_size,
                          loss_of, with_weights=True, needs_constants=True,
                          steps=steps)


def build_common_space_epoch(cfg: Config, n: int, steps: int | None = None):
    """ITC combination (MultiKE_model.py:225-239): optimize
    cv_weight * (cv_name_weight*||e-n||^2 + ||e-r||^2 + ||e-a||^2)."""
    cvw, cnw = cfg.cv_weight, cfg.cv_name_weight

    def loss_of(merged, constants, ents):
        final = lookup_norm(merged["ent"], ents)
        names = constants["name_embeds"][ents]
        cr = lookup_norm(merged["rv_ent"], ents)
        ca = lookup_norm(merged["av_ent"], ents)
        loss = cnw * alignment_loss(final, names)
        loss += alignment_loss(final, cr)
        loss += alignment_loss(final, ca)
        return cvw * loss

    return _sampled_epoch(cfg, "common_space", n, cfg.entity_batch_size,
                          loss_of, with_weights=False, needs_constants=True,
                          steps=steps)


def build_space_mapping_epoch(cfg: Config, n: int, steps: int | None = None):
    """SSL combination (MultiKE_model.py:241-261): only 'shared' variables
    (ent + the three mappings) receive updates."""
    ow = cfg.orthogonal_weight
    dim = cfg.dim
    eye = jnp.eye(dim, dtype=jnp.float32)

    def loss_of(merged, constants, ents):
        final = lookup_norm(merged["ent"], ents)
        nv = constants["name_embeds"][ents]
        rv = lookup_norm(merged["rv_ent"], ents)   # stop-grad via _merged
        av = lookup_norm(merged["av_ent"], ents)
        loss = space_mapping_loss(nv, final, merged["nv_mapping"], eye, ow)
        loss += space_mapping_loss(rv, final, merged["rv_mapping"], eye, ow)
        loss += space_mapping_loss(av, final, merged["av_mapping"], eye, ow)
        return loss

    return _sampled_epoch(cfg, "space_mapping", n, cfg.entity_batch_size,
                          loss_of, with_weights=False, needs_constants=True,
                          steps=steps)
