"""Loss functions (parity with losses.py:4-69), in jnp with padding masks.

All losses are *sums* over the batch like the reference; every function takes
an optional ``mask`` (1.0 real row / 0.0 padded row) so fixed-shape batches
with tail padding reproduce the reference's variable-size batch sums exactly.
``log(1 + exp(x))`` is computed as ``softplus(x)`` — identical math, no
overflow for large scores.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from multike_tpu.params import l2_normalize


def _sq_norm(x):
    return jnp.sum(jnp.square(x), axis=-1)


def transe_score(h, r, t):
    """-||h + r - t||^2 (losses.py:5-8)."""
    return -_sq_norm(h + r - t)


def relation_logistic_loss(phs, prs, pts, nhs, nrs, nts,
                           pos_mask=None, neg_mask=None):
    """sum softplus(-pos_score) + sum softplus(neg_score) (losses.py:4-12)."""
    pos = jax.nn.softplus(-transe_score(phs, prs, pts))
    neg = jax.nn.softplus(transe_score(nhs, nrs, nts))
    if pos_mask is not None:
        pos = pos * pos_mask
    if neg_mask is not None:
        neg = neg * neg_mask
    return jnp.sum(pos) + jnp.sum(neg)


def relation_logistic_loss_wo_negs(phs, prs, pts, mask=None):
    """losses.py:30-34."""
    pos = jax.nn.softplus(-transe_score(phs, prs, pts))
    if mask is not None:
        pos = pos * mask
    return jnp.sum(pos)


def logistic_loss_wo_negs(phs, pas, pvs, pws, mask=None):
    """Weighted positives-only logistic loss (losses.py:44-50)."""
    pos = jax.nn.softplus(-transe_score(phs, pas, pvs)) * pws
    if mask is not None:
        pos = pos * mask
    return jnp.sum(pos)


def positive_logistic_from_scores(scores, weights=None, mask=None):
    """sum w * softplus(-score) — used with the conv scorer
    (MultiKE_model.py:146-148, 183, 215-217)."""
    pos = jax.nn.softplus(-scores)
    if weights is not None:
        pos = pos * weights
    if mask is not None:
        pos = pos * mask
    return jnp.sum(pos)


def lean_relation_logistic_loss(phs, prs, pts, cand_rows, corrupt_head,
                                pos_mask=None, neg_keep=None):
    """Reference TransE logistic loss (losses.py:4-12) in the *lean* batch
    layout: instead of materializing six gathered row blocks (pos + fully
    assembled negatives), negatives reuse the positive rows for the
    uncorrupted side. ``phs/prs/pts``: (B, D) normalized rows;
    ``cand_rows``: (B, K, D) normalized corruption-candidate rows;
    ``corrupt_head``: (B, K) bool. Mathematically identical to
    :func:`relation_logistic_loss` on the assembled negatives; it just
    avoids gathering (and back-scattering) each positive row K extra times.
    ``neg_keep`` (B, K), optional: 0 drops a negative slot (Bloom 'drop'
    rejection of true triples, sampling.sample_corruptions).

    The negative score is computed via the norm expansion (same identity the
    chunk loss uses) instead of materializing (B, K, D) head/tail selects:
      corrupt head:  -||c + r - t||^2 = -(|c|^2 + |r - t|^2 + 2 c.(r - t))
      corrupt tail:  -||h + r - c||^2 = -(|h + r|^2 + |c|^2 - 2 (h + r).c)
    so the only (B, K, D)-sized work is three fused multiply-reduces over
    ``cand_rows`` (|c|^2, c.rt, c.hr) and the head/tail select happens on
    (B, K) scalars — ~2x less HBM traffic through the fwd+bwd of the
    truncated-phase step (measured v5e, docs/EXPERIMENTS.md)."""
    pos = jax.nn.softplus(-transe_score(phs, prs, pts))
    rt = prs - pts                                        # (B, D)
    hr = phs + prs
    c_sq = _sq_norm(cand_rows)                            # (B, K)
    c_rt = jnp.einsum("bkd,bd->bk", cand_rows, rt)
    c_hr = jnp.einsum("bkd,bd->bk", cand_rows, hr)
    ns_h = -(c_sq + _sq_norm(rt)[:, None] + 2.0 * c_rt)
    ns_t = -(_sq_norm(hr)[:, None] + c_sq - 2.0 * c_hr)
    neg = jax.nn.softplus(jnp.where(corrupt_head, ns_h, ns_t))
    if neg_keep is not None:
        neg = neg * neg_keep
    if pos_mask is not None:
        pos = pos * pos_mask
        neg = neg * pos_mask[:, None]
    return jnp.sum(pos) + jnp.sum(neg)


def chunk_shared_relation_logistic_loss(phs, prs, pts, cand_h, cand_t,
                                        neg_weight=1.0, pos_mask=None,
                                        keep_h=None, keep_t=None):
    """TransE logistic loss with chunk-shared negatives — the TPU-native
    scheme (same family as DGL-KE chunk-based / PBG batched negatives).

    ``phs/prs/pts``: (NC, S, D) normalized positive rows, chunked;
    ``cand_h/cand_t``: (NC, C, D) normalized shared candidate rows (head-
    and tail-corruption pools). Every positive scores against all C
    candidates of each pool, each pair weighted ``neg_weight``.

    The reference's negative sum (losses.py:10-11 over B*K per-slot draws:
    a p=0.5 head/tail coin + a uniform candidate, base/batch.py:86-116) is a
    Monte-Carlo sum of K iid terms per positive. Scoring C shared uniform
    candidates per side with ``neg_weight = K / (2C)`` is the same estimator
    with more samples — identical expectation, lower variance — while the
    candidate pools stay small enough that their gradients ride the matmul
    transpose instead of a row scatter.

    The negative score -||h' + r - t'||^2 is expanded so the cross terms
    become (NC, S, D) x (NC, C, D) batched matmuls on the MXU:
      corrupt head:  -(|c|^2 + |r - t|^2 + 2 c.(r - t))
      corrupt tail:  -(|h + r|^2 + |c|^2 - 2 (h + r).c)
    ``keep_h``/``keep_t`` (NC, S, C), optional: 0 drops a (positive,
    candidate) pair (exact Bloom-filter rejection of true triples — stronger
    than the reference's 10-retry resampling, base/batch.py:103-105)."""
    hi_prec = jax.lax.Precision.HIGHEST
    pos = jax.nn.softplus(-transe_score(phs, prs, pts))        # (NC, S)

    rt = prs - pts                                             # (NC, S, D)
    ns_h = -(_sq_norm(cand_h)[:, None, :] + _sq_norm(rt)[..., None]
             + 2.0 * jnp.einsum("csd,ckd->csk", rt, cand_h, precision=hi_prec))
    hr = phs + prs
    ns_t = -(_sq_norm(hr)[..., None] + _sq_norm(cand_t)[:, None, :]
             - 2.0 * jnp.einsum("csd,ckd->csk", hr, cand_t, precision=hi_prec))
    neg_h = jax.nn.softplus(ns_h)                              # (NC, S, C)
    neg_t = jax.nn.softplus(ns_t)
    if keep_h is not None:
        neg_h = neg_h * keep_h
    if keep_t is not None:
        neg_t = neg_t * keep_t
    neg = (neg_h + neg_t) * neg_weight
    if pos_mask is not None:
        pos = pos * pos_mask
        neg = neg * pos_mask[..., None]
    return jnp.sum(pos) + jnp.sum(neg)


def alignment_loss(ents1, ents2, mask=None):
    """sum ||e1 - e2||^2 (losses.py:66-69)."""
    d = _sq_norm(ents1 - ents2)
    if mask is not None:
        d = d * mask
    return jnp.sum(d)


def orthogonal_loss(mapping, eye):
    """sum (M M^T - I)^2 (losses.py:61-63)."""
    return jnp.sum(jnp.square(mapping @ mapping.T - eye))


def space_mapping_loss(view_embeds, shared_embeds, mapping, eye,
                       orthogonal_weight, norm_w=0.0001, mask=None):
    """losses.py:53-58. NB: the mapped view embeddings are normalized by the
    l2 norm of the WHOLE batch tensor (axis-less tf.nn.l2_normalize at
    losses.py:55)."""
    mapped = view_embeds @ mapping
    if mask is not None:
        mapped = mapped * mask[:, None]  # keep padded rows out of the norm
    mapped = l2_normalize(mapped, axis=None)
    d = _sq_norm(shared_embeds - mapped)
    if mask is not None:
        d = d * mask
    map_loss = jnp.sum(d)
    norm_loss = jnp.sum(jnp.square(mapping))
    return map_loss + orthogonal_weight * orthogonal_loss(mapping, eye) + \
        norm_w * norm_loss
