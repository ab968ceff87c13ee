"""Negative-batching schemes: the lean per-slot layout must equal the
reference loss exactly, the chunk-shared MXU expansion must equal direct
distance computation, and both schemes must train the relation view."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multike_tpu.config import Config
from multike_tpu.losses import (chunk_shared_relation_logistic_loss,
                                lean_relation_logistic_loss,
                                relation_logistic_loss)
from multike_tpu.params import l2_normalize, lookup_norm, lookup_norm_mm


def _rows(key, n, d):
    return l2_normalize(jax.random.normal(key, (n, d)), axis=-1)


def test_lean_loss_equals_reference_on_assembled_negatives():
    key = jax.random.PRNGKey(0)
    B, K, D = 32, 5, 8
    ks = jax.random.split(key, 6)
    phs, prs, pts = _rows(ks[0], B, D), _rows(ks[1], B, D), _rows(ks[2], B, D)
    cand = _rows(ks[3], B * K, D).reshape(B, K, D)
    hb = jax.random.bernoulli(ks[4], 0.5, (B, K))
    mask = (jax.random.uniform(ks[5], (B,)) > 0.2).astype(jnp.float32)

    # assemble negatives the reference way: repeat each positive K times,
    # replace the corrupted side with the candidate row
    nhs = jnp.where(hb[..., None], cand, phs[:, None]).reshape(B * K, D)
    nts = jnp.where(hb[..., None], pts[:, None], cand).reshape(B * K, D)
    nrs = jnp.repeat(prs, K, axis=0)
    ref = relation_logistic_loss(phs, prs, pts, nhs, nrs, nts,
                                 pos_mask=mask,
                                 neg_mask=jnp.repeat(mask, K))
    lean = lean_relation_logistic_loss(phs, prs, pts, cand, hb, mask)
    assert np.isclose(float(ref), float(lean), rtol=1e-6), (ref, lean)


def test_chunk_shared_expansion_equals_direct_distances():
    """The MXU-expanded chunk loss (cross terms as einsum matmuls) must equal
    direct per-pair distance computation over both candidate pools with the
    K/(2C) pair weight."""
    key = jax.random.PRNGKey(1)
    NC, S, C, D = 3, 16, 4, 8
    neg_weight = 0.37  # arbitrary, to catch missing/implicit weighting
    ks = jax.random.split(key, 6)
    phs = _rows(ks[0], NC * S, D).reshape(NC, S, D)
    prs = _rows(ks[1], NC * S, D).reshape(NC, S, D)
    pts = _rows(ks[2], NC * S, D).reshape(NC, S, D)
    ch = _rows(ks[3], NC * C, D).reshape(NC, C, D)
    ct = _rows(ks[4], NC * C, D).reshape(NC, C, D)
    mask = (jax.random.uniform(ks[5], (NC, S)) > 0.2).astype(jnp.float32)

    got = chunk_shared_relation_logistic_loss(
        phs, prs, pts, ch, ct, neg_weight=neg_weight, pos_mask=mask)

    # direct: materialize every (positive, pool candidate) pair, both pools
    ns_h = -jnp.sum((ch[:, None] + prs[:, :, None] - pts[:, :, None]) ** 2, -1)
    ns_t = -jnp.sum((phs[:, :, None] + prs[:, :, None] - ct[:, None]) ** 2, -1)
    ps = -jnp.sum((phs + prs - pts) ** 2, -1)
    want = (jnp.sum(jax.nn.softplus(-ps) * mask)
            + neg_weight * jnp.sum(
                (jax.nn.softplus(ns_h) + jax.nn.softplus(ns_t))
                * mask[..., None]))
    assert np.isclose(float(got), float(want), rtol=1e-5), (got, want)


def test_chunk_keep_masks_drop_pairs():
    """keep_h/keep_t zero-masks must remove exactly the head/tail pool
    contributions (Bloom exact-rejection path)."""
    key = jax.random.PRNGKey(2)
    NC, S, C, D = 1, 4, 3, 6
    ks = jax.random.split(key, 5)
    phs = _rows(ks[0], S, D).reshape(NC, S, D)
    prs = _rows(ks[1], S, D).reshape(NC, S, D)
    pts = _rows(ks[2], S, D).reshape(NC, S, D)
    ch = _rows(ks[3], C, D).reshape(NC, C, D)
    ct = _rows(ks[4], C, D).reshape(NC, C, D)
    mask = jnp.ones((NC, S), jnp.float32)
    zeros = jnp.zeros((NC, S, C), jnp.float32)

    full = chunk_shared_relation_logistic_loss(
        phs, prs, pts, ch, ct, neg_weight=0.5, pos_mask=mask)
    none = chunk_shared_relation_logistic_loss(
        phs, prs, pts, ch, ct, neg_weight=0.5, pos_mask=mask,
        keep_h=zeros, keep_t=zeros)
    ps = -jnp.sum((phs + prs - pts) ** 2, -1)
    pos_only = jnp.sum(jax.nn.softplus(-ps))
    assert float(none) < float(full)
    assert np.isclose(float(none), float(pos_only), rtol=1e-6)

    # dropping only the head pool leaves exactly the tail-pool negatives
    head_off = chunk_shared_relation_logistic_loss(
        phs, prs, pts, ch, ct, neg_weight=0.5, pos_mask=mask, keep_h=zeros)
    ns_t = -jnp.sum((phs[:, :, None] + prs[:, :, None] - ct[:, None]) ** 2, -1)
    want = pos_only + 0.5 * jnp.sum(jax.nn.softplus(ns_t))
    assert np.isclose(float(head_off), float(want), rtol=1e-6)


def test_lookup_norm_mm_matches_gather():
    key = jax.random.PRNGKey(3)
    tab = jax.random.normal(key, (50, 7))
    idx = jax.random.randint(key, (33,), 0, 50)
    a = np.asarray(lookup_norm(tab, idx))
    b = np.asarray(lookup_norm_mm(tab, idx))
    assert np.allclose(a, b, atol=1e-6)


def test_sample_shared_corruptions_ranges():
    from multike_tpu.sampling import sample_shared_corruptions

    ch, ct = sample_shared_corruptions(jax.random.PRNGKey(0), 7, 11, 100, 240)
    for arr in (np.asarray(ch), np.asarray(ct)):
        assert arr.shape == (7, 11)
        assert arr.min() >= 100 and arr.max() < 240


@pytest.mark.parametrize("scheme", ["chunk_shared", "per_slot"])
def test_rel_view_epoch_both_schemes_reduce_loss(scheme):
    from multike_tpu.params import init_params
    from multike_tpu.train import streams

    cfg = Config(dim=8, batch_size=64, neg_triple_num=4, learning_rate=0.05,
                 neg_scheme=scheme, neg_chunk_size=16)
    E, R = 60, 6
    rng = np.random.RandomState(0)
    t1 = np.stack([rng.randint(0, 30, 200), rng.randint(0, R, 200),
                   rng.randint(0, 30, 200)], 1).astype(np.int32)
    t2 = np.stack([rng.randint(30, 60, 150), rng.randint(0, R, 150),
                   rng.randint(30, 60, 150)], 1).astype(np.int32)
    params = init_params(cfg, E, R, 2)
    opt = streams.init_stream_opt_states(cfg, params)["rel_view"]
    epoch, steps, trained = streams.build_rel_view_epoch(
        cfg, len(t1), len(t2), ((0, 30), (30, 60)), with_neighbors=False)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(6):
        params, opt, key, loss = epoch(params, opt, key,
                                       jnp.asarray(t1), jnp.asarray(t2))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert trained == 350


def test_sample_shared_neighbor_corruptions_sources():
    """Every pool candidate must come from SOME chunk member's neighbor row
    (cnt > 0 donors) or fall in [lo, hi) (uniform fallback)."""
    from multike_tpu.sampling import (build_neighbor_state,
                                      sample_shared_neighbor_corruptions)

    rng = np.random.RandomState(1)
    lo, hi = 20, 80
    # entities 20..49 have neighbor rows drawn from 60..79; 50..79 have none
    useful = np.arange(20, 50, dtype=np.int64)
    nbrs = rng.randint(60, 80, size=(30, 5)).astype(np.int32)
    state = build_neighbor_state(100, [(useful, nbrs)])
    nc, s, C = 3, 8, 16
    pos = np.stack([rng.randint(20, 80, nc * s), rng.randint(0, 4, nc * s),
                    rng.randint(20, 80, nc * s)], 1).astype(np.int32)
    ch, ct = sample_shared_neighbor_corruptions(
        jax.random.PRNGKey(3), jnp.asarray(pos), nc, s, C, lo, hi, state)
    h = pos[:, 0].reshape(nc, s)
    t = pos[:, 2].reshape(nc, s)
    nbr_of = {int(e): set(map(int, row)) for e, row in zip(useful, nbrs)}
    for pool_arr, ents in ((np.asarray(ch), h), (np.asarray(ct), t)):
        assert pool_arr.shape == (nc, C)
        assert pool_arr.min() >= lo and pool_arr.max() < hi
        for c in range(nc):
            allowed = set(range(lo, hi))  # uniform fallback always possible
            from_nbr = set()
            for e in ents[c]:
                from_nbr |= nbr_of.get(int(e), set())
            # at least SOME candidates should come from neighbor rows
            # (most chunk members have rows; P(all-uniform) is negligible)
            assert len(set(map(int, pool_arr[c])) & from_nbr) > 0


def test_rel_view_truncated_chunk_scheme_runs_and_learns():
    from multike_tpu.params import init_params
    from multike_tpu.sampling import build_neighbor_state
    from multike_tpu.train import streams

    cfg = Config(dim=8, batch_size=64, neg_triple_num=4, learning_rate=0.05,
                 truncated_neg_scheme="chunk_shared", truncated_chunk_size=16,
                 neg_pool_size=12)
    E, R = 60, 6
    rng = np.random.RandomState(0)
    t1 = np.stack([rng.randint(0, 30, 200), rng.randint(0, R, 200),
                   rng.randint(0, 30, 200)], 1).astype(np.int32)
    t2 = np.stack([rng.randint(30, 60, 150), rng.randint(0, R, 150),
                   rng.randint(30, 60, 150)], 1).astype(np.int32)
    parts = [(np.arange(0, 30, dtype=np.int64),
              rng.randint(0, 30, size=(30, 4)).astype(np.int32)),
             (np.arange(30, 60, dtype=np.int64),
              rng.randint(30, 60, size=(30, 4)).astype(np.int32))]
    nbr = build_neighbor_state(E, parts)
    params = init_params(cfg, E, R, 2)
    opt = streams.init_stream_opt_states(cfg, params)["rel_view"]
    epoch, steps, trained = streams.build_rel_view_epoch(
        cfg, len(t1), len(t2), ((0, 30), (30, 60)), with_neighbors=True)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(6):
        params, opt, key, loss = epoch(params, opt, key,
                                       jnp.asarray(t1), jnp.asarray(t2), nbr)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_shared_neighbor_donor_mask_excludes_padding():
    """With a validity mask, donors come only from real (unmasked) slots —
    padded tail slots' entities must contribute nothing to the pools
    (ADVICE r3: tail-chunk donor bias)."""
    from multike_tpu.sampling import (build_neighbor_state,
                                      sample_shared_neighbor_corruptions)

    lo, hi = 0, 50
    nc, s, C = 2, 8, 64
    # real entities 60..63 -> neighbors in 200..209; the padding entity 70
    # -> neighbors in 300..309 (disjoint from both the real rows and the
    # uniform range, so any leak is detectable)
    useful = np.array([60, 61, 62, 63, 70], dtype=np.int64)
    nbrs = np.stack([np.arange(200, 205), np.arange(202, 207),
                     np.arange(204, 209), np.arange(205, 210),
                     np.arange(300, 305)]).astype(np.int32)
    state = build_neighbor_state(400, [(useful, nbrs)])
    h = np.array([60, 61, 62, 63] + [70] * 4 +      # chunk 0: 4 real + 4 pad
                 [62, 63, 60, 61] + [70] * 4,       # chunk 1: same
                 dtype=np.int32)
    pos = np.stack([h, np.zeros_like(h), h], 1)
    mask = np.tile([1.0] * 4 + [0.0] * 4, nc).astype(np.float32)
    ch, ct = sample_shared_neighbor_corruptions(
        jax.random.PRNGKey(7), jnp.asarray(pos), nc, s, C, lo, hi, state,
        mask=jnp.asarray(mask))
    for pool_arr in (np.asarray(ch), np.asarray(ct)):
        assert pool_arr.min() >= 200 and pool_arr.max() < 210, \
            "padding entity's neighbor rows leaked into the pools"
