"""Golden tests for losses and the conv scorer vs hand-computed numpy
implementations of the reference's TF1 math (SURVEY.md §4b/§4c)."""
import numpy as np
import pytest

import jax.numpy as jnp

from multike_tpu.losses import (alignment_loss, logistic_loss_wo_negs,
                                orthogonal_loss, relation_logistic_loss,
                                relation_logistic_loss_wo_negs,
                                space_mapping_loss)
from multike_tpu.params import init_conv_params, init_params, l2_normalize
from multike_tpu.views.attr_conv import conv_score
from multike_tpu.config import Config

rng = np.random.RandomState(0)


def np_softplus(x):
    return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0)


def test_relation_logistic_loss_golden():
    B, d = 7, 5
    phs, prs, pts = (rng.randn(B, d).astype(np.float32) for _ in range(3))
    nhs, nrs, nts = (rng.randn(B, d).astype(np.float32) for _ in range(3))
    pos_score = -np.sum((phs + prs - pts) ** 2, axis=1)
    neg_score = -np.sum((nhs + nrs - nts) ** 2, axis=1)
    want = np.sum(np.log1p(np.exp(-pos_score))) + np.sum(np.log1p(np.exp(neg_score)))
    got = float(relation_logistic_loss(*(jnp.asarray(x) for x in
                                         (phs, prs, pts, nhs, nrs, nts))))
    assert np.isclose(got, want, rtol=1e-5)


def test_masked_equals_short_batch():
    """Padding with mask 0 must equal the reference's short tail batch."""
    B, d = 6, 4
    phs, prs, pts = (rng.randn(B, d).astype(np.float32) for _ in range(3))
    mask = np.array([1, 1, 1, 1, 0, 0], np.float32)
    got = float(relation_logistic_loss_wo_negs(
        jnp.asarray(phs), jnp.asarray(prs), jnp.asarray(pts), jnp.asarray(mask)))
    want = float(relation_logistic_loss_wo_negs(
        jnp.asarray(phs[:4]), jnp.asarray(prs[:4]), jnp.asarray(pts[:4])))
    assert np.isclose(got, want, rtol=1e-6)


def test_weighted_loss_golden():
    B, d = 5, 3
    phs, pas, pvs = (rng.randn(B, d).astype(np.float32) for _ in range(3))
    w = rng.rand(B).astype(np.float32)
    score = -np.sum((phs + pas - pvs) ** 2, axis=1)
    want = np.sum(w * np.log1p(np.exp(-score)))
    got = float(logistic_loss_wo_negs(*(jnp.asarray(x) for x in (phs, pas, pvs, w))))
    assert np.isclose(got, want, rtol=1e-5)


def test_orthogonal_and_alignment_loss():
    d = 4
    M = rng.randn(d, d).astype(np.float32)
    eye = np.eye(d, dtype=np.float32)
    want = np.sum((M @ M.T - eye) ** 2)
    assert np.isclose(float(orthogonal_loss(jnp.asarray(M), jnp.asarray(eye))),
                      want, rtol=1e-5)
    a = rng.randn(6, d).astype(np.float32)
    b = rng.randn(6, d).astype(np.float32)
    assert np.isclose(float(alignment_loss(jnp.asarray(a), jnp.asarray(b))),
                      np.sum((a - b) ** 2), rtol=1e-5)


def test_space_mapping_loss_golden():
    """Axis-less l2_normalize over the mapped batch (losses.py:55)."""
    B, d = 8, 4
    view = rng.randn(B, d).astype(np.float32)
    shared = rng.randn(B, d).astype(np.float32)
    M = rng.randn(d, d).astype(np.float32)
    eye = np.eye(d, dtype=np.float32)
    ow = 2.0
    mapped = view @ M
    mapped = mapped / np.sqrt(np.sum(mapped ** 2))  # GLOBAL norm
    want = (np.sum((shared - mapped) ** 2)
            + ow * np.sum((M @ M.T - eye) ** 2)
            + 1e-4 * np.sum(M ** 2))
    got = float(space_mapping_loss(jnp.asarray(view), jnp.asarray(shared),
                                   jnp.asarray(M), jnp.asarray(eye), ow))
    assert np.isclose(got, want, rtol=1e-4)


def _np_conv_score(p, hs, a, v):
    """Numpy re-implementation of conv (MultiKE_model.py:34-63) with TF
    semantics: inference BN (eps 1e-3), SAME pad for (2,4) kernels, tanh,
    axis-2 l2 norm, dense tanh, global l2 norm."""
    B, dim = hs.shape
    x = np.stack([a, v], axis=1)[..., None]  # (B,2,dim,1)
    gamma = np.asarray(p["bn_gamma"])[None, None, :, None]
    beta = np.asarray(p["bn_beta"])[None, None, :, None]
    x = gamma * x / np.sqrt(1.0 + 1e-3) + beta
    for i in range(2):
        w = np.asarray(p[f"conv{i}_w"])  # (2,4,cin,cout)
        b = np.asarray(p[f"conv{i}_b"])
        xp = np.pad(x, ((0, 0), (0, 1), (1, 2), (0, 0)))
        out = np.zeros((B, 2, dim, w.shape[3]), np.float32)
        for bi in range(B):
            for oi in range(2):
                for oj in range(dim):
                    patch = xp[bi, oi:oi + 2, oj:oj + 4, :]
                    out[bi, oi, oj] = np.tensordot(patch, w, axes=([0, 1, 2], [0, 1, 2]))
        x = np.tanh(out + b)
    norm = np.sqrt(np.maximum(np.sum(x ** 2, axis=2, keepdims=True), 1e-12))
    x = x / norm
    flat = x.reshape(B, -1)
    dense = np.tanh(flat @ np.asarray(p["dense_w"]) + np.asarray(p["dense_b"]))
    dense = dense / np.sqrt(np.maximum(np.sum(dense ** 2), 1e-12))
    return -np.sum((hs - dense) ** 2, axis=1)


def test_conv_score_vs_numpy_reference():
    import jax

    dim, B = 6, 3
    p = init_conv_params(jax.random.PRNGKey(0), dim)
    # randomize bn/bias params so the test exercises them
    p = dict(p)
    p["bn_gamma"] = jnp.asarray(rng.rand(dim).astype(np.float32) + 0.5)
    p["bn_beta"] = jnp.asarray(rng.randn(dim).astype(np.float32) * 0.1)
    p["conv0_b"] = jnp.asarray(rng.randn(2).astype(np.float32) * 0.1)
    p["conv1_b"] = jnp.asarray(rng.randn(2).astype(np.float32) * 0.1)
    hs = rng.randn(B, dim).astype(np.float32)
    a = rng.randn(B, dim).astype(np.float32)
    v = rng.randn(B, dim).astype(np.float32)
    got = np.asarray(conv_score(p, jnp.asarray(hs), jnp.asarray(a), jnp.asarray(v)))
    want = _np_conv_score(p, hs, a, v)
    assert np.allclose(got, want, atol=1e-4), (got, want)


def test_l2_normalize_matches_tf_semantics():
    x = rng.randn(3, 4).astype(np.float32)
    # axis-less: whole tensor
    got = np.asarray(l2_normalize(jnp.asarray(x)))
    want = x / np.sqrt(np.sum(x ** 2))
    assert np.allclose(got, want, rtol=1e-6)
    # axis=1: per row
    got = np.asarray(l2_normalize(jnp.asarray(x), axis=1))
    want = x / np.sqrt(np.sum(x ** 2, axis=1, keepdims=True))
    assert np.allclose(got, want, rtol=1e-6)
    # zero row stays finite
    z = np.zeros((2, 3), np.float32)
    assert np.all(np.isfinite(np.asarray(l2_normalize(jnp.asarray(z), axis=1))))


def test_init_params_shapes():
    cfg = Config(dim=16)
    p = init_params(cfg, entities_num=50, relations_num=7, attributes_num=5)
    assert p["rv_ent"].shape == (50, 16)
    assert p["rel"].shape == (7, 16)
    assert p["attr"].shape == (5, 16)
    assert p["nv_mapping"].shape == (16, 16)
    # mapping matrices are orthogonal at init
    M = np.asarray(p["rv_mapping"])
    assert np.allclose(M @ M.T, np.eye(16), atol=1e-4)
    assert set(p["conv_av"]) == {"bn_gamma", "bn_beta", "conv0_w", "conv0_b",
                                 "conv1_w", "conv1_b", "dense_w", "dense_b"}
