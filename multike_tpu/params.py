"""Model parameters: embedding tables, view->shared mappings, conv scorers.

Parity with MultiKE_model.py:86-107 (``_define_variables``):
  * trainables: ``rv_ent``, ``rel``, ``av_ent`` (xavier, l2-normalized on
    every read), ``attr`` (xavier, NOT normalized — "False important!",
    MultiKE_model.py:96-97), ``ent`` shared space (normalized on read);
  * three dim x dim orthogonal-initialized view->shared mapping matrices;
  * constants: ``name_embeds`` (frozen literal-encoder name matrix) and
    ``literal_embeds`` (value matrix) live outside the trainable pytree;
  * three *independent* conv-scorer parameter sets — the reference calls
    ``conv()`` in three graph builders without variable reuse
    (MultiKE_model.py:145, 182, 214), so each loss stream trains its own CNN.

The tables are stored raw; normalization-on-read happens row-wise after the
gather inside each jitted loss (row-wise l2 commutes with row gather, so this
matches normalizing the whole table first, gradients included).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from multike_tpu.config import Config

EPS_L2 = 1e-12  # tf.nn.l2_normalize epsilon


def l2_normalize(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    """tf.nn.l2_normalize semantics: x * rsqrt(max(sum(x^2), eps)).

    ``axis=None`` normalizes over the whole tensor — the reference leans on
    this in several "important!!" places (MultiKE_model.py:60, losses.py:55,
    auto_encoder.py:66)."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=axis is not None)
    return x * jax.lax.rsqrt(jnp.maximum(sq, EPS_L2))


def _xavier_normal(key, shape):
    """tf.contrib.layers.xavier_initializer(uniform=False): truncated normal,
    stddev = sqrt(2 / (fan_in + fan_out))."""
    fan_in, fan_out = shape[0], shape[1]
    std = float(np.sqrt(2.0 / (fan_in + fan_out)))
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


def _glorot_uniform(key, shape, fan_in, fan_out):
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def init_conv_params(key, dim: int, feature_map_size: int = 2,
                     kernel=(2, 4), layer_num: int = 2) -> Dict[str, jnp.ndarray]:
    """One conv-scorer parameter set (MultiKE_model.py:34-63).

    batch-norm runs in inference mode with untrained moving statistics
    (training flag never set, update ops never run in the reference), i.e.
    y = gamma * x / sqrt(1 + eps) + beta; gamma/beta are trainable.
    """
    kh, kw = kernel
    keys = jax.random.split(key, layer_num + 1)
    p: Dict[str, jnp.ndarray] = {
        "bn_gamma": jnp.ones((dim,), jnp.float32),
        "bn_beta": jnp.zeros((dim,), jnp.float32),
    }
    in_ch = 1
    for i in range(layer_num):
        shape = (kh, kw, in_ch, feature_map_size)
        rf = kh * kw
        p[f"conv{i}_w"] = _glorot_uniform(keys[i], shape, rf * in_ch,
                                          rf * feature_map_size)
        p[f"conv{i}_b"] = jnp.zeros((feature_map_size,), jnp.float32)
        in_ch = feature_map_size
    flat = 2 * dim * feature_map_size
    p["dense_w"] = _glorot_uniform(keys[-1], (flat, dim), flat, dim)
    p["dense_b"] = jnp.zeros((dim,), jnp.float32)
    return p


def init_params(cfg: Config, entities_num: int, relations_num: int,
                attributes_num: int, seed: int | None = None) -> Dict:
    seed = cfg.seed if seed is None else seed
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 16)
    d = cfg.dim
    orth = jax.nn.initializers.orthogonal()
    return {
        "rv_ent": _xavier_normal(ks[0], (entities_num, d)),
        "rel": _xavier_normal(ks[1], (relations_num, d)),
        "av_ent": _xavier_normal(ks[2], (entities_num, d)),
        "attr": _xavier_normal(ks[3], (attributes_num, d)),
        "ent": _xavier_normal(ks[4], (entities_num, d)),
        "nv_mapping": orth(ks[5], (d, d), jnp.float32),
        "rv_mapping": orth(ks[6], (d, d), jnp.float32),
        "av_mapping": orth(ks[7], (d, d), jnp.float32),
        "conv_av": init_conv_params(ks[8], d),
        "conv_ckge": init_conv_params(ks[9], d),
        "conv_ckga": init_conv_params(ks[10], d),
    }


# Variables whose every read is l2-normalized row-wise
# (MultiKE_model.py:92-99 via base/initializers.py:22-26).
NORMALIZED_TABLES = ("rv_ent", "rel", "av_ent", "ent")

# Variables in the 'shared' TF scope — the only ones the SSL space-mapping
# stream optimizes (MultiKE_model.py:257-261).
SHARED_VARS = ("ent", "nv_mapping", "rv_mapping", "av_mapping")


def lookup_norm(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows then l2-normalize each row (normalize-on-read)."""
    return l2_normalize(table[idx], axis=-1)


# TPU row-scatter costs ~14ns per updated row regardless of row width
# (measured on v5p-class hardware); below this table size a one-hot matmul
# gather — whose BACKWARD is an MXU matmul instead of a row scatter — is the
# cheaper lookup for hot training streams.
ONE_HOT_LOOKUP_MAX_ROWS = 8192


def lookup_norm_mm(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """lookup_norm for *small* tables (relations/attributes) via one-hot
    matmul. Forward result is bit-identical row selection (one-hot rows are
    exact in any float dtype; HIGHEST precision keeps f32 accumulation);
    the backward pass becomes ``one_hot.T @ grad_rows`` on the MXU, avoiding
    the per-row scatter latency that dominates embedding training steps."""
    oh = jax.nn.one_hot(idx, table.shape[0], dtype=table.dtype)
    rows = jnp.einsum("...n,nd->...d", oh, table,
                      precision=jax.lax.Precision.HIGHEST)
    return l2_normalize(rows, axis=-1)


def lookup_norm_fast(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Dispatch lookup_norm / lookup_norm_mm on static table size."""
    if table.shape[0] <= ONE_HOT_LOOKUP_MAX_ROWS:
        return lookup_norm_mm(table, idx)
    return lookup_norm(table, idx)
