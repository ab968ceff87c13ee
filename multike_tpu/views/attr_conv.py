"""Attribute-view CNN scorer (parity with ``conv``, MultiKE_model.py:34-63).

Pipeline for a batch of (h, a, v) embeddings, all (B, dim):
  1. stack a and v into a (B, 2, dim, 1) "image";
  2. batch-norm over axis 2 — *inference mode with untrained moving
     statistics*: the reference's ``tf.layers.batch_normalization(x, 2)``
     defaults to ``training=False`` and its update ops are never run, so the
     op is ``y = gamma * x / sqrt(1 + eps) + beta`` with eps=1e-3 and
     trainable gamma/beta (SURVEY.md §7 "TF1 semantic traps");
  3. two conv2d layers: 2 feature maps, kernel (2, 4), stride 1, SAME
     padding, tanh;
  4. l2-normalize over axis 2;
  5. flatten -> dense(dim, tanh) -> l2-normalize over the WHOLE tensor
     ("important!!", MultiKE_model.py:60);
  6. score = -||h - dense||^2.

TF 'SAME' padding for even kernels pads more after than before:
kernel 2 -> (0,1), kernel 4 -> (1,2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from multike_tpu.params import l2_normalize

BN_EPS = 1e-3  # tf.layers.batch_normalization default epsilon


def conv_stages(conv_params, attr_hs, attr_as, attr_vs, layer_num: int = 2,
                mask=None):
    """Runs the scorer pipeline and returns every intermediate activation —
    the injected-weights parity harness (tests/test_activation_parity.py)
    compares each stage against an independent NumPy transcription of the
    TF1 ops (MultiKE_model.py:34-63). ``conv_score`` is this with only the
    final stage kept; under jit the dict costs nothing."""
    B, dim = attr_hs.shape
    stages = {}
    x = jnp.stack([attr_as, attr_vs], axis=1)          # (B, 2, dim)
    x = x[..., None]                                   # (B, 2, dim, 1)
    stages["stack"] = x

    # inference-mode BN over axis 2 (the dim axis)
    gamma = conv_params["bn_gamma"][None, None, :, None]
    beta = conv_params["bn_beta"][None, None, :, None]
    x = gamma * x * jax.lax.rsqrt(jnp.asarray(1.0 + BN_EPS)) + beta
    stages["bn"] = x

    for i in range(layer_num):
        w = conv_params[f"conv{i}_w"]                  # (kh, kw, cin, cout)
        b = conv_params[f"conv{i}_b"]
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1),
            padding=((0, 1), (1, 2)),                  # TF SAME for (2,4) kernel
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jnp.tanh(x + b)
        stages[f"conv{i}"] = x

    x = l2_normalize(x, axis=2)                        # (B, 2, dim, 2)
    stages["l2_axis2"] = x
    flat = x.reshape(B, -1)                            # (B, 4*dim)
    dense = jnp.tanh(flat @ conv_params["dense_w"] + conv_params["dense_b"])
    stages["dense_tanh"] = dense
    if mask is not None:
        dense = dense * mask[:, None]
    dense = l2_normalize(dense, axis=None)             # global-tensor norm
    stages["dense_gnorm"] = dense
    stages["score"] = -jnp.sum(jnp.square(attr_hs - dense), axis=1)
    return stages


def conv_score(conv_params, attr_hs, attr_as, attr_vs, layer_num: int = 2,
               mask=None):
    """Returns (B,) scores.

    ``mask`` (B,) zeroes padded rows *before* the global-tensor normalize in
    step 5 — the reference's axis-less l2_normalize makes every row's value
    depend on the whole batch, so padded rows must not pollute the norm.
    """
    return conv_stages(conv_params, attr_hs, attr_as, attr_vs,
                       layer_num=layer_num, mask=mask)["score"]
