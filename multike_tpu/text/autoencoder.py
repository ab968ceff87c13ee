"""Literal autoencoder in JAX (parity with auto_encoder.py:19-144).

Architecture: encoder 1500 -> 1024 -> 512 -> dim with mirrored decoder
(auto_encoder.py:26, 41-61); weights/biases drawn from a standard normal,
matching the reference's ``tf.random_normal_initializer`` default.

Faithfully reproduced quirks:
  * ``encoder_active='thah'`` (the reference config's typo, args.json:10)
    matches neither activation branch (auto_encoder.py:75-78) so all layers
    are linear.
  * With ``encoder_normalize``: inputs are row-normalized once
    (auto_encoder.py:34-35) and the encoder output is normalized by the
    l2 norm of the *entire batch tensor* (axis-less ``tf.nn.l2_normalize``,
    auto_encoder.py:66) inside the training loss only.
  * Inference (``encode``) applies the raw encoder with NO output
    normalization (auto_encoder.py:114-144 re-runs the encoder outside the
    graph) — the returned literal vectors are unnormalized.
  * One Adagrad(lr, initial_accumulator=0.1) over the MSE reconstruction
    loss; batches of ``batch_size`` rows in order, tail batch smaller.
    (Delta vs reference: when ``n % batch_size == 0`` the reference feeds one
    empty batch whose mean-loss is NaN; we skip empty batches.)
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from multike_tpu.config import Config


def _activation(name: str):
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "tanh":
        return jnp.tanh
    return lambda x: x  # 'thah' and anything else: identity


def init_autoencoder_params(cfg: Config, input_dim: int = 1500, seed: int = 0):
    dims = [input_dim] + list(cfg.hidden_dims)
    n_layers = len(dims) - 1
    key = jax.random.PRNGKey(seed)
    params = {}
    for i in range(n_layers):
        key, k1, k2 = jax.random.split(key, 3)
        params[f"enc_w{i}"] = jax.random.normal(k1, (dims[i], dims[i + 1]), jnp.float32)
        params[f"enc_b{i}"] = jax.random.normal(k2, (dims[i + 1],), jnp.float32)
    for i in range(n_layers):
        j = n_layers - i
        key, k1, k2 = jax.random.split(key, 3)
        params[f"dec_w{i}"] = jax.random.normal(k1, (dims[j], dims[j - 1]), jnp.float32)
        params[f"dec_b{i}"] = jax.random.normal(k2, (dims[j - 1],), jnp.float32)
    return params


def encoder_apply(params, x, act, n_layers: int):
    h = x
    for i in range(n_layers):
        h = act(h @ params[f"enc_w{i}"] + params[f"enc_b{i}"])
    return h


def decoder_apply(params, h, act, n_layers: int):
    for i in range(n_layers):
        h = act(h @ params[f"dec_w{i}"] + params[f"dec_b{i}"])
    return h


class AutoEncoder:
    """Trains on a fixed (n, input_dim) matrix; exposes ``encode``."""

    def __init__(self, word_vec_mat: np.ndarray, cfg: Config,
                 input_dim: int = 1500, seed: int = 0):
        self.cfg = cfg
        self.input_dim = input_dim
        self.n_layers = len(cfg.hidden_dims)
        self.act = _activation(cfg.encoder_active)

        x = np.asarray(word_vec_mat, np.float32).reshape(-1, input_dim)
        if cfg.encoder_normalize:
            norms = np.linalg.norm(x, axis=1, keepdims=True)
            x = np.where(norms > 0, x / np.maximum(norms, 1e-30), x)
        self.x = x

        self.params = init_autoencoder_params(cfg, input_dim, seed)
        self.opt = optax.adagrad(cfg.learning_rate, initial_accumulator_value=0.1)
        self.opt_state = self.opt.init(self.params)

        n = x.shape[0]
        bs = min(cfg.batch_size, max(n, 1))
        steps = max(1, -(-n // bs))
        pad = steps * bs - n
        self._xp = jnp.asarray(np.concatenate(
            [x, np.zeros((pad, input_dim), np.float32)]).reshape(steps, bs, input_dim))
        self._wp = jnp.asarray(np.concatenate(
            [np.ones(n, np.float32), np.zeros(pad, np.float32)]).reshape(steps, bs))

        normalize = cfg.encoder_normalize
        act, n_layers = self.act, self.n_layers

        def batch_loss(params, xb, wb):
            h = encoder_apply(params, xb, act, n_layers)
            h = h * wb[:, None]  # mask padded rows before the global norm
            if normalize:
                h = h / jnp.maximum(jnp.linalg.norm(h), 1e-30)
            dec = decoder_apply(params, h, act, n_layers)
            sq = jnp.sum((dec - xb) ** 2 * wb[:, None])
            denom = jnp.maximum(jnp.sum(wb), 1.0) * input_dim
            return sq / denom

        def train_step(carry, xs):
            params, opt_state = carry
            xb, wb = xs
            loss, grads = jax.value_and_grad(batch_loss)(params, xb, wb)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        @jax.jit
        def run_epoch(params, opt_state, xp, wp):
            (params, opt_state), losses = jax.lax.scan(
                train_step, (params, opt_state), (xp, wp))
            return params, opt_state, jnp.sum(losses)

        self._run_epoch = run_epoch

        @jax.jit
        def encode_fn(params, xb):
            return encoder_apply(params, xb, act, n_layers)

        self._encode_fn = encode_fn

    def train(self, epochs: int | None = None, verbose: bool = False):
        epochs = self.cfg.encoder_epoch if epochs is None else epochs
        for e in range(epochs):
            self.params, self.opt_state, loss = self._run_epoch(
                self.params, self.opt_state, self._xp, self._wp)
            if verbose and (e + 1) % 10 == 0:
                print(f"epoch {e + 1} of literal encoder, loss: {float(loss):.4f}")
        return self

    def encode(self, data: np.ndarray | None = None) -> np.ndarray:
        """Raw encoder output (no normalization), matching
        auto_encoder.py:114-144."""
        x = self.x if data is None else np.asarray(data, np.float32).reshape(
            -1, self.input_dim)
        outs = []
        bs = self.cfg.batch_size
        for i in range(0, max(len(x), 1), bs):
            xb = x[i:i + bs]
            if len(xb) == 0:
                break
            outs.append(np.asarray(self._encode_fn(self.params, jnp.asarray(xb))))
        return np.concatenate(outs, axis=0) if outs else np.zeros(
            (0, self.cfg.dim), np.float32)
