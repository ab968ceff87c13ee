"""Text pipeline tests: word2vec loading, char fallback, autoencoder
linearity quirk, literal token matrix, DataModel end-to-end."""
import numpy as np
import pytest

from multike_tpu.config import Config
from multike_tpu.text.autoencoder import AutoEncoder
from multike_tpu.text.word2vec import (build_alphabet, literal_token_matrix,
                                       read_word2vec)


def small_cfg(**kw):
    base = dict(dim=8, batch_size=64, encoder_epoch=3, tokens_max_len=5,
                word2vec_dim=16)
    base.update(kw)
    return Config(**base)


def test_read_word2vec(tmp_path):
    p = tmp_path / "w.vec"
    p.write_text("2 4\nfoo 1 2 3 4\nbar 0.5 0 0 -1\nbad 1 2\n", encoding="utf8")
    w2v = read_word2vec(str(p), vector_dimension=4)
    assert set(w2v) == {"foo", "bar"}  # header and short rows skipped
    assert np.allclose(w2v["foo"], [1, 2, 3, 4])


def test_build_alphabet():
    alpha = build_alphabet(["aab", "abc"] * 100 + ["z"])
    assert alpha[0] == "a"  # frequency ordered
    assert "z" in alpha     # min_count-1 style retention at this size


def test_literal_token_matrix():
    w2v = {"hello": np.ones(4, np.float32), "world": 2 * np.ones(4, np.float32)}
    mat = literal_token_matrix(["hello world", "unknown", ""], w2v,
                               tokens_max_len=3, dim=4)
    assert mat.shape == (3, 12)
    assert np.allclose(mat[0, :4], 1) and np.allclose(mat[0, 4:8], 2)
    assert np.allclose(mat[1], 0)


def test_autoencoder_linear_with_thah_typo():
    """encoder_active='thah' must yield a purely linear encoder
    (auto_encoder.py:75-78 matches neither branch)."""
    cfg = small_cfg(encoder_active="thah", encoder_normalize=False)
    x = np.random.RandomState(0).normal(size=(10, 20)).astype(np.float32)
    ae = AutoEncoder(x, cfg, input_dim=20)
    p = ae.params
    w = p["enc_w0"] @ p["enc_w1"] @ p["enc_w2"]
    b = ((p["enc_b0"] @ p["enc_w1"]) + p["enc_b1"]) @ p["enc_w2"] + p["enc_b2"]
    manual = x @ np.asarray(w) + np.asarray(b)
    got = ae.encode(x)
    # stddev-1 normal inits make the composed weights large; compare with a
    # scale-relative tolerance
    scale = np.abs(manual).max()
    assert np.allclose(got, manual, atol=1e-4 * scale)


def test_autoencoder_training_reduces_loss():
    cfg = small_cfg(encoder_active="tanh", learning_rate=0.01)
    rng = np.random.RandomState(1)
    x = rng.normal(size=(100, 20)).astype(np.float32)
    ae = AutoEncoder(x, cfg, input_dim=20)

    def loss_of(params):
        import jax.numpy as jnp
        from multike_tpu.text.autoencoder import decoder_apply, encoder_apply
        h = encoder_apply(params, jnp.asarray(ae.x), ae.act, ae.n_layers)
        h = h / jnp.maximum(jnp.linalg.norm(h), 1e-30)
        dec = decoder_apply(params, h, ae.act, ae.n_layers)
        return float(((dec - ae.x) ** 2).mean())

    before = loss_of(ae.params)
    ae.train(epochs=20)
    after = loss_of(ae.params)
    assert after < before


def test_char_sgns_similar_contexts():
    from multike_tpu.text.char_sgns import train_char_sgns

    # 'a' and 'b' appear in identical contexts; 'z' in a different one.
    words = ["xay", "xby", "pzq"] * 50
    vecs = train_char_sgns(words, dim=16, epochs=100, batch=256, seed=0)
    def cos(u, v):
        return float(np.dot(u, v) / (np.linalg.norm(u) * np.linalg.norm(v) + 1e-9))
    assert cos(vecs["a"], vecs["b"]) > cos(vecs["a"], vecs["z"])


def test_datamodel_end_to_end(tiny_dataset):
    from multike_tpu.data.dataset import DataModel
    from multike_tpu.text.word2vec import read_word2vec

    cfg = Config(training_data=tiny_dataset, dataset_division="631/",
                 dim=8, batch_size=256, encoder_epoch=2,
                 word2vec_dim=300,
                 word2vec_path=tiny_dataset + "mini_word2vec.vec")
    dm = DataModel(cfg)
    n_ents = dm.kgs.entities_num
    assert dm.local_name_vectors.shape == (n_ents, 8)
    # row-normalized (literal_normalize=True default)
    norms = np.linalg.norm(dm.local_name_vectors, axis=1)
    nz = norms[norms > 1e-6]
    assert np.allclose(nz, 1.0, atol=1e-4)
    # attribute values re-indexed to value ids within range
    for (h, a, v) in list(dm.kgs.kg1.local_attribute_triples_set)[:20]:
        assert 0 <= v < dm.value_vectors.shape[0]
    # literal cache written
    import os
    assert os.path.exists(tiny_dataset + "literal_vectors.npy")
    # reload from cache path
    cfg2 = cfg.replace(retrain_literal_embeds=False)
    dm2 = DataModel(cfg2)
    assert np.allclose(dm2.literal_vectors_mat, dm.literal_vectors_mat)
