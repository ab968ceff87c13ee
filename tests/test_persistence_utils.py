"""Persistence + util API surface tests (save/load, checkpoints, word2vec
lookup variants, profiling helpers)."""
import os

import numpy as np
import pytest

from multike_tpu.persistence import (dict2file, line2file, load_embeddings,
                                     pair2file, radio_2file, save_results)
from multike_tpu.text.word2vec import (look_up_char2vec, look_up_word2vec,
                                       tokens2vec_add, tokens2vec_encoder)


def test_pair_line_dict_files(tmp_path):
    p = str(tmp_path / "pairs")
    pair2file(p, [(1, 2), (3, 4)])
    assert open(p).read() == "1\t2\n3\t4\n"
    l = str(tmp_path / "lines")
    line2file(l, ["a", "b"])
    assert open(l).read() == "a\nb\n"
    d = str(tmp_path / "dict")
    dict2file(d, {"x": 1})
    assert open(d).read() == "x\t1\n"


def test_radio_2file_and_save_results(tmp_path):
    folder = radio_2file(0.3, str(tmp_path) + "/")
    assert folder.endswith("0_3/") and os.path.isdir(folder)
    save_results(str(tmp_path / "res"), {(0, 1)})
    assert os.path.exists(tmp_path / "res" / "alignment_results_12")


def test_load_embeddings(tmp_path):
    assert load_embeddings(str(tmp_path / "missing.npy")) is None
    arr = np.ones((3, 2), np.float32)
    np.save(tmp_path / "e.npy", arr)
    assert np.array_equal(load_embeddings(str(tmp_path / "e.npy")), arr)


def test_tokens2vec_add():
    w2v = {"a": np.array([3.0, 4.0], np.float32)}
    out = tokens2vec_add({1: "a a", 2: "zzz"}, w2v, vector_dimension=2)
    assert set(out) == {1}
    assert np.allclose(np.linalg.norm(out[1]), 1.0)  # normalized
    out2 = tokens2vec_add({2: "zzz"}, w2v, vector_dimension=2, keep_unlist=True)
    assert np.allclose(out2[2], 0)


def test_tokens2vec_encoder_and_lookup():
    w2v = {"a": np.ones(2, np.float32)}
    out = look_up_word2vec({1: "a b"}, w2v, tokens2vec_mode="encoder",
                           vector_dimension=2, tokens_max_len=3)
    assert out[1].shape == (3, 2)
    assert np.allclose(out[1][0], 1) and np.allclose(out[1][1], 0)
    out_add = look_up_word2vec({1: "a"}, w2v, vector_dimension=2)
    assert out_add[1].shape == (2,)


def test_look_up_char2vec():
    cv = {"a": np.array([1.0, 0.0], np.float32)}
    out = look_up_char2vec({1: "aa", 2: "zz"}, cv, vector_dimension=2)
    assert np.allclose(out[1], [1, 0])
    assert np.allclose(out[2], 0)


def test_step_timer():
    from multike_tpu.utils.profiling import StepTimer

    st = StepTimer()
    with st.measure("x"):
        pass
    with st.measure("x"):
        pass
    assert st.counts["x"] == 2
    assert "x: total" in st.summary()


def test_driver_resume(tmp_path, trained_like=None):
    """ITC driver resumes from a checkpoint written mid-run."""
    import jax

    from multike_tpu.align.predicates import PredicateAlignModel
    from multike_tpu.config import Config
    from multike_tpu.data import synthetic
    from multike_tpu.data.dataset import DataModel
    from multike_tpu.train.itc import MultiKE_ITC

    folder = synthetic.generate(str(tmp_path / "ds") + "/", seed=5,
                                n_entities=60, n_rel_triples=200,
                                n_attr_triples=120)
    cfg = Config(training_data=folder, dim=8, batch_size=100,
                 entity_batch_size=64, attribute_batch_size=100,
                 encoder_epoch=1, neg_triple_num=2, max_epoch=2,
                 start_valid=99, eval_freq=99, truncated_freq=99,
                 start_predicate_soft_alignment=99,
                 checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_freq=1,
                 is_save=False, word2vec_path=folder + "mini_word2vec.vec")
    data = DataModel(cfg)
    pam = PredicateAlignModel(data.kgs, cfg)
    m1 = MultiKE_ITC(cfg, data, pam, verbose=False)
    m1.run()
    # fresh model resumes from epoch 2's checkpoint
    m2 = MultiKE_ITC(cfg, data, pam, verbose=False)
    resumed = m2.try_resume("itc")
    assert resumed == 2
    np.testing.assert_array_equal(np.asarray(m2.params["rv_ent"]),
                                  np.asarray(m1.params["rv_ent"]))


def test_checkpoint_migration_from_optax_state(tmp_path):
    """Checkpoints written by pre-r4 builds stored the optax ScaleByRssState
    for Adagrad; load_checkpoint must migrate them into the plain
    accumulator-dict template (ADVICE r3)."""
    import optax

    import jax
    import jax.numpy as jnp

    from multike_tpu.persistence import load_checkpoint, save_checkpoint

    rng = np.random.RandomState(3)
    params = {"rv_ent": jnp.asarray(rng.randn(6, 4), jnp.float32)}
    opt = optax.adagrad(0.1, initial_accumulator_value=0.1)
    old_state = {"rel_view": opt.init({"rv_ent": params["rv_ent"]})}
    path = str(tmp_path / "old.npz")
    save_checkpoint(path, params, old_state, jax.random.PRNGKey(0), 3)

    new_template = {"rel_view": {"rv_ent": jnp.zeros((6, 4), jnp.float32)}}
    p2, s2, _, epoch, _ = load_checkpoint(path, params, new_template,
                                          jax.random.PRNGKey(0))
    assert epoch == 3
    want_acc = old_state["rel_view"][0].sum_of_squares["rv_ent"]
    np.testing.assert_array_equal(np.asarray(s2["rel_view"]["rv_ent"]),
                                  np.asarray(want_acc))
