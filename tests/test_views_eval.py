"""WVA / view-combination evaluation tests (MultiKE_Late.py:14-173 parity)."""
import numpy as np
import pytest

from multike_tpu.eval.views import _compute_weight, wva

rng = np.random.RandomState(5)


def _norm(x):
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)


def test_compute_weight_matches_reference_formula():
    e1 = rng.randn(20, 6).astype(np.float32)
    e2 = rng.randn(20, 6).astype(np.float32)
    e3 = rng.randn(20, 6).astype(np.float32)
    other = _norm((e1 + e2 + e3) / 3)
    want = float(np.mean(np.diag(_norm(e1) @ other.T)))
    got = _compute_weight(e1, e2, e3)
    assert np.isclose(got, want, rtol=1e-5)


def test_wva_weight_ordering():
    base = rng.randn(30, 8).astype(np.float32)
    # e1 is close to the mean of views; e3 is noise -> w1 > w3
    e1 = base + 0.01 * rng.randn(30, 8).astype(np.float32)
    e2 = base + 0.02 * rng.randn(30, 8).astype(np.float32)
    e3 = rng.randn(30, 8).astype(np.float32)
    w1, w2, w3 = wva(e1, e2, e3)
    assert w1 > w3 and w2 > w3


class _FakeTrainer:
    """Minimal trainer stub exposing current_embeds/kgs/cfg for views eval."""

    def __init__(self, embeds, n):
        from multike_tpu.config import Config

        self._e = embeds
        self.cfg = Config(top_k=[1, 5], test_threads_num=1)
        self.verbose = False

        class K:
            pass

        self.kgs = K()
        idx = list(range(n))
        # disjoint valid/test splits: the valid path stacks valid2+test2 and
        # overlapping ids would create exact-duplicate columns whose tie
        # order is ambiguous (as in the reference's argsort)
        half = n // 2
        self.kgs.valid_entities1 = idx[:half]
        self.kgs.valid_entities2 = idx[:half]
        self.kgs.test_entities1 = idx[half:]
        self.kgs.test_entities2 = idx[half:]

    def current_embeds(self, which):
        return self._e[which]


def test_views_valid_and_wva_on_identical_views():
    from multike_tpu.eval import views as vw

    n, d = 25, 6
    e = rng.randn(n, d).astype(np.float32)
    embeds = {"nv": e, "rv": e.copy(), "av": e.copy(), "final": e.copy()}
    tr = _FakeTrainer(embeds, n)
    assert vw.valid(tr, "nv") == 1.0          # perfect MRR
    assert vw.valid(tr, "avg") == 1.0
    assert vw.valid_WVA(tr) == 1.0
    assert vw.test(tr, "final") == 1.0
