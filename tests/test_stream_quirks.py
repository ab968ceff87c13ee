"""Pin the reference's batching quirks in the stream builders."""
import numpy as np

from multike_tpu.config import Config
from multike_tpu.train import streams


def test_attr_view_steps_batch_size_quirk():
    """Steps counted with batch_size but slices sized with
    attribute_batch_size (MultiKE_Late.py:206 vs MultiKE_model.py:330)."""
    cfg = Config(batch_size=100, attribute_batch_size=60)
    _, steps, trained = streams.build_attr_view_epoch(cfg, n1=300, n2=300)
    assert steps == int(np.ceil(600 / 100)) == 6
    # slice sizes derive from attribute_batch_size: 30 + 30 per step
    assert trained == min(300, 6 * 30) + min(300, 6 * 30) == 360


def test_rel_view_proportional_split():
    """Proportional kg1/kg2 batch mix (base/batch.py:36-37)."""
    bs1, bs2 = streams.proportional_sizes(300, 100, 80)
    assert bs1 == int(300 / 400 * 80) == 60
    assert bs2 == 20


def test_sampled_epoch_single_step_uses_full_set():
    """steps==1 => batch is the whole set (MultiKE_model.py:356)."""
    cfg = Config(batch_size=5000)
    _, steps, trained = streams.build_ckge_rel_epoch(cfg, 123)
    assert steps == 1 and trained == 123


def test_bucket_capacity_monotone():
    from multike_tpu.train.trainer import MultiKETrainer

    caps = [MultiKETrainer._bucket_capacity(n) for n in range(1, 20000, 137)]
    for n, c in zip(range(1, 20000, 137), caps):
        assert c >= n
        # pad < granularity g = max(256, 2^(floor(log2 n) - 3)) <= max(256, n/8)
        assert c < n + max(256, n / 8) + 1
    # bucketing collapses many sizes to few capacities
    assert len(set(caps)) < len(caps) / 3
