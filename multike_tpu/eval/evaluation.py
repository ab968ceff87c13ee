"""Thin evaluation wrappers (parity with base/evaluation.py:6-33)."""
from __future__ import annotations

import numpy as np

from multike_tpu.eval.alignment import greedy_alignment


def valid(embeds1, embeds2, mapping, top_k, threads_num, metric: str = "inner",
          normalize: bool = False, csls_k: int = 0, accurate: bool = False,
          **engine_kw):
    if mapping is not None:
        embeds1 = np.asarray(embeds1) @ np.asarray(mapping)
    _, hits1_12, mr_12, mrr_12 = greedy_alignment(
        embeds1, embeds2, top_k, threads_num, metric, normalize, csls_k,
        accurate, **engine_kw)
    return hits1_12, mrr_12


def test(embeds1, embeds2, mapping, top_k, threads_num, metric: str = "inner",
         normalize: bool = False, csls_k: int = 0, accurate: bool = True,
         **engine_kw):
    if mapping is not None:
        embeds1 = np.asarray(embeds1) @ np.asarray(mapping)
    alignment_rest_12, hits1_12, mr_12, mrr_12 = greedy_alignment(
        embeds1, embeds2, top_k, threads_num, metric, normalize, csls_k,
        accurate, **engine_kw)
    return alignment_rest_12, hits1_12, mrr_12


def early_stop(flag1, flag2, flag):
    """Two-step metric-decline rule (base/evaluation.py:28-33). NB the
    reference defines but never arms this (MultiKE_CSL.py:77-78 checks an
    always-False flag). The ITC driver applies it only when
    ``Config.enable_early_stop`` is set, watching ``Config.stop_metric``
    ('mrr' or 'hits1'); default off = reference parity (train to
    max_epoch)."""
    if flag <= flag2 <= flag1:
        print("\n == should early stop == \n")
        return flag2, flag, True
    return flag2, flag, False
