from multike_tpu.eval.evaluation import valid, test, early_stop  # noqa: F401
from multike_tpu.eval.alignment import greedy_alignment, stable_alignment  # noqa: F401
from multike_tpu.eval.similarity import sim, csls_sim  # noqa: F401
