"""Worker process for the FULL-DRIVER multi-process test
(tests/test_multiprocess.py::test_full_driver_two_processes).

Runs one process of a 2-process jax.distributed CPU job executing the
complete ITC driver (tests/mp_driver_workload.py) over a process-spanning
mesh, then exercises checkpoint RESUME from the epoch-10 checkpoint on a
fresh model. Process 0 writes the final per-view MRRs + resume evidence to
the JSON path in argv.

Usage: mp_driver_worker.py <process_id> <port> <dataset_folder> <ckpt_dir>
                           <out_json> <dp> <tp>
"""
import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
port = sys.argv[2]
folder = sys.argv[3]
ckpt_dir = sys.argv[4]
out_path = sys.argv[5]
dp = int(sys.argv[6])
tp = int(sys.argv[7])

from multike_tpu.parallel.distributed import init_distributed  # noqa: E402

init_distributed(f"127.0.0.1:{port}", 2, pid)
assert jax.process_count() == 2
assert jax.device_count() == 8

import numpy as np  # noqa: E402

from tests.mp_driver_workload import make_cfg, run_driver  # noqa: E402

cfg = make_cfg(folder, ckpt_dir, dp=dp, tp=tp)
model, results = run_driver(cfg)

# resume: a fresh model restores the epoch-10 checkpoint on the same mesh
from multike_tpu.train.itc import MultiKE_ITC  # noqa: E402

m2 = MultiKE_ITC(cfg, model.data, model.predicate_align_model, verbose=False)
resumed = m2.try_resume("itc")
rv1 = model._host(model.params["rv_ent"])
rv2 = m2._host(m2.params["rv_ent"])
resume_exact = bool(np.array_equal(rv1, rv2))

if pid == 0:
    with open(out_path, "w") as f:
        json.dump({"results": results, "resumed_epoch": resumed,
                   "resume_exact": resume_exact}, f)
print(f"[p{pid}] results {results} resumed={resumed} exact={resume_exact}",
      flush=True)
