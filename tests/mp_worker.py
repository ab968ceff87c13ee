"""Worker process for tests/test_multiprocess.py.

Runs one process of a 2-process jax.distributed CPU job: a dp=8 mesh
spanning 2 processes x 4 virtual devices, one rel_view epoch plus one
common_space epoch of the REAL stream builders, host triples edge-
partitioned per process (parallel/distributed.local_data_slice). Process 0
writes the losses to the JSON path in argv[3]; the parent compares them to a
single-process run (replacing the reference's mp-producer pipeline,
/root/reference/code/MultiKE_Late.py:209-211, end-to-end).

Usage: mp_worker.py <process_id> <port> <out_json> [dp] [tp]
"""
import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]
dp = int(sys.argv[4]) if len(sys.argv) > 4 else 8
tp = int(sys.argv[5]) if len(sys.argv) > 5 else 1

from multike_tpu.parallel.distributed import init_distributed  # noqa: E402

init_distributed(f"127.0.0.1:{port}", 2, pid)
assert jax.process_count() == 2
assert jax.device_count() == 8

import numpy as np  # noqa: E402

from multike_tpu.config import Config  # noqa: E402
from multike_tpu.parallel.context import MeshContext  # noqa: E402
from multike_tpu.params import init_params  # noqa: E402
from multike_tpu.train import streams  # noqa: E402
from tests.mp_workload import WORKLOAD, run_workload  # noqa: E402

cfg = WORKLOAD["cfg"].replace(mesh_dp=dp, mesh_tp=tp,
                              row_sparse_updates=True)
pctx = MeshContext.from_config(cfg)
losses = run_workload(cfg, pctx)
if pid == 0:
    with open(out_path, "w") as f:
        json.dump(losses, f)
print(f"[p{pid}] losses {losses}", flush=True)
