"""Multi-process (2 x jax.distributed CPU processes) equivalence test.

BASELINE config 5 needs multi-host execution; the reference's only analog is
the single-host mp-producer pipeline (MultiKE_Late.py:209-211). Here two
real jax.distributed processes on localhost build a dp=8 mesh (2 processes x
4 virtual CPU devices), edge-partition the host triples per process
(parallel/distributed.local_data_slice -> make_array_from_process_local_data)
and run one rel_view + one common_space epoch; the losses must match a
single-process run of the identical workload (the mesh determinism contract
of parallel/context.py, now across process boundaries and Gloo collectives).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.parametrize("dp,tp,port", [(8, 1, "29517"), (4, 2, "29518")])
def test_two_process_mesh_matches_single_process(tmp_path, dp, tp, port):
    """dp=8 and dp=4 x tp=2 (row-sharded tables + masked-gather/psum +
    tp-offset row-sparse applies) over 2 real jax.distributed processes."""
    out = str(tmp_path / "mp_losses.json")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(_REPO, "tests", "mp_worker.py")
    procs = [subprocess.Popen([sys.executable, worker, str(pid), port, out,
                               str(dp), str(tp)],
                              env=env, cwd=_REPO,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for pid in (0, 1)]
    outputs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=240)
        outputs.append(stdout.decode(errors="replace"))
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{text[-3000:]}"
    with open(out) as f:
        mp_losses = json.load(f)

    # single-process reference of the identical workload (row-sparse path,
    # like the mesh requires) on this process's 8 virtual devices
    from tests.mp_workload import WORKLOAD, run_workload

    cfg = WORKLOAD["cfg"].replace(row_sparse_updates=True)
    ref = run_workload(cfg, None)

    assert np.isclose(mp_losses["rel"], ref["rel"], rtol=2e-4), \
        (mp_losses, ref)
    assert np.isclose(mp_losses["cs"], ref["cs"], rtol=2e-4), (mp_losses, ref)


@pytest.mark.slow
@pytest.mark.parametrize("dp,tp,port", [(8, 1, "29527"), (4, 2, "29528")])
def test_full_driver_two_processes(tmp_path, dp, tp, port):
    """VERDICT r3 item 1: the COMPLETE ITC driver (all 8 streams, truncated
    phase after neighbor refreshes, predicate refresh at epoch 10, eval on
    cadence, checkpoint save + resume) under 2 real jax.distributed CPU
    processes must match the single-process run's final per-view test MRRs,
    with no host touch-point throwing on process-spanning arrays."""
    from multike_tpu.data import synthetic
    from tests.mp_driver_workload import make_cfg, run_driver

    folder = synthetic.generate(str(tmp_path / "ds") + "/", seed=21,
                                n_entities=120)
    out = str(tmp_path / "mp_driver.json")
    ckpt = str(tmp_path / "ckpt_mp")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(_REPO, "tests", "mp_driver_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), port, folder, ckpt, out,
         str(dp), str(tp)],
        env=env, cwd=_REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for pid in (0, 1)]
    outputs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        outputs.append(stdout.decode(errors="replace"))
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{text[-4000:]}"
    with open(out) as f:
        mp = json.load(f)

    assert mp["resumed_epoch"] == 10, mp
    assert mp["resume_exact"], mp

    # single-process reference: identical cfg minus the mesh (row-sparse
    # path retained — the determinism contract makes draws bit-identical)
    cfg = make_cfg(folder, str(tmp_path / "ckpt_sp"), dp=1, tp=1)
    _, ref = run_driver(cfg)
    for view, mrr in ref.items():
        assert abs(mp["results"][view] - mrr) < 0.02, (view, mp["results"], ref)
