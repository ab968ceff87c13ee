"""Multi-device SPMD tests on the virtual 8-device CPU mesh (SURVEY.md §4d)."""
import numpy as np
import pytest

import jax


def test_dryrun_multichip_8():
    import sys
    sys.path.insert(0, "/root/repo")
    from multike_tpu.parallel.spmd import dryrun

    n = len(jax.devices())
    assert n == 8, f"conftest should provide 8 virtual devices, got {n}"
    metrics = dryrun(8)
    assert set(metrics) == {"rel_loss", "attr_loss", "cs_loss", "eval_rows"}


def test_dryrun_single_device_equivalence():
    """The SPMD step on 1 device must match the same step on a (4,2) mesh."""
    from multike_tpu.parallel.spmd import dryrun

    m1 = dryrun(1)
    m8 = dryrun(8)
    for k in ("rel_loss", "attr_loss", "cs_loss"):
        assert np.isclose(m1[k], m8[k], rtol=1e-3), (k, m1[k], m8[k])


def test_graft_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    for o in out:
        assert np.all(np.isfinite(np.asarray(o)))


def test_param_shardings():
    from multike_tpu.config import Config
    from multike_tpu.parallel.mesh import make_mesh, shard_params
    from multike_tpu.params import init_params

    mesh = make_mesh(4, 2)
    params = init_params(Config(dim=8), 64, 8, 4)
    sharded = shard_params(params, mesh)
    # entity table split over tp axis
    s = sharded["rv_ent"].sharding
    assert s.spec == jax.sharding.PartitionSpec("tp", None)
    # conv params replicated
    assert sharded["conv_av"]["dense_w"].sharding.spec == jax.sharding.PartitionSpec()
