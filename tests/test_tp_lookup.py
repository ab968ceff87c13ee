"""Table-parallel lookup tests on the virtual 8-device mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from multike_tpu.parallel.mesh import make_mesh
from multike_tpu.parallel.tp_lookup import make_tp_lookup


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(1, 8)  # pure tp


def test_tp_lookup_matches_dense(mesh):
    E, d, B = 64, 16, 40
    rng = np.random.RandomState(0)
    table = rng.randn(E, d).astype(np.float32)
    ids = rng.randint(0, E, B).astype(np.int32)
    sharded = jax.device_put(jnp.asarray(table),
                             NamedSharding(mesh, P("tp", None)))
    lookup = jax.jit(make_tp_lookup(mesh))
    got = np.asarray(lookup(sharded, jnp.asarray(ids)))
    np.testing.assert_allclose(got, table[ids], rtol=1e-6)


def test_tp_lookup_normalized(mesh):
    E, d, B = 32, 8, 10
    rng = np.random.RandomState(1)
    table = rng.randn(E, d).astype(np.float32)
    ids = rng.randint(0, E, B).astype(np.int32)
    sharded = jax.device_put(jnp.asarray(table),
                             NamedSharding(mesh, P("tp", None)))
    lookup = jax.jit(make_tp_lookup(mesh, normalize=True))
    got = np.asarray(lookup(sharded, jnp.asarray(ids)))
    want = table[ids]
    want = want / np.linalg.norm(want, axis=1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_tp_lookup_gradient_is_sharded_scatter(mesh):
    """Gradient w.r.t. the sharded table equals the dense scatter-add."""
    E, d, B = 24, 4, 12
    rng = np.random.RandomState(2)
    table = rng.randn(E, d).astype(np.float32)
    ids = rng.randint(0, E, B).astype(np.int32)
    cotangent = rng.randn(B, d).astype(np.float32)
    sharded = jax.device_put(jnp.asarray(table),
                             NamedSharding(mesh, P("tp", None)))
    lookup = make_tp_lookup(mesh)

    def loss(tbl):
        return jnp.sum(lookup(tbl, jnp.asarray(ids)) * jnp.asarray(cotangent))

    grad = np.asarray(jax.jit(jax.grad(loss))(sharded))
    want = np.zeros_like(table)
    np.add.at(want, ids, cotangent)
    np.testing.assert_allclose(grad, want, rtol=1e-5, atol=1e-6)
