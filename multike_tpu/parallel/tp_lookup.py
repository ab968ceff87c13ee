"""Table-parallel embedding lookup under shard_map.

The KGE analog of tensor parallelism (SURVEY.md §2.3 row 5): entity/relation
tables are row-sharded over the 'tp' mesh axis so table + Adagrad memory
scale with devices. A batch gather of arbitrary ids then needs cross-device
data. The naive XLA lowering all-gathers the WHOLE table per step
(O(E*d) bytes over ICI); this primitive moves only the batch:

    local = where(owned(ids), my_shard[ids - lo], 0)     # local masked gather
    rows  = psum(local, 'tp')                            # (B, d) over ICI

O(B*d) bytes per device — for B=55K, d=75 that's ~16 MB vs 30+ MB/table
all-gather, and independent of table size. The backward pass under shard_map
autodiff is the transpose: each device keeps only the gradient rows it owns —
exactly the sparse-Adagrad-compatible scatter.

``tp_lookup_norm`` fuses the reference's normalize-on-read
(base/initializers.py:22-26) after the psum.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from multike_tpu.params import l2_normalize


def _masked_local_gather(shard: jnp.ndarray, ids: jnp.ndarray,
                         axis_name: str) -> jnp.ndarray:
    """Inside shard_map: shard (rows_per_dev, d) of the row-sharded table;
    ids (B,) global row ids. Returns the full (B, d) gathered rows after a
    psum over ``axis_name``."""
    rows_per_dev = shard.shape[0]
    idx = jax.lax.axis_index(axis_name)
    lo = idx * rows_per_dev
    local_ids = ids - lo
    owned = (local_ids >= 0) & (local_ids < rows_per_dev)
    safe = jnp.clip(local_ids, 0, rows_per_dev - 1)
    local = jnp.where(owned[:, None], shard[safe], 0.0)
    return jax.lax.psum(local, axis_name)


def make_tp_lookup(mesh: Mesh, axis_name: str = "tp", normalize: bool = False,
                   batch_axis: str | None = None):
    """Returns lookup(table, ids) -> (B, d) where ``table`` is sharded
    P(axis_name, None); ``ids`` and the output are replicated over
    ``axis_name`` and optionally sharded over ``batch_axis`` (the dp axis),
    so each dp group gathers only its own batch slice."""
    ids_spec = P(batch_axis) if batch_axis else P()
    out_spec = P(batch_axis, None) if batch_axis else P()

    def inner(shard, ids):
        rows = _masked_local_gather(shard, ids, axis_name)
        if normalize:
            rows = l2_normalize(rows, axis=-1)
        return rows

    lookup = shard_map(
        inner, mesh=mesh,
        in_specs=(P(axis_name, None), ids_spec),
        out_specs=out_spec,
        check_rep=False,
    )
    return lookup


def tp_lookup(mesh: Mesh, table: jnp.ndarray, ids: jnp.ndarray,
              axis_name: str = "tp", normalize: bool = False) -> jnp.ndarray:
    """One-shot convenience wrapper (jit-compatible)."""
    return make_tp_lookup(mesh, axis_name, normalize)(table, ids)
