"""Multi-host (multi-process) execution.

The reference has no distributed runtime — its scale-out story is four host
``mp.Process`` batch producers feeding one TF session
(``/root/reference/code/MultiKE_Late.py:209-211``, ``base/batch.py:8-54``).
Here a TPU pod slice runs one process per host: call :func:`init_distributed`
once per process before building the mesh, after which ``jax.devices()`` is
the GLOBAL device list, ``MeshContext`` spans all hosts (its 'dp' rows line
up with processes, so edge partitions ride ICI-local traffic), and the jitted
epoch functions run as one SPMD program across the slice.

Host-side data is edge-partitioned: each process materializes only its
:func:`local_data_slice` of the triple arrays and
:func:`make_global_array` assembles the dp-sharded global ``jax.Array``
(``jax.make_array_from_process_local_data`` underneath) — no host ever holds
other hosts' device shards. Replicated tensors (params, small tables,
constants) are built with :func:`make_replicated_array` from identical host
copies.

Tested by the 2-process CPU equivalence test
(``tests/test_multiprocess.py``): two ``jax.distributed`` processes on
localhost run a rel_view + common_space epoch over a dp=8 mesh and match the
single-process losses exactly.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Idempotent jax.distributed.initialize with env fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID); no-op single-host."""
    if num_processes is None:
        num_processes = int(os.environ.get("NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    # idempotence without touching the backend (jax.process_count() would
    # initialize XLA, which must not happen before distributed init)
    from jax._src import distributed as _jax_dist

    if getattr(_jax_dist.global_state, "coordinator_address", None):
        return  # already initialized
    coordinator_address = coordinator_address or os.environ["COORDINATOR_ADDRESS"]
    process_id = process_id if process_id is not None else \
        int(os.environ["PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def local_data_slice(n: int) -> slice:
    """Edge partitioning of a length-n triple list across processes: each
    host owns a contiguous slice (the host-side half of 'shard the triple
    stream over dp')."""
    pc = jax.process_count()
    pi = jax.process_index()
    per = -(-n // pc)
    return slice(pi * per, min((pi + 1) * per, n))


def padded_rows_per_process(n: int) -> int:
    """Global row count after padding ``n`` so every process holds an equal
    contiguous block (process p's block may be partly wraparound padding)."""
    pc = jax.process_count()
    return -(-n // pc) * pc


def make_global_array(mesh, np_local: np.ndarray, global_rows: int):
    """Assemble a global jax.Array row-sharded over the mesh's 'dp' axis
    from this process's local row block (its ``local_data_slice``, padded to
    ``padded_rows_per_process`` rows by the caller). Single-process: a plain
    device_put with the dp sharding."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("dp", *([None] * (np_local.ndim - 1))))
    if not is_multiprocess():
        return jax.device_put(np_local, sharding)
    global_shape = (global_rows,) + np_local.shape[1:]
    return jax.make_array_from_process_local_data(sharding, np_local,
                                                  global_shape)


def make_replicated_array(mesh, np_full: np.ndarray):
    """Fully-replicated global array from an identical full host copy on
    every process."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())
    if not is_multiprocess():
        return jax.device_put(np_full, sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(np_full), np_full.shape)
