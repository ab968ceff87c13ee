"""Multi-host initialization.

The reference has no distributed runtime (host multiprocessing only,
SURVEY.md §2.3). On a TPU pod slice, call ``init_distributed()`` once per
host before building the mesh: JAX wires the hosts together and
``jax.devices()`` becomes the global device list; ICI carries the
collectives the SPMD step needs, DCN only carries inter-slice traffic.
"""
from __future__ import annotations

import os
from typing import Optional

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
    coordinator_address = coordinator_address or os.environ["COORDINATOR_ADDRESS"]
    process_id = process_id if process_id is not None else \
        int(os.environ["PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def local_data_slice(n: int) -> slice:
    """Edge partitioning of a length-n triple list across processes: each
    host owns a contiguous slice (the host-side half of 'shard the triple
    stream over dp')."""
    pc = jax.process_count()
    pi = jax.process_index()
    per = -(-n // pc)
    return slice(pi * per, min((pi + 1) * per, n))
