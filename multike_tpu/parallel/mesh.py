"""Device mesh construction and sharding specs.

Design (SURVEY.md §2.3): a 2-D mesh ('dp', 'tp').
  * 'dp' — data parallel over triple batches (the edge-partitioning axis:
    each dp shard owns a contiguous slice of the shuffled triple stream);
    gradients are summed by XLA-inserted collectives over ICI.
  * 'tp' — table parallel: entity/relation/attribute embedding tables are
    row-sharded so table + Adagrad-accumulator memory scales with devices
    (the KGE analog of TP). Gathers of remote rows become XLA all-gathers /
    collective-permutes on ICI.

The reference has no distributed story (host multiprocessing only,
base/batch.py, base/alignment.py); this module is new design, not a port.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * tp
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def param_sharding(mesh: Mesh, name: str, shape) -> NamedSharding:
    """Embedding tables row-sharded over 'tp' (when the row count divides the
    axis — tables whose row count isn't a multiple of tp stay replicated;
    callers wanting strict sharding should pad, see spmd.pad_rows); small
    square mappings and conv params replicated."""
    tp = mesh.shape.get("tp", 1)
    if (name in ("rv_ent", "av_ent", "ent", "rel", "attr") and len(shape) == 2
            and shape[0] % tp == 0):
        return NamedSharding(mesh, P("tp", None))
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    def place(path, leaf):
        name = str(path[0].key) if path else ""
        s = param_sharding(mesh, name, getattr(leaf, "shape", ()))
        return jax.device_put(leaf, s)

    return jax.tree_util.tree_map_with_path(place, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
