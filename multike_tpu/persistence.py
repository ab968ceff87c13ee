"""Artifact persistence + checkpoint/resume.

Artifact contract matches the reference (utils.py:52-57, 70-91): six ``.npy``
embedding dumps + six id-dict TSVs in a timestamped
``output/<ClassName>/<dataset>/<ts>/`` folder.

Checkpointing goes beyond the reference (which has final-state save only,
SURVEY.md §5): ``save_checkpoint``/``load_checkpoint`` capture all tables,
every stream's Adagrad accumulators, the RNG key and the epoch counter in one
``.npz``, enabling exact resume after preemption.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp


def load_embeddings(file_name: str):
    """base/read.py:6-9."""
    if os.path.exists(file_name):
        return np.load(file_name)
    return None


def pair2file(file: str, pairs) -> None:
    """base/read.py:276-282."""
    if pairs is None:
        return
    with open(file, "w", encoding="utf8") as f:
        for i, j in pairs:
            f.write(f"{i}\t{j}\n")


def line2file(file: str, lines) -> None:
    """base/read.py:295-302."""
    if lines is None:
        return
    with open(file, "w", encoding="utf8") as f:
        for line in lines:
            f.write(line + "\n")


def radio_2file(radio, folder: str) -> str:
    """base/read.py:305-309 (split-ratio subfolder, '.' -> '_')."""
    path = folder + str(radio).replace(".", "_")
    os.makedirs(path, exist_ok=True)
    return path + "/"


def save_results(folder: str, rest_12) -> None:
    """base/read.py:312-316."""
    os.makedirs(folder, exist_ok=True)
    pair2file(os.path.join(folder, "alignment_results_12"), rest_12)
    print("Results saved!")


def dict2file(file: str, dic) -> None:
    if dic is None:
        return
    with open(file, "w", encoding="utf8") as f:
        for i, j in dic.items():
            f.write(f"{i}\t{j}\n")


def generate_out_folder(out_folder: str, training_data_path: str,
                        div_path: str, method_name: str) -> str:
    params = training_data_path.strip("/").split("/")
    path = params[-1]
    folder = os.path.join(out_folder, method_name, path, div_path,
                          time.strftime("%Y%m%d%H%M%S")) + "/"
    return folder


def save_embeddings(folder: str, kgs, ent_embeds, nv_ent_embeds, rv_ent_embeds,
                    av_ent_embeds, rel_embeds, attr_embeds) -> None:
    os.makedirs(folder, exist_ok=True)
    for name, arr in (("ent_embeds", ent_embeds), ("nv_ent_embeds", nv_ent_embeds),
                      ("rv_ent_embeds", rv_ent_embeds),
                      ("av_ent_embeds", av_ent_embeds),
                      ("rel_embeds", rel_embeds), ("attr_embeds", attr_embeds)):
        if arr is not None:
            np.save(os.path.join(folder, name + ".npy"), np.asarray(arr))
    dict2file(os.path.join(folder, "kg1_ent_ids"), kgs.kg1.entities_id_dict)
    dict2file(os.path.join(folder, "kg2_ent_ids"), kgs.kg2.entities_id_dict)
    dict2file(os.path.join(folder, "kg1_rel_ids"), kgs.kg1.relations_id_dict)
    dict2file(os.path.join(folder, "kg2_rel_ids"), kgs.kg2.relations_id_dict)
    dict2file(os.path.join(folder, "kg1_attr_ids"), kgs.kg1.attributes_id_dict)
    dict2file(os.path.join(folder, "kg2_attr_ids"), kgs.kg2.attributes_id_dict)
    print("Embeddings saved!")


# ---------------------------------------------------------------------------
# Checkpoint / resume
# ---------------------------------------------------------------------------

def _flatten_tree(tree, prefix=""):
    """Flatten a pytree of arrays into {path: array}."""
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        key = prefix + "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(path: str, params, opt_states, key, epoch: int,
                    extra: Optional[Dict] = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    arrays.update(_flatten_tree(params, "params:"))
    arrays.update(_flatten_tree(opt_states, "opt:"))
    arrays["rng_key"] = np.asarray(key)
    arrays["epoch"] = np.asarray(epoch)
    meta = json.dumps(extra or {})
    tmp = path + ".tmp.npz"
    np.savez(tmp, __meta__=np.frombuffer(meta.encode(), dtype=np.uint8), **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, params, opt_states, key):
    """Restore into templates (same structure as at save time). Returns
    (params, opt_states, key, epoch, extra)."""
    data = np.load(path, allow_pickle=False)

    def restore(tree, prefix):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
        new_leaves = []
        for path_, leaf in leaves:
            k = prefix + "/".join(str(p) for p in path_)
            if k in data:
                arr = data[k]
            elif prefix == "opt:":
                # Migration: checkpoints written before streams always used
                # plain accumulator dicts for Adagrad stored the optax
                # ScaleByRssState, so the accumulator lived under extra
                # tuple-path components (opt:<stream>/[0]/[0]/<table>).
                # Match by stream head + table tail; adagrad state has
                # exactly one array leaf per table so this is unambiguous.
                head, _, tail = k.rpartition("/")
                cands = [f for f in data.files
                         if f.startswith(head + "/") and f.endswith("/" + tail)]
                if len(cands) != 1:
                    raise KeyError(
                        f"checkpoint missing optimizer entry {k!r} and "
                        f"found {len(cands)} migration candidates {cands}")
                arr = data[cands[0]]
            else:
                raise KeyError(k)
            new_leaves.append(jnp.asarray(arr, dtype=jnp.asarray(leaf).dtype))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    params = restore(params, "params:")
    opt_states = restore(opt_states, "opt:")
    key = jnp.asarray(data["rng_key"], dtype=jnp.asarray(key).dtype)
    epoch = int(data["epoch"])
    extra = json.loads(bytes(data["__meta__"]).decode()) if "__meta__" in data else {}
    return params, opt_states, key, epoch, extra
