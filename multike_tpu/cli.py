"""CLI entry: ``python -m multike_tpu.cli -m {ITC,SSL} -d <data-folder>``.

Parity with run.sh:26-34 + run_ITC.py/run_SSL.py: loads the JSON config
(default ``args.json`` next to this package or given via ``--args``),
overrides ``training_data`` from the CLI, builds DataModel +
PredicateAlignModel + the mode's trainer and runs it.
"""
from __future__ import annotations

import argparse
import os

from multike_tpu.config import Config, load_config


def main(argv=None):
    ap = argparse.ArgumentParser(description="MultiKE-TPU")
    ap.add_argument("-m", "--mode", choices=["ITC", "SSL"], required=True)
    ap.add_argument("-d", "--training_data", type=str, required=True)
    ap.add_argument("--args", type=str, default=None,
                    help="path to a reference-format args.json")
    ap.add_argument("--max_epoch", type=int, default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    help="override any Config field, e.g. --set dim=32")
    ns = ap.parse_args(argv)

    if ns.args and os.path.exists(ns.args):
        cfg = load_config(ns.args)
    else:
        cfg = Config()
    overrides = {"training_data": ns.training_data}
    if not overrides["training_data"].endswith("/"):
        overrides["training_data"] += "/"
    if ns.max_epoch is not None:
        overrides["max_epoch"] = ns.max_epoch
    if ns.seed is not None:
        overrides["seed"] = ns.seed
    import dataclasses as _dc

    field_types = {f.name: f.type for f in _dc.fields(Config)}
    for kv in ns.set:
        key, _, val = kv.partition("=")
        if key not in field_types:
            ap.error(f"unknown config field {key!r}")
        current = getattr(cfg, key)
        if isinstance(current, bool):
            overrides[key] = val.lower() in ("1", "true", "yes")
        elif isinstance(current, int):
            overrides[key] = int(val)
        elif isinstance(current, float):
            overrides[key] = float(val)
        elif isinstance(current, list):
            overrides[key] = [int(x) for x in val.split(",")]
        else:
            overrides[key] = val
    cfg = cfg.replace(**overrides)

    # Multi-host launch (one process per host on a pod slice): export
    # COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID before invoking the
    # CLI on every host; a single-process run is a no-op. Must happen before
    # any device use so jax.devices() is the global list.
    from multike_tpu.parallel.distributed import init_distributed

    init_distributed()

    from multike_tpu.align.predicates import PredicateAlignModel
    from multike_tpu.data.dataset import DataModel

    data = DataModel(cfg, verbose=True)
    pam = PredicateAlignModel(data.kgs, cfg)

    if ns.mode == "ITC":
        from multike_tpu.train.itc import MultiKE_ITC as Model
    else:
        from multike_tpu.train.ssl import MultiKE_SSL as Model
    model = Model(cfg, data, pam)
    results = model.run()
    print("final test MRRs:", results)
    return results


if __name__ == "__main__":
    main()
