"""Scaling measurement (fixed global batch) of the SPMD training step.

On real hardware this is the BASELINE 'triples/s at 1 chip / 1 host /
2 hosts, >=80% scaling' measurement; on the virtual CPU mesh it validates
the *method* (per-dp-size throughput of the identical program).

Usage: python benchmarks/scaling_bench.py [--devices 8] [--batch 4096]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--entities", type=int, default=20000)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true", default=None)
    ns = ap.parse_args()

    import jax

    if ns.cpu or "axon" in os.environ.get("JAX_PLATFORMS", ""):
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={ns.devices}"
            ).strip()
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from multike_tpu.config import Config
    from multike_tpu.params import init_params
    from multike_tpu.parallel.mesh import make_mesh, shard_params
    from multike_tpu.parallel.spmd import make_spmd_train_step

    cfg = Config(dim=75, neg_triple_num=10)
    E, R, A, V = ns.entities, 512, 64, 1024
    rng = np.random.RandomState(0)
    constants = {
        "name_embeds": jnp.asarray(rng.randn(E, cfg.dim), jnp.float32),
        "literal_embeds": jnp.asarray(rng.randn(V, cfg.dim), jnp.float32),
    }

    results = {}
    dp_sizes = [d for d in (1, 2, 4, 8) if d <= len(jax.devices())]
    for dp in dp_sizes:
        mesh = make_mesh(dp, 1)
        params = shard_params(init_params(cfg, E, R, A), mesh)
        step_fn, opt_init = make_spmd_train_step(cfg, mesh, E)
        opt = opt_init(params)
        B = ns.batch
        rel = jnp.asarray(rng.randint(0, [E, R, E], size=(B, 3)), jnp.int32)
        attr = jnp.asarray(rng.randint(0, [E, A, V], size=(B, 3)), jnp.int32)
        w = jnp.ones((B,), jnp.float32)
        ce = jnp.asarray(rng.randint(0, E, size=(B,)), jnp.int32)
        key = jax.random.PRNGKey(0)
        params, opt, key, m = step_fn(params, opt, key, constants, rel, attr,
                                      w, ce)  # compile
        jax.block_until_ready(m["rel_loss"])
        t0 = time.perf_counter()
        for _ in range(ns.steps):
            params, opt, key, m = step_fn(params, opt, key, constants, rel,
                                          attr, w, ce)
        jax.block_until_ready(m["rel_loss"])
        dt = time.perf_counter() - t0
        tps = B * ns.steps / dt
        results[dp] = tps
        print(f"dp={dp}: {tps:,.0f} triples/s", file=sys.stderr, flush=True)

    base = results[dp_sizes[0]]
    effs = {d: results[d] / (base * d) for d in dp_sizes}
    print(json.dumps({
        "metric": "spmd_step_scaling",
        "throughput": {str(d): round(v, 1) for d, v in results.items()},
        "efficiency_vs_dp1": {str(d): round(e, 3) for d, e in effs.items()},
    }))


if __name__ == "__main__":
    main()
