"""Eval-engine micro-benchmark: blockwise rank-count at DWY100K test scale.

The reference materializes the full similarity matrix and argsorts every row
across an mp.Pool (base/alignment.py:37-56) — at 70K x 70K that is ~19.6 GB
plus 70K argsorts. This engine computes exact ranks via blockwise
count-greater with no matrix and no sort.

Usage: python benchmarks/eval_bench.py [--n1 35000 --n2 70000 --dim 75]
Prints one human-readable line per phase (stderr) and a final JSON line.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n1", type=int, default=35_000)
    ap.add_argument("--n2", type=int, default=70_000)
    ap.add_argument("--dim", type=int, default=75)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dtype", choices=["float32", "bfloat16"],
                    default="float32", help="engine matmul dtype")
    ap.add_argument("--parity", action="store_true",
                    help="run BOTH dtypes and report bf16-vs-f32 rank parity")
    ns = ap.parse_args()

    if ns.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from multike_tpu.eval.alignment import rank_and_align

    log(f"backend: {jax.default_backend()}")
    rng = np.random.RandomState(0)
    e1 = rng.randn(ns.n1, ns.dim).astype(np.float32)
    e2 = rng.randn(ns.n2, ns.dim).astype(np.float32)
    e2[:ns.n1] += 2.0 * e1

    t = time.perf_counter()
    ranks, best = rank_and_align(e1, e2)
    warm = time.perf_counter() - t
    log(f"compile+run: {warm:.2f}s")
    t = time.perf_counter()
    ranks, best = rank_and_align(e1, e2)
    hot = time.perf_counter() - t
    hits1 = float(np.mean(ranks == 0))
    rows_per_s = ns.n1 / hot
    log(f"hot (incl. host->device upload): {hot:.3f}s  "
        f"({rows_per_s:,.0f} rows/s, hits@1={hits1:.3f})")

    # Engine-only: device-resident normalized embeddings -> _rank_all. The
    # end-to-end number above includes re-uploading both embedding matrices
    # from host numpy each call — ~3 ms on real TPU PCIe but ~1.8 s over the
    # axon tunnel, so the split matters for interpreting axon measurements.
    import jax.numpy as jnp

    from multike_tpu.eval.alignment import _eval_row_block, _rank_all

    d1 = jnp.asarray(e1)
    d2 = jnp.asarray(e2)
    d1 = d1 / jnp.linalg.norm(d1, axis=1, keepdims=True)
    d2 = d2 / jnp.linalg.norm(d2, axis=1, keepdims=True)
    rb = _eval_row_block(ns.n1, ns.n2)

    def engine_run(dtype, reps=3):
        """Times the engine at ``dtype`` (bf16 casts the operands; the MXU
        accumulates in f32 either way) and returns (seconds, ranks)."""
        a1, a2 = d1.astype(dtype), d2.astype(dtype)
        gold = jnp.sum(a1 * a2[:ns.n1], axis=1).astype(jnp.float32)
        cnt, _ = _rank_all(a1, gold, a2, None, rb)
        np.asarray(cnt)
        t = time.perf_counter()
        for _ in range(reps):
            cnt, bidx = _rank_all(a1, gold, a2, None, rb)
        np.asarray(cnt), np.asarray(bidx)
        return (time.perf_counter() - t) / reps, np.asarray(cnt)

    dtype = jnp.bfloat16 if ns.dtype == "bfloat16" else jnp.float32
    hot_engine, ranks_main = engine_run(dtype)
    engine_rows_per_s = ns.n1 / hot_engine
    log(f"engine-only ({ns.dtype}): {hot_engine:.3f}s  "
        f"({engine_rows_per_s:,.0f} rows/s)")
    out = {
        "metric": "eval_rank_rows_per_s",
        "value": round(engine_rows_per_s, 1),
        "unit": f"rows/s @ n2={ns.n2}, d={ns.dim}",
        "dtype": ns.dtype,
        "seconds_hot_engine": round(hot_engine, 4),
        "seconds_hot_with_upload": round(hot, 4),
        "hits1": hits1,
    }
    if ns.parity:
        other = jnp.float32 if dtype == jnp.bfloat16 else jnp.bfloat16
        hot_other, ranks_other = engine_run(other)
        mrr = float(np.mean(1.0 / (1.0 + ranks_main)))
        mrr_o = float(np.mean(1.0 / (1.0 + ranks_other)))
        agree = float(np.mean(ranks_main == ranks_other))
        h1 = float(np.mean(ranks_main == 0))
        h1_o = float(np.mean(ranks_other == 0))
        name_o = "bfloat16" if other == jnp.bfloat16 else "float32"
        log(f"parity vs {name_o}: rank agreement {agree:.4f}, "
            f"hits@1 {h1:.4f} vs {h1_o:.4f}, mrr {mrr:.5f} vs {mrr_o:.5f}, "
            f"{hot_other:.3f}s")
        out["parity"] = {
            "other_dtype": name_o,
            "seconds_hot_engine_other": round(hot_other, 4),
            "rank_agreement": round(agree, 5),
            "hits1_delta": round(h1 - h1_o, 5),
            "mrr_delta": round(mrr - mrr_o, 6),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
