"""Benchmark: relation-view TransE training throughput (triples/s/chip).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "triples/s/chip", "vs_baseline": N}

The workload is the reference's hot loop (MultiKE_model.py:291-317: batch of
5000 positives + 10 negatives each, TransE logistic loss, Adagrad) on a
DWY100K-sized synthetic KG pair (100K entities and ~600K triples PER KG —
DWY100K is ~100K entities per side, reference README.md:4-22; 200K entities /
1.2M triples total). Our
number is the whole-epoch jitted scan on the TPU chip; ``vs_baseline`` is the
speedup over a faithful torch-CPU implementation of the same math run on this
host — the reference is a CPU/feed-dict TF1 trainer, so a same-host CPU
autograd+Adagrad loop is the closest measurable stand-in (the reference repo
publishes no numbers, BASELINE.md).

All progress chatter goes to stderr; stdout carries only the JSON line.
"""
import argparse
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe_tpu_alive(timeout_s: int = 90) -> bool:
    """Run a trivial jit in a subprocess with a timeout. The axon tunnel can
    wedge (e.g. after a Mosaic kernel execution elsewhere); a wedged device
    hangs every call, so probe out-of-process before committing to it."""
    import subprocess

    code = ("import jax, jax.numpy as jnp;"
            "print(float(jax.jit(lambda x:(x@x).sum())(jnp.ones((64,64)))))")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


_CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".bench_last_tpu.json")


def ensure_usable_backend(max_wait_s: int = 600) -> bool:
    """If the TPU tunnel is wedged, wait for recovery (probing), then fall
    back to CPU so the bench reports *something* instead of hanging.
    Returns True when the TPU is usable."""
    if os.environ.get("MULTIKE_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
        log("forced CPU backend")
        return False
    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return True
    waited = 0
    while waited <= max_wait_s:
        if probe_tpu_alive():
            return True
        log(f"TPU probe failed; waiting for tunnel recovery ({waited}s)...")
        time.sleep(60)
        waited += 150  # probe timeout + sleep
    log("TPU unusable; falling back to CPU backend")
    import jax

    jax.config.update("jax_platforms", "cpu")
    return False


def enable_compile_cache():
    """First axon-tunnel compile takes minutes; persist compiled executables
    so driver re-runs start hot."""
    import jax

    cache_dir = os.environ.get("MULTIKE_JAX_CACHE",
                               os.path.join(os.path.dirname(
                                   os.path.abspath(__file__)), ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never fatal
        log("compile cache unavailable:", e)


_BAND_STAMP = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".band_last.json")


def run_band_check(timeout_s: int = 900, max_age_s: int = 20 * 3600):
    """Scheduled 20K-entity quality-band check (VERDICT r4 item 6): the
    truncated-phase-at-scale surface (benchmarks/quality_at_scale.py
    --check-band) runs whenever the TPU-backed bench runs, so it is
    exercised every round instead of only when someone exports
    MULTIKE_SCALE_TEST=1. A recent result (< max_age_s) is reused so
    back-to-back bench invocations in one round pay the ~6 min only once.
    Returns a small status dict for the bench JSON; never raises."""
    import subprocess

    if os.environ.get("MULTIKE_SKIP_BAND"):
        return {"status": "skipped_env"}
    try:
        with open(_BAND_STAMP) as f:
            last = json.load(f)
        if time.time() - last.get("time", 0) < max_age_s:
            last["status"] = last.get("status", "ok") + "_cached"
            return last
    except (OSError, ValueError):
        pass
    here = os.path.dirname(os.path.abspath(__file__))
    cmd = [sys.executable, os.path.join(here, "benchmarks",
                                        "quality_at_scale.py"),
           "--entities", "20000", "--epochs", "25", "--check-band",
           "--out", "/tmp/band_check_20k.json"]
    log("running 20K quality-band check (~6 min; MULTIKE_SKIP_BAND=1 skips)")
    try:
        r = subprocess.run(cmd, timeout=timeout_s, capture_output=True,
                           text=True)
        status = "ok" if r.returncode == 0 else "VIOLATION"
        views = None
        try:
            with open("/tmp/band_check_20k.json") as f:
                views = {k: v["test_mrr"]
                         for k, v in json.load(f)["views"].items()}
        except (OSError, ValueError, KeyError):
            pass
        if r.returncode != 0:
            log("band check stderr tail:", r.stderr[-500:])
        out = {"status": status, "views": views, "time": time.time()}
    except subprocess.TimeoutExpired:
        out = {"status": "timeout", "time": time.time()}
    try:
        with open(_BAND_STAMP, "w") as f:
            json.dump(out, f)
    except OSError:
        pass
    return out


def synthetic_triples(rng, n_triples, ent_lo, ent_hi, n_rel, rel_lo):
    h = rng.randint(ent_lo, ent_hi, size=n_triples)
    t = rng.randint(ent_lo, ent_hi, size=n_triples)
    r = rng.randint(rel_lo, rel_lo + n_rel, size=n_triples)
    return np.stack([h, r, t], axis=1).astype(np.int32)


def device_peak_flops():
    """Rough bf16 MXU peak of the attached chip, for the MFU line. Known
    kinds only; 0 (=unknown) suppresses the MFU field."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = {"v5 lite": 197e12, "v5e": 197e12, "v4": 275e12,
             "v5p": 459e12, "v6": 918e12, "v6 lite": 918e12}
    for k, v in table.items():
        if k in kind:
            return v
    return 0.0


def device_peak_hbm_bytes():
    """HBM bandwidth peak of the attached chip (bytes/s). This — not FLOPs —
    is the honest denominator for a d=75 gather/scatter workload (VERDICT r4
    weak 5): the step is memory-bound, so achieved-GB/s vs HBM peak is the
    efficiency lens."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = {"v5 lite": 819e9, "v5e": 819e9, "v4": 1228e9,
             "v5p": 2765e9, "v6": 1640e9, "v6 lite": 1640e9}
    for k, v in table.items():
        if k in kind:
            return v
    return 0.0


def bench_jax(cfg, triples1, triples2, ranges, epochs, warmup=1,
              truncated=False):
    """Measures the trainer's REAL rel_view epoch fn, default path: Bloom
    exact-rejection on (cfg.neg_rejection_tries=10, like the trainer builds
    it). ``truncated=True`` measures the post-neighbor-refresh phase
    instead: per_slot sampling over a dense NeighborState whose rows cover
    the 'useful' entities (the phase the reference spends most epochs in,
    args.json:26-28)."""
    import jax
    import jax.numpy as jnp

    from multike_tpu.params import init_params
    from multike_tpu.sampling import build_triple_filter
    from multike_tpu.train import streams

    entities_num = ranges[1][1]
    relations_num = int(max(triples1[:, 1].max(), triples2[:, 1].max())) + 1
    params = init_params(cfg, entities_num, relations_num, 2)
    opt_states = streams.init_stream_opt_states(cfg, params)
    key = jax.random.PRNGKey(0)
    t1 = jnp.asarray(triples1)
    t2 = jnp.asarray(triples2)
    tfilter = None
    if cfg.neg_rejection_tries > 0:
        tfilter = build_triple_filter(np.concatenate([triples1, triples2]))
    epoch_fn, steps, trained = streams.build_rel_view_epoch(
        cfg, len(triples1), len(triples2), ranges,
        with_neighbors=truncated, tfilter=tfilter)

    args = (t1, t2)
    if truncated:
        from multike_tpu.sampling import build_neighbor_state

        # DWY100K-shaped: 'useful' entities = ~30% of each KG, k = top 2%
        rng = np.random.RandomState(3)
        parts = []
        for lo, hi in ranges:
            n_useful = (hi - lo) * 3 // 10
            k = max(1, (hi - lo) // 50)
            useful = lo + rng.permutation(hi - lo)[:n_useful]
            nbr = lo + rng.randint(0, hi - lo, size=(n_useful, k))
            parts.append((useful.astype(np.int64), nbr.astype(np.int32)))
        neighbors = build_neighbor_state(entities_num, parts)
        args = args + (neighbors,)

    opt = opt_states["rel_view"]
    # XLA's own FLOP count of the whole-epoch executable (counts matmul +
    # elementwise flops of forward, backward and the optimizer — everything
    # the chip actually executes), for the FLOP/s / MFU line.
    epoch_flops = epoch_bytes = 0.0
    try:
        ca = epoch_fn.lower(params, opt, key, *args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        epoch_flops = float(ca.get("flops", 0.0))
        # XLA's own count of memory traffic for the whole-epoch executable
        # (operand + output bytes of every HLO it actually runs) — the
        # numerator of the achieved-GB/s line.
        epoch_bytes = float(ca.get("bytes accessed", 0.0))
    except Exception as e:
        log("cost_analysis unavailable:", e)
    for _ in range(warmup):
        params, opt, key, loss = epoch_fn(params, opt, key, *args)
    float(loss)  # force (block_until_ready does not sync the axon tunnel)
    tag = "truncated" if truncated else "uniform"
    log(f"jax warmup done ({tag}), steps/epoch={steps}, loss={float(loss):.1f}")

    t0 = time.perf_counter()
    for _ in range(epochs):
        params, opt, key, loss = epoch_fn(params, opt, key, *args)
    float(loss)
    dt = time.perf_counter() - t0
    tps = trained * epochs / dt
    flops_per_s = epoch_flops * epochs / dt
    bytes_per_s = epoch_bytes * epochs / dt
    log(f"jax ({tag}): {epochs} epochs in {dt:.3f}s -> {tps:,.0f} triples/s"
        f", {flops_per_s / 1e12:.3f} TFLOP/s, {bytes_per_s / 1e9:.1f} GB/s "
        f"(XLA-counted)")
    return tps, flops_per_s, bytes_per_s


def bench_torch_cpu(cfg, triples1, triples2, ranges, steps):
    """Reference-math stand-in: TF1-style feed loop — host negative sampling,
    gather + TransE logistic loss + Adagrad(acc0=0.1) via torch CPU."""
    import torch

    torch.set_num_threads(max(1, len(__import__("os").sched_getaffinity(0))))
    entities_num = ranges[1][1]
    relations_num = int(max(triples1[:, 1].max(), triples2[:, 1].max())) + 1
    dim = cfg.dim
    g = torch.Generator().manual_seed(0)
    rv = torch.nn.Parameter(torch.randn(entities_num, dim, generator=g) * 0.01)
    rel = torch.nn.Parameter(torch.randn(relations_num, dim, generator=g) * 0.01)
    opt = torch.optim.Adagrad([rv, rel], lr=cfg.learning_rate,
                              initial_accumulator_value=0.1)
    rng = np.random.RandomState(0)
    bs = cfg.batch_size
    bs1 = int(len(triples1) / (len(triples1) + len(triples2)) * bs)
    bs2 = bs - bs1
    k = cfg.neg_triple_num
    (lo1, hi1), (lo2, hi2) = ranges

    def norm_rows(x):
        return torch.nn.functional.normalize(x, dim=1)

    t0 = time.perf_counter()
    done = 0
    for i in range(steps):
        i1 = rng.randint(0, len(triples1), bs1)
        i2 = rng.randint(0, len(triples2), bs2)
        pos = np.concatenate([triples1[i1], triples2[i2]])
        neg = np.repeat(pos, k, axis=0)
        corrupt = rng.rand(len(neg)) < 0.5
        lo = np.concatenate([np.full(bs1 * k, lo1), np.full(bs2 * k, lo2)])
        hi = np.concatenate([np.full(bs1 * k, hi1), np.full(bs2 * k, hi2)])
        cand = lo + rng.randint(0, 1 << 30, len(neg)) % (hi - lo)
        neg[corrupt, 0] = cand[corrupt]
        neg[~corrupt, 2] = cand[~corrupt]
        pos_t = torch.from_numpy(pos.astype(np.int64))
        neg_t = torch.from_numpy(neg.astype(np.int64))

        opt.zero_grad()
        ph = norm_rows(rv[pos_t[:, 0]])
        pr = norm_rows(rel[pos_t[:, 1]])
        pt = norm_rows(rv[pos_t[:, 2]])
        nh = norm_rows(rv[neg_t[:, 0]])
        nr = norm_rows(rel[neg_t[:, 1]])
        nt = norm_rows(rv[neg_t[:, 2]])
        pos_score = -((ph + pr - pt) ** 2).sum(1)
        neg_score = -((nh + nr - nt) ** 2).sum(1)
        loss = torch.nn.functional.softplus(-pos_score).sum() + \
            torch.nn.functional.softplus(neg_score).sum()
        loss.backward()
        opt.step()
        done += len(pos)
    dt = time.perf_counter() - t0
    tps = done / dt
    log(f"torch-cpu baseline: {steps} steps in {dt:.3f}s -> {tps:,.0f} triples/s")
    return tps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small shapes for CI/smoke")
    ap.add_argument("--entities", type=int, default=None,
                    help="entities per KG (default 100000 = DWY100K size; "
                         "triples per KG = 6x this)")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--baseline-steps", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None,
                    help="positives per step (default 80000: the TPU-native "
                         "batch — amortizes the flat optimizer apply over "
                         "16x the triples of the reference's batch 5000 "
                         "(args.json:21); equal-epoch A/B at 20K entities "
                         "(BATCH80K_AB.json, only 3 steps/epoch there — "
                         "harsher than the 15 at 100K): final/av neutral, "
                         "rv -0.5pt and far above its floor. Pass 5000 for "
                         "reference-parity batching; the JSON's "
                         "reference_parity block tracks that regime every "
                         "run)")
    ns = ap.parse_args()

    from multike_tpu.config import Config

    if ns.quick:
        n_ent, n_tri, n_rel = 2_000, 10_000, 50
        epochs = ns.epochs or 3
        base_steps = ns.baseline_steps or 5
        cfg = Config(dim=75, batch_size=ns.batch or 1000, neg_triple_num=10)
    else:
        # True DWY100K size: ~100K entities and ~600K triples per KG side
        # (reference README.md:4-22).
        n_ent = ns.entities or 100_000
        n_tri, n_rel = 6 * n_ent, 500
        epochs = ns.epochs or 5
        cfg = Config(dim=75, batch_size=ns.batch or 80_000,
                     neg_triple_num=10)
        # the torch baseline runs at batch <= 5000 (see cfg_base below), so
        # a fixed step count gives it a stable ~5s measurement window
        base_steps = ns.baseline_steps or 20

    rng = np.random.RandomState(7)
    triples1 = synthetic_triples(rng, n_tri, 0, n_ent, n_rel, 0)
    triples2 = synthetic_triples(rng, n_tri, n_ent, 2 * n_ent, n_rel, n_rel)
    ranges = ((0, n_ent), (n_ent, 2 * n_ent))

    tpu_ok = ensure_usable_backend()
    enable_compile_cache()
    # Band check runs as a subprocess BEFORE this process initializes the
    # device backend (jax.default_backend() below claims the chip).
    band = None
    if tpu_ok and not ns.quick:
        band = run_band_check()
        if band:
            log(f"quality band (20K): {band.get('status')}")
    import jax

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    if not tpu_ok and not ns.quick and os.path.exists(_CACHE_PATH):
        # hardware unavailable (wedged tunnel): report the last TPU
        # measurement of this code base, explicitly marked stale, rather
        # than a meaningless CPU number.
        with open(_CACHE_PATH) as f:
            cached = json.load(f)
        cached["stale_hardware"] = True
        log("reporting cached last-good TPU measurement (stale_hardware)")
        print(json.dumps(cached), flush=True)
        return
    tps, fps, bps = bench_jax(cfg, triples1, triples2, ranges, epochs)
    tps_trunc, fps_trunc, bps_trunc = bench_jax(cfg, triples1, triples2,
                                                ranges, epochs,
                                                truncated=True)
    # Reference-parity row: the reference's own regime — batch 5000
    # (args.json:21), per_slot negative draws, Bloom 'drop' rejection — so
    # headline-vs-parity stays tracked every round (VERDICT r4 item 4c).
    parity = None
    if not ns.quick and ns.batch is None:
        cfg_par = Config(dim=75, batch_size=5000, neg_triple_num=10,
                         neg_scheme="per_slot",
                         truncated_neg_scheme="per_slot")
        tps_par, _, _ = bench_jax(cfg_par, triples1, triples2, ranges,
                                  epochs)
        tps_par_tr, _, _ = bench_jax(cfg_par, triples1, triples2, ranges,
                                     epochs, truncated=True)
        parity = {
            "batch_size": 5000, "neg_scheme": "per_slot",
            "bloom_rejection": cfg_par.neg_rejection_tries > 0,
            "reject_mode": cfg_par.neg_reject_mode,
            "uniform_triples_per_s": round(tps_par, 1),
            "truncated_triples_per_s": round(tps_par_tr, 1),
        }
    # The torch-CPU stand-in runs at the REFERENCE's batch 5000 regardless
    # of ns.batch: big batches actively hurt the CPU loop (80000 measured
    # 4x slower than 5000 — cache pressure), so timing it at our TPU-native
    # batch would inflate vs_baseline. Its triples/s is batch-independent
    # in the regime the reference actually used.
    cfg_base = Config(dim=75, batch_size=min(cfg.batch_size, 5000),
                      neg_triple_num=cfg.neg_triple_num)
    base = bench_torch_cpu(cfg_base, triples1, triples2, ranges, base_steps)

    peak = device_peak_flops() if tpu_ok else 0.0
    hbm_peak = device_peak_hbm_bytes() if tpu_ok else 0.0
    result = {
        "metric": "relation_view_transe_training_throughput",
        "value": round(tps, 1),
        "unit": "triples/s/chip",
        "vs_baseline": round(tps / base, 3),
        "entities_per_kg": n_ent,
        "triples_per_kg": n_tri,
        "batch_size": cfg.batch_size,
        # Per-phase truth (VERDICT r2 weak #2): the uniform phase runs
        # chunk_shared with chunk_exact_rejection=False — its pools are NOT
        # Bloom-filtered (config.py's documented default); only the truncated
        # per_slot phase applies Bloom 'drop' rejection.
        "phases": {
            "uniform": {
                "triples_per_s": round(tps, 1),
                "neg_scheme": "chunk_shared", "neg_pool_size": cfg.neg_pool_size,
                "bloom_rejection": bool(cfg.chunk_exact_rejection),
                "xla_tflops_per_s": round(fps / 1e12, 3),
                "xla_gb_per_s": round(bps / 1e9, 1),
            },
            "truncated": {
                "triples_per_s": round(tps_trunc, 1),
                "neg_scheme": cfg.truncated_neg_scheme,
                **({"truncated_chunk_size": cfg.truncated_chunk_size,
                    "truncated_pool_size": cfg.truncated_pool_size or
                    cfg.neg_pool_size,
                    # chunk pools are Bloom-masked only with
                    # chunk_exact_rejection (off by default)
                    "bloom_rejection": bool(cfg.chunk_exact_rejection)}
                   if cfg.truncated_neg_scheme == "chunk_shared" else
                   {"bloom_rejection": cfg.neg_rejection_tries > 0,
                    "reject_mode": cfg.neg_reject_mode}),
                "xla_tflops_per_s": round(fps_trunc / 1e12, 3),
                "xla_gb_per_s": round(bps_trunc / 1e9, 1),
            },
        },
    }
    if parity is not None:
        result["reference_parity"] = parity
    if band is not None:
        result["quality_band_20k"] = {k: band[k] for k in
                                      ("status", "views") if k in band}
    if hbm_peak and bps:
        # THE efficiency lens for this workload: achieved traffic
        # (XLA-counted bytes / wall time) vs the chip's HBM peak. The step is
        # a d=75 gather/scatter + elementwise pipeline — memory-, not
        # FLOP-bound. Two honesty caveats: (a) XLA's 'bytes accessed' is
        # LOGICAL operand bytes — fusion/VMEM reuse means it can exceed
        # physical DRAM traffic (the batch-5000 parity row measures >1x
        # peak), so util_vs_peak is approximate and reads high; (b) low
        # utilization is NOT recoverable bandwidth — the lane sweep
        # (LANE_PAD_AB.json: d 64/75/128 time ratios 0.836/0.896/1.0, 2x
        # bytes -> ~20% time) shows the epoch wall is dominated by
        # d-independent scatter-row serialization, so row COUNT, not bytes,
        # is the lever (docs/EXPERIMENTS.md r5).
        result["hbm"] = {
            "achieved_gb_per_s": round(bps / 1e9, 1),
            "peak_gb_per_s": round(hbm_peak / 1e9, 1),
            "util_vs_peak": round(bps / hbm_peak, 4),
        }
    if peak:
        # kept as an order-of-magnitude anchor only; a d=75 gather/scatter
        # workload is bandwidth-bound, so the honest lens is result["hbm"]
        result["mfu_vs_bf16_peak"] = round(fps / peak, 5)
    if tpu_ok and not ns.quick:
        try:
            with open(_CACHE_PATH, "w") as f:
                json.dump(result, f)
        except OSError:
            pass
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
