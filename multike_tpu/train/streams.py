"""Per-loss training streams as whole-epoch jitted ``lax.scan``s.

The reference trains 8 independent loss streams, each with its own TF1 graph,
feed_dict loop and its own Adagrad accumulator (MultiKE_model.py:28-31 and
291-473; one ``generate_optimizer`` per loss). Here every stream becomes ONE
jitted function that runs a whole epoch on device: shuffle -> static-shape
batch slices (tail masked) -> on-device negative sampling -> loss -> Adagrad
update, scanned over steps. Host<->device traffic per epoch is a handful of
scalars, vs. the reference's per-step feed_dict crossing.

Per-stream optimizer semantics: TF's sparse Adagrad update from
``embedding_lookup`` gradients only touches the gathered rows; dense Adagrad
with zero gradients elsewhere leaves those accumulators unchanged, so the two
are equivalent. Each stream is written as (prep, loss_fn) — ``prep`` builds
the row-id vectors (sampling included), ``loss_fn`` consumes pre-gathered RAW
rows — so the update can run on either of two identical-math paths:

  * row-sparse Adagrad (default, train/sparse_adagrad.py): gradients are
    taken w.r.t. the gathered rows and applied to only those rows — O(B*d)
    HBM traffic per step, flat in table size;
  * dense optax (``row_sparse_updates=False`` or a non-Adagrad optimizer):
    gradients flow through the gather to the full tables.

Stream variable ownership (MultiKE_model.py cites):

  stream          vars (row-sparse table | dense)
  rel_view        rv_ent | rel                (114-132)
  ckge_rel        rv_ent | rel                (158-170)
  ckgp_rel        rv_ent | rel                (187-201)
  attr_view       av_ent | attr, conv_av      (134-151)
  ckge_attr       av_ent | attr, conv_ckge    (172-185)
  ckga_attr       av_ent | attr, conv_ckga    (203-221)
  common_space    ent, rv_ent, av_ent | -     (225-239)
  space_mapping   ent | nv/rv/av_mapping      (241-261; var_list='shared*')
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multike_tpu.config import Config
from multike_tpu.losses import (alignment_loss, positive_logistic_from_scores,
                                relation_logistic_loss_wo_negs,
                                space_mapping_loss)
from multike_tpu.params import l2_normalize, lookup_norm, lookup_norm_fast
from multike_tpu.train import sparse_adagrad

# stream -> (row_tables, dense_names); STREAM_VARS preserves the flat view.
STREAM_SPEC: Dict[str, Tuple[Tuple[str, ...], Tuple[str, ...]]] = {
    "rel_view": (("rv_ent",), ("rel",)),
    "ckge_rel": (("rv_ent",), ("rel",)),
    "ckgp_rel": (("rv_ent",), ("rel",)),
    "attr_view": (("av_ent",), ("attr", "conv_av")),
    "ckge_attr": (("av_ent",), ("attr", "conv_ckge")),
    "ckga_attr": (("av_ent",), ("attr", "conv_ckga")),
    "common_space": (("ent", "rv_ent", "av_ent"), ()),
    "space_mapping": (("ent",), ("nv_mapping", "rv_mapping", "av_mapping")),
}

STREAM_VARS: Dict[str, Tuple[str, ...]] = {
    s: rows + dense for s, (rows, dense) in STREAM_SPEC.items()}


# Measured row-sparse-vs-dense crossover per TPU device kind (VERDICT r3
# weak 6): (min table rows for row-sparse, max touched fraction). The v5e
# entry comes from the in-situ A/B in docs/EXPERIMENTS.md r3 (dense wins
# end-to-end below 150K rows; row-sparse needs the step to touch <= 1/4 of
# the table). Other device kinds fall back to the v5e numbers with a one-time
# log line — scatter serialization and HBM bandwidth differ across
# generations, so re-derive with benchmarks/apply_bench.py when a new kind
# shows up and add its row here.
_ROW_SPARSE_CROSSOVER = {
    "TPU v5 lite": (150_000, 0.25),
    "TPU v5e": (150_000, 0.25),
}
_warned_kinds: set = set()


def _row_sparse_thresholds() -> Tuple[int, float]:
    import jax as _jax
    try:
        kind = _jax.devices()[0].device_kind
    except Exception:
        kind = "cpu"
    for known, thresholds in _ROW_SPARSE_CROSSOVER.items():
        if kind.startswith(known):
            return thresholds
    if kind not in _warned_kinds:
        _warned_kinds.add(kind)
        import logging
        logging.getLogger("multike_tpu").info(
            "use_row_sparse auto thresholds unmeasured for device kind %r; "
            "using v5e crossover (150K rows, 1/4 touched). Re-derive with "
            "benchmarks/apply_bench.py for this hardware.", kind)
    return (150_000, 0.25)


def use_row_sparse(cfg: Config, table_rows: int,
                   ids_count: int | None = None) -> bool:
    """Row-sparse vs dense-optax update path. "auto" picks by the measured
    v5e cost model (benchmarks/apply_bench.py): the row-sparse apply scales
    with the SCATTERED-ROW count (~1.3 ms at 20K ids, 2.4 ms at 60K over a
    200K-row table) while dense optax is ~flat per table size (~1.0 ms at
    100K rows, 2.1 ms at 200K, 6.4 ms at 1M) — so row-sparse wins when the
    step touches a small fraction of the table AND the table is big enough
    that a full dense pass actually hurts. The 150K floor comes from an
    in-situ A/B (bench.py --entities 50000): at E=100K the dense pass
    overlaps into the scan so well that row-sparse LOST 26% end-to-end
    (6.9M -> 5.1M triples/s uniform) despite winning the isolated
    micro-bench; at E=200K row-sparse wins both ways."""
    if cfg.optimizer != "Adagrad":
        return False
    mode = cfg.row_sparse_updates
    if mode in (True, "on", "true"):
        return True
    if mode in (False, "off", "false"):
        return False
    min_rows, max_frac = _row_sparse_thresholds()
    if ids_count is not None and ids_count <= max_frac * table_rows \
            and table_rows >= min_rows:
        return True
    return table_rows >= cfg.row_sparse_min_rows


def stream_lr(cfg: Config, stream: str) -> float:
    return cfg.ITC_learning_rate if stream == "common_space" \
        else cfg.learning_rate


def stream_optimizer(cfg: Config, stream: str) -> optax.GradientTransformation:
    lr = stream_lr(cfg, stream)
    if cfg.optimizer == "Adagrad":
        return optax.adagrad(lr, initial_accumulator_value=0.1)
    if cfg.optimizer == "Adam":
        return optax.adam(lr)
    if cfg.optimizer == "Adadelta":
        return optax.adadelta(lr)
    return optax.sgd(lr)


def init_stream_opt_states(cfg: Config, params, pctx=None) -> Dict:
    """Per-stream optimizer states. Adagrad (the reference optimizer) always
    uses plain accumulator dicts — identical math to ``optax.adagrad`` and
    format-compatible with BOTH the row-sparse and the dense apply, so the
    update path is free to pick per batch-size/table-size at trace time
    (``use_row_sparse``). Other optimizers get optax states (dense only)."""
    states = {}
    for stream, names in STREAM_VARS.items():
        sub = {k: params[k] for k in names}
        if pctx is not None or cfg.optimizer == "Adagrad":
            states[stream] = {k: sparse_adagrad.init_acc(v)
                              for k, v in sub.items()}
        else:
            states[stream] = stream_optimizer(cfg, stream).init(sub)
    return states


def _merged(params, subset):
    """Full param view where only ``subset`` entries carry gradients."""
    stopped = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
    out = dict(stopped)
    out.update(subset)
    return out


def _make_stream_update(cfg: Config, stream: str, prep, loss_fn, pctx=None):
    """Build (params, opt_state, *batch) -> (params, opt_state, loss).

    ``prep(*batch) -> (ids, aux)``: param-independent work — negative
    sampling, Bloom keep masks, row-id assembly. ``ids`` maps each row-sparse
    table name to its (N,) id vector.

    ``loss_fn(rows, dense, stopped, aux, *batch) -> loss``:
      rows[t]  — RAW gathered rows ``table[ids[t]]`` (normalize inside);
      dense[k] — full small params (rel/attr tables, conv, mappings);
      stopped  — all params under stop_gradient, for frozen reads ONLY
                 (reads of a trained var must go through rows/dense).

    ``pctx`` (parallel.context.MeshContext) engages the ('dp','tp') mesh:
    batch id vectors are dp-sharded (GSPMD slices the loss region; the psum
    of the scalar loss and of the small dense grads is inserted by XLA),
    row gathers honor tp row-sharding (masked gather + psum over 'tp'), and
    the row-sparse apply all-gathers only the (id, row-grad) pairs over 'dp'
    — O(batch*d) ICI bytes per step, no dense-table gradient ever exists.
    Mesh mode therefore requires the row-sparse Adagrad path.
    """
    row_tables, dense_names = STREAM_SPEC[stream]
    lr = stream_lr(cfg, stream)
    opt = stream_optimizer(cfg, stream)
    names = row_tables + dense_names
    if pctx is not None:
        assert cfg.optimizer == "Adagrad" and \
            cfg.row_sparse_updates not in (False, "off", "false"), \
            "mesh training runs on the row-sparse Adagrad path"
        if cfg.use_pallas_apply:
            import logging

            logging.getLogger("multike_tpu").warning(
                "use_pallas_apply is a single-device-path optimization; "
                "the mesh apply (row_apply_sharded) uses the XLA row "
                "apply — the fused kernel does not yet run inside "
                "shard_map")

    def update(params, opt_state, *batch):
        ids, aux = prep(*batch)
        adagrad = cfg.optimizer == "Adagrad"
        sparse = pctx is not None or use_row_sparse(
            cfg, params[row_tables[0]].shape[0],
            ids_count=ids[row_tables[0]].shape[0])

        if sparse:
            from multike_tpu.parallel.context import (gather_rows,
                                                      row_apply_sharded,
                                                      shard_dp)

            if pctx is not None:
                ids = {t: shard_dp(pctx, v) for t, v in ids.items()}
                rows = {t: gather_rows(pctx, t, params[t], ids[t])
                        for t in row_tables}
            else:
                rows = {t: params[t][ids[t]] for t in row_tables}
            dense = {k: params[k] for k in dense_names}
            stopped = jax.tree_util.tree_map(jax.lax.stop_gradient, params)

            def f(rows_, dense_):
                return loss_fn(rows_, dense_, stopped, aux, *batch)

            loss, (g_rows, g_dense) = jax.value_and_grad(
                f, argnums=(0, 1))(rows, dense)
            params = dict(params)
            opt_state = dict(opt_state)
            for t in row_tables:
                if pctx is not None:
                    params[t], opt_state[t] = row_apply_sharded(
                        pctx, t, params[t], opt_state[t], ids[t],
                        g_rows[t], lr)
                else:
                    params[t], opt_state[t] = sparse_adagrad.row_apply(
                        params[t], opt_state[t], ids[t], g_rows[t], lr,
                        use_pallas=cfg.use_pallas_apply)
            for k in dense_names:
                params[k], opt_state[k] = sparse_adagrad.dense_apply(
                    params[k], opt_state[k], g_dense[k], lr)
            return params, opt_state, loss

        subset = {k: params[k] for k in names}

        def f(sub):
            merged = _merged(params, sub)
            rows = {t: merged[t][ids[t]] for t in row_tables}
            dense = {k: merged[k] for k in dense_names}
            return loss_fn(rows, dense, merged, aux, *batch)

        loss, grads = jax.value_and_grad(f)(subset)
        if adagrad:
            # dense grads, acc-dict state: identical math to optax.adagrad
            # (sparse_adagrad.dense_apply), same state format as the sparse
            # path so the sparse/dense choice is free per epoch builder
            params = dict(params)
            opt_state = dict(opt_state)
            for k in names:
                params[k], opt_state[k] = sparse_adagrad.dense_apply(
                    subset[k], opt_state[k], grads[k], lr)
            return params, opt_state, loss
        updates, new_opt = opt.update(grads, opt_state, subset)
        subset = optax.apply_updates(subset, updates)
        params = dict(params)
        params.update(subset)
        return params, new_opt, loss

    return update


# ---------------------------------------------------------------------------
# Batch plumbing helpers
# ---------------------------------------------------------------------------

def _mixed_epoch_indices(key, n1: int, n2: int, bs1: int, bs2: int, steps: int):
    """Shuffled wraparound index matrices + tail masks for the proportional
    two-KG batch mix (base/batch.py:33-54). Masks reproduce the reference's
    short tail batches: global position >= n contributes 0."""
    k1, k2 = jax.random.split(key)
    perm1 = jax.random.permutation(k1, n1)
    perm2 = jax.random.permutation(k2, n2)
    pos1 = jnp.arange(steps * bs1)
    pos2 = jnp.arange(steps * bs2)
    idx1 = perm1[pos1 % n1].reshape(steps, bs1)
    idx2 = perm2[pos2 % n2].reshape(steps, bs2)
    m1 = (pos1 < n1).astype(jnp.float32).reshape(steps, bs1)
    m2 = (pos2 < n2).astype(jnp.float32).reshape(steps, bs2)
    return idx1, idx2, m1, m2


def proportional_sizes(n1: int, n2: int, batch_size: int) -> Tuple[int, int]:
    bs1 = int(n1 / (n1 + n2) * batch_size)
    return bs1, batch_size - bs1


# ---------------------------------------------------------------------------
# Stream epoch builders. Each returns a jitted function closed over static
# shapes; the Trainer caches them per dataset.
# ---------------------------------------------------------------------------

def _chunk_layout(bs: int, chunk_size: int) -> Tuple[int, int]:
    """(num_chunks, chunk_rows) with num_chunks * chunk_rows >= bs."""
    nc = max(1, -(-bs // max(1, chunk_size)))
    return nc, -(-bs // nc)


def _padded_epoch_indices(key, n: int, bs: int, bsp: int, steps: int):
    """Shuffled wraparound index matrix (steps, bsp) + float mask. Real slots
    j < bs follow the reference's sequential epoch slicing (global position
    i*bs+j, tail masked, base/batch.py:45-54); slots j >= bs are chunk
    padding, always masked.

    Invariant relied on downstream: within every row the mask is
    NONINCREASING (1s then 0s), so after reshaping a row into chunks the
    invalid slots form a contiguous suffix of each chunk —
    sampling.sample_shared_neighbor_corruptions draws donor indices from
    [0, real_rows) per chunk and would silently sample wrong slots if a
    caller ever fed it an interleaved mask."""
    perm = jax.random.permutation(key, n)
    posg = jnp.arange(steps * bs)
    idx = perm[posg % n].reshape(steps, bs)
    m = (posg < n).astype(jnp.float32).reshape(steps, bs)
    if bsp > bs:
        idx = jnp.pad(idx, ((0, 0), (0, bsp - bs)))
        m = jnp.pad(m, ((0, 0), (0, bsp - bs)))
    return idx, m


def _split(rows, sizes):
    out, off = [], 0
    for sz in sizes:
        out.append(rows[off:off + sz])
        off += sz
    return out


def build_rel_view_epoch(cfg: Config, n1: int, n2: int,
                         ranges: Tuple[Tuple[int, int], Tuple[int, int]],
                         with_neighbors: bool = True, tfilter=None,
                         pctx=None):
    """Relation-view TransE epoch (MultiKE_model.py:114-132).

    Each KG's sub-batch is processed in its own id range (the reference
    concatenates them — the loss is a sum either way). Two negative schemes
    (cfg.neg_scheme):

      * ``chunk_shared`` — chunks of positives share two candidate pools of
        C = cfg.neg_pool_size (default neg_triple_num) uniform draws each
        (head-corruption + tail-corruption); every positive scores against
        all 2C pool members at pair weight K/(2C), the same estimator as the
        reference's K coin-mixed per-slot draws with lower variance
        (losses.chunk_shared_relation_logistic_loss). Scoring and gradients
        ride the MXU. Used whenever neighbor-truncated sampling is off.
      * ``per_slot`` — reference-exact iid candidates per slot in the lean
        layout (negatives reuse positive rows). Always used with neighbors.

    ``with_neighbors=False`` compiles the pre-refresh variant whose sampling
    skips the neighbor-table gathers entirely (leaner executable; also
    avoids a degenerate-empty-table XLA pathology). ``tfilter`` (a
    sampling.TripleFilter) enables exact rejection of true triples: per-slot
    mode resamples up to ``cfg.neg_rejection_tries`` times (early-exit
    while_loop); chunk mode zero-masks the offending (positive, candidate)
    pairs when ``cfg.chunk_exact_rejection`` — stronger than the reference's
    give-up-after-10 loop (base/batch.py:103-105) but O(batch*2C) Bloom
    gathers, so off by default (see Config)."""
    from multike_tpu.losses import (chunk_shared_relation_logistic_loss,
                                    lean_relation_logistic_loss)
    from multike_tpu.sampling import (sample_corruptions,
                                      sample_shared_corruptions,
                                      sample_shared_neighbor_corruptions,
                                      triple_filter_contains)

    steps = int(np.ceil((n1 + n2) / cfg.batch_size))
    bs1, bs2 = proportional_sizes(n1, n2, cfg.batch_size)
    (lo1, hi1), (lo2, hi2) = ranges
    neg_num = cfg.neg_triple_num
    # chunk-shared pools in the truncated phase draw from neighbor rows
    # (sampling.sample_shared_neighbor_corruptions; Config.truncated_neg_scheme)
    if cfg.truncated_neg_scheme not in ("per_slot", "chunk_shared"):
        raise ValueError(f"truncated_neg_scheme must be 'per_slot' or "
                         f"'chunk_shared', got {cfg.truncated_neg_scheme!r}")
    if cfg.neg_scheme not in ("per_slot", "chunk_shared"):
        raise ValueError(f"neg_scheme must be 'per_slot' or 'chunk_shared', "
                         f"got {cfg.neg_scheme!r}")
    trunc_chunks = with_neighbors and cfg.truncated_neg_scheme == "chunk_shared"
    use_chunks = trunc_chunks or \
        ((cfg.neg_scheme == "chunk_shared") and not with_neighbors)
    pool = cfg.neg_pool_size or neg_num      # candidates per shared pool (C)
    if trunc_chunks and cfg.truncated_pool_size:
        pool = cfg.truncated_pool_size
    neg_w = neg_num / (2.0 * pool)           # K/(2C), see docstring
    if use_chunks:
        chunk_size = cfg.truncated_chunk_size if trunc_chunks \
            else cfg.neg_chunk_size
        nc1, s1 = _chunk_layout(bs1, chunk_size)
        nc2, s2 = _chunk_layout(bs2, chunk_size)
        bsp1, bsp2 = nc1 * s1, nc2 * s2
        sizes = [bsp1, bsp1, nc1 * pool, nc1 * pool,
                 bsp2, bsp2, nc2 * pool, nc2 * pool]
    else:
        bsp1, bsp2 = bs1, bs2
        sizes = [bsp1, bsp1, bsp1 * neg_num, bsp2, bsp2, bsp2 * neg_num]

    def chunk_keep_masks(trip, ch, ct, nc, s):
        """Bloom keep masks for the two candidate pools, each (nc, s, C):
        keep_h[c,i,j] = 0 iff (ch[c,j], r_i, t_i) is possibly a true triple,
        keep_t[c,i,j] = 0 iff (h_i, r_i, ct[c,j]) is. Exact rejection with no
        resampling loop — offending pairs are dropped from the negative sum
        (stronger than the reference's give-up-after-10 retries,
        base/batch.py:103-105)."""
        if tfilter is None or not cfg.chunk_exact_rejection:
            return None, None
        h = trip[:, 0].reshape(nc, s)[..., None]
        r = trip[:, 1].reshape(nc, s)[..., None]
        t = trip[:, 2].reshape(nc, s)[..., None]
        bad_h = triple_filter_contains(tfilter, ch[:, None, :], r, t)
        bad_t = triple_filter_contains(tfilter, h, r, ct[:, None, :])
        return (1.0 - bad_h.astype(jnp.float32),
                1.0 - bad_t.astype(jnp.float32))

    # Sampling is PRESAMPLED for the whole epoch in one bulk pass before the
    # scan (epoch_impl below) whenever rejection doesn't need a resample
    # loop: the RNG + neighbor-table / Bloom gathers for all steps become
    # single large ops instead of `steps` small latency-bound ones on the
    # scan's critical path (measured 1.45M -> see docs/EXPERIMENTS.md).
    # 'resample' mode keeps in-scan sampling: its early-exit while_loop would
    # degrade to ~`retries` full-epoch redraw passes in bulk form. Chunk
    # modes have no resample loop, so they always presample their pools.
    presample = use_chunks or \
        (tfilter is None or cfg.neg_rejection_tries == 0 or
         cfg.neg_reject_mode == "drop")

    # All entity-row reads across both KGs (positives + candidates) go
    # through ONE fused gather; with row-sparse updates its gradient is
    # likewise ONE row-sparse apply. (Naive per-lookup autodiff emits one
    # dense zeros+scatter per gather — measured ~2.5x slower per step.)
    def prep(t1b, m1, k1, t2b, m2, k2, nbr):
        # chunk modes always presample (presample is True whenever
        # use_chunks above) and go through prep_presampled_chunks; keeping a
        # second in-scan chunk path here would just be dead code free to
        # diverge silently.
        assert not use_chunks
        cand1, hb1, keep1 = sample_corruptions(
            k1, t1b, lo1, hi1, neg_num, nbr, tfilter=tfilter,
            retries=cfg.neg_rejection_tries,
            reject_mode=cfg.neg_reject_mode)
        cand2, hb2, keep2 = sample_corruptions(
            k2, t2b, lo2, hi2, neg_num, nbr, tfilter=tfilter,
            retries=cfg.neg_rejection_tries,
            reject_mode=cfg.neg_reject_mode)
        parts = [t1b[:, 0], t1b[:, 2], cand1.ravel(),
                 t2b[:, 0], t2b[:, 2], cand2.ravel()]
        aux = (hb1, keep1, hb2, keep2)
        return {"rv_ent": jnp.concatenate(parts)}, aux

    def prep_presampled(t1b, m1, cand1, hb1, keep1, t2b, m2, cand2, hb2,
                        keep2):
        parts = [t1b[:, 0], t1b[:, 2], cand1.ravel(),
                 t2b[:, 0], t2b[:, 2], cand2.ravel()]
        return {"rv_ent": jnp.concatenate(parts)}, (hb1, keep1, hb2, keep2)

    def prep_presampled_chunks(t1b, m1, ch1, ct1, t2b, m2, ch2, ct2):
        parts = [t1b[:, 0], t1b[:, 2], ch1.ravel(), ct1.ravel(),
                 t2b[:, 0], t2b[:, 2], ch2.ravel(), ct2.ravel()]
        aux = (chunk_keep_masks(t1b, ch1, ct1, nc1, s1),
               chunk_keep_masks(t2b, ch2, ct2, nc2, s2))
        return {"rv_ent": jnp.concatenate(parts)}, aux

    def _loss_body(rows, dense, aux, t1b, m1, t2b, m2):
        dim = rows["rv_ent"].shape[-1]
        rv_rows = l2_normalize(rows["rv_ent"], axis=-1)
        prs_all = lookup_norm_fast(dense["rel"],
                                   jnp.concatenate([t1b[:, 1], t2b[:, 1]]))
        prs1, prs2 = prs_all[:t1b.shape[0]], prs_all[t1b.shape[0]:]
        loss = jnp.float32(0.0)
        if use_chunks:
            (keep1, keep2) = aux
            (ph1, pt1, ch1r, ct1r,
             ph2, pt2, ch2r, ct2r) = _split(rv_rows, sizes)
            if bs1 > 0:
                loss += chunk_shared_relation_logistic_loss(
                    ph1.reshape(nc1, s1, dim), prs1.reshape(nc1, s1, dim),
                    pt1.reshape(nc1, s1, dim),
                    ch1r.reshape(nc1, pool, dim),
                    ct1r.reshape(nc1, pool, dim),
                    neg_weight=neg_w, pos_mask=m1.reshape(nc1, s1),
                    keep_h=keep1[0], keep_t=keep1[1])
            if bs2 > 0:
                loss += chunk_shared_relation_logistic_loss(
                    ph2.reshape(nc2, s2, dim), prs2.reshape(nc2, s2, dim),
                    pt2.reshape(nc2, s2, dim),
                    ch2r.reshape(nc2, pool, dim),
                    ct2r.reshape(nc2, pool, dim),
                    neg_weight=neg_w, pos_mask=m2.reshape(nc2, s2),
                    keep_h=keep2[0], keep_t=keep2[1])
        else:
            hb1, keep1, hb2, keep2 = aux
            (ph1, pt1, c1r, ph2, pt2, c2r) = _split(rv_rows, sizes)
            if bs1 > 0:
                loss += lean_relation_logistic_loss(
                    ph1, prs1, pt1, c1r.reshape(bsp1, neg_num, dim), hb1, m1,
                    neg_keep=keep1)
            if bs2 > 0:
                loss += lean_relation_logistic_loss(
                    ph2, prs2, pt2, c2r.reshape(bsp2, neg_num, dim), hb2, m2,
                    neg_keep=keep2)
        return loss

    def loss_fn(rows, dense, stopped, aux, t1b, m1, k1, t2b, m2, k2, nbr):
        return _loss_body(rows, dense, aux, t1b, m1, t2b, m2)

    def loss_fn_presampled(rows, dense, stopped, aux, t1b, m1, cand1, hb1,
                           keep1, t2b, m2, cand2, hb2, keep2):
        return _loss_body(rows, dense, aux, t1b, m1, t2b, m2)

    def loss_fn_presampled_chunks(rows, dense, stopped, aux, t1b, m1, ch1,
                                  ct1, t2b, m2, ch2, ct2):
        return _loss_body(rows, dense, aux, t1b, m1, t2b, m2)

    if presample and use_chunks:
        update = _make_stream_update(cfg, "rel_view", prep_presampled_chunks,
                                     loss_fn_presampled_chunks, pctx)
    elif presample:
        update = _make_stream_update(cfg, "rel_view", prep_presampled,
                                     loss_fn_presampled, pctx)
    else:
        update = _make_stream_update(cfg, "rel_view", prep, loss_fn, pctx)

    def epoch_impl(params, opt_state, key, triples1, triples2, nbr):
        key, ki1, ki2 = jax.random.split(key, 3)
        idx1, m1 = _padded_epoch_indices(ki1, n1, bs1, bsp1, steps)
        idx2, m2 = _padded_epoch_indices(ki2, n2, bs2, bsp2, steps)
        step_keys = jax.random.split(key, steps + 1)
        key, step_keys = step_keys[0], step_keys[1:]

        if presample and use_chunks:
            # Bulk-draw every step's shared pools up front (tiny arrays:
            # (steps, nc, C) per side; the neighbor-pool variant batches all
            # steps' donor/neighbor gathers into one op).
            kp1, kp2 = jax.random.split(step_keys[0])
            pos1 = triples1[idx1]                       # (steps, bsp1, 3)
            pos2 = triples2[idx2]
            if trunc_chunks:
                ch1, ct1 = jax.vmap(
                    lambda k, p, m: sample_shared_neighbor_corruptions(
                        k, p, nc1, s1, pool, lo1, hi1, nbr, mask=m)
                )(jax.random.split(kp1, steps), pos1, m1)
                ch2, ct2 = jax.vmap(
                    lambda k, p, m: sample_shared_neighbor_corruptions(
                        k, p, nc2, s2, pool, lo2, hi2, nbr, mask=m)
                )(jax.random.split(kp2, steps), pos2, m2)
            else:
                ch1, ct1 = sample_shared_corruptions(
                    kp1, steps * nc1, pool, lo1, hi1)
                ch2, ct2 = sample_shared_corruptions(
                    kp2, steps * nc2, pool, lo2, hi2)
                ch1 = ch1.reshape(steps, nc1, pool)
                ct1 = ct1.reshape(steps, nc1, pool)
                ch2 = ch2.reshape(steps, nc2, pool)
                ct2 = ct2.reshape(steps, nc2, pool)
            xs = (pos1, m1, ch1, ct1, pos2, m2, ch2, ct2)

            def body(carry, xs):
                params, opt_state = carry
                params, opt_state, loss = update(params, opt_state, *xs)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), xs)
            return params, opt_state, key, jnp.sum(losses)

        if presample:
            # Bulk-sample the whole epoch's corruptions up front (one
            # neighbor-table draw + one Bloom pass over steps*bs candidates;
            # mesh mode: replicated keys => replicated candidate arrays, the
            # dp-determinism contract of parallel/context.py holds).
            kp1, kp2 = jax.random.split(step_keys[0])
            pos1 = triples1[idx1]                       # (steps, bsp1, 3)
            pos2 = triples2[idx2]
            cand1, hb1, keep1 = sample_corruptions(
                kp1, pos1.reshape(-1, 3), lo1, hi1, neg_num, nbr,
                tfilter=tfilter, retries=cfg.neg_rejection_tries,
                reject_mode="drop" if tfilter is not None else "resample")
            cand2, hb2, keep2 = sample_corruptions(
                kp2, pos2.reshape(-1, 3), lo2, hi2, neg_num, nbr,
                tfilter=tfilter, retries=cfg.neg_rejection_tries,
                reject_mode="drop" if tfilter is not None else "resample")
            if keep1 is None:
                keep1 = jnp.ones(cand1.shape, jnp.float32)
                keep2 = jnp.ones(cand2.shape, jnp.float32)
            xs = (pos1, m1, cand1.reshape(steps, bsp1, neg_num),
                  hb1.reshape(steps, bsp1, neg_num),
                  keep1.reshape(steps, bsp1, neg_num),
                  pos2, m2, cand2.reshape(steps, bsp2, neg_num),
                  hb2.reshape(steps, bsp2, neg_num),
                  keep2.reshape(steps, bsp2, neg_num))

            def body(carry, xs):
                params, opt_state = carry
                params, opt_state, loss = update(params, opt_state, *xs)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), xs)
            return params, opt_state, key, jnp.sum(losses)

        def body(carry, xs):
            params, opt_state = carry
            i1, i2, mm1, mm2, sk = xs
            k1, k2 = jax.random.split(sk)
            params, opt_state, loss = update(
                params, opt_state, triples1[i1], mm1, k1,
                triples2[i2], mm2, k2, nbr)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (idx1, idx2, m1, m2, step_keys))
        return params, opt_state, key, jnp.sum(losses)

    if with_neighbors:
        epoch = jax.jit(epoch_impl, donate_argnums=(0, 1))
    else:
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def epoch(params, opt_state, key, triples1, triples2):
            return epoch_impl(params, opt_state, key, triples1, triples2, None)

    trained_per_epoch = min(n1, steps * bs1) + min(n2, steps * bs2)
    return epoch, steps, trained_per_epoch


def build_attr_view_epoch(cfg: Config, n1: int, n2: int, pctx=None):
    """Attribute view: weighted positives only (neg_triples_num=0,
    MultiKE_model.py:324-331). Steps counted with ``batch_size`` but slices
    sized with ``attribute_batch_size`` — a reference quirk
    (MultiKE_Late.py:206 vs MultiKE_model.py:330)."""
    from multike_tpu.views.attr_conv import conv_score

    steps = int(np.ceil((n1 + n2) / cfg.batch_size))
    bs1, bs2 = proportional_sizes(n1, n2, cfg.attribute_batch_size)

    def prep(constants, trip, w, mask):
        return {"av_ent": trip[:, 0]}, None

    def loss_fn(rows, dense, stopped, aux, constants, trip, w, mask):
        phs = l2_normalize(rows["av_ent"], axis=-1)
        pas = dense["attr"][trip[:, 1]]          # unnormalized (important!)
        pvs = constants["literal_embeds"][trip[:, 2]]
        score = conv_score(dense["conv_av"], phs, pas, pvs, mask=mask)
        return positive_logistic_from_scores(score, weights=w, mask=mask)

    update = _make_stream_update(cfg, "attr_view", prep, loss_fn, pctx)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def epoch(params, opt_state, key, constants, trips1, w1, trips2, w2):
        key, k_idx = jax.random.split(key)
        idx1, idx2, m1, m2 = _mixed_epoch_indices(k_idx, n1, n2, bs1, bs2, steps)

        def body(carry, xs):
            params, opt_state = carry
            i1, i2, mm1, mm2 = xs
            trip = jnp.concatenate([trips1[i1], trips2[i2]])
            w = jnp.concatenate([w1[i1], w2[i2]])
            mask = jnp.concatenate([mm1, mm2])
            params, opt_state, loss = update(params, opt_state,
                                             constants, trip, w, mask)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (idx1, idx2, m1, m2))
        return params, opt_state, key, jnp.sum(losses)

    trained_per_epoch = min(n1, steps * bs1) + min(n2, steps * bs2)
    return epoch, steps, trained_per_epoch


def _sampled_epoch(cfg: Config, stream: str, n: int, batch_size: int,
                   prep, loss_fn, with_weights: bool, needs_constants: bool,
                   steps: int | None = None, pctx=None):
    """Shared builder for streams that draw ``random.sample`` batches each
    step (MultiKE_model.py:349-473): ckge_rel, ckgp_rel, ckge_attr,
    ckga_attr, common_space, space_mapping.

    ``n`` is the (possibly bucket-padded, see trainer._bucketed) row capacity
    of the data arrays; ``steps`` overrides the step count so a capacity
    bucket serving several true sizes keeps one compiled executable."""
    if steps is None:
        steps = max(1, int(np.ceil(n / batch_size)))
    bs = batch_size if steps > 1 else n
    update = _make_stream_update(cfg, stream, prep, loss_fn, pctx)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def epoch(params, opt_state, key, *data):
        # data: (constants?), ids, (weights?)
        step_keys = jax.random.split(key, steps + 1)
        key, step_keys = step_keys[0], step_keys[1:]
        if needs_constants:
            constants, ids = data[0], data[1]
            weights = data[2] if with_weights else None
        else:
            constants, ids = None, data[0]
            weights = data[1] if with_weights else None

        def body(carry, sk):
            params, opt_state = carry
            sel = jax.random.permutation(sk, n)[:bs]
            batch = [ids[sel]]
            if with_weights:
                batch.append(weights[sel])
            if needs_constants:
                batch = [constants] + batch
            params, opt_state, loss = update(params, opt_state, *batch)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), step_keys)
        return params, opt_state, key, jnp.sum(losses)

    return epoch, steps, steps * bs


def build_ckge_rel_epoch(cfg: Config, n: int, steps: int | None = None, pctx=None):
    def prep(pos):
        # one fused entity gather -> one row-sparse apply
        return {"rv_ent": jnp.concatenate([pos[:, 0], pos[:, 2]])}, None

    def loss_fn(rows, dense, stopped, aux, pos):
        hrows = l2_normalize(rows["rv_ent"], axis=-1)
        phs, pts = hrows[:pos.shape[0]], hrows[pos.shape[0]:]
        prs = lookup_norm_fast(dense["rel"], pos[:, 1])
        return 2.0 * relation_logistic_loss_wo_negs(phs, prs, pts)

    return _sampled_epoch(cfg, "ckge_rel", n, cfg.batch_size, prep, loss_fn,
                          with_weights=False, needs_constants=False,
                          steps=steps, pctx=pctx)


def build_ckgp_rel_epoch(cfg: Config, n: int, steps: int | None = None, pctx=None):
    from multike_tpu.losses import logistic_loss_wo_negs

    def prep(pos, w):
        return {"rv_ent": jnp.concatenate([pos[:, 0], pos[:, 2]])}, None

    def loss_fn(rows, dense, stopped, aux, pos, w):
        hrows = l2_normalize(rows["rv_ent"], axis=-1)
        phs, pts = hrows[:pos.shape[0]], hrows[pos.shape[0]:]
        prs = lookup_norm_fast(dense["rel"], pos[:, 1])
        return 2.0 * logistic_loss_wo_negs(phs, prs, pts, w)

    return _sampled_epoch(cfg, "ckgp_rel", n, cfg.batch_size, prep, loss_fn,
                          with_weights=True, needs_constants=False,
                          steps=steps, pctx=pctx)


def build_ckge_attr_epoch(cfg: Config, n: int, steps: int | None = None, pctx=None):
    from multike_tpu.views.attr_conv import conv_score

    def prep(constants, pos):
        return {"av_ent": pos[:, 0]}, None

    def loss_fn(rows, dense, stopped, aux, constants, pos):
        phs = l2_normalize(rows["av_ent"], axis=-1)
        pas = dense["attr"][pos[:, 1]]
        pvs = constants["literal_embeds"][pos[:, 2]]
        score = conv_score(dense["conv_ckge"], phs, pas, pvs)
        return 2.0 * positive_logistic_from_scores(score)

    return _sampled_epoch(cfg, "ckge_attr", n, cfg.attribute_batch_size,
                          prep, loss_fn, with_weights=False,
                          needs_constants=True, steps=steps, pctx=pctx)


def build_ckga_attr_epoch(cfg: Config, n: int, steps: int | None = None, pctx=None):
    from multike_tpu.views.attr_conv import conv_score

    def prep(constants, pos, w):
        return {"av_ent": pos[:, 0]}, None

    def loss_fn(rows, dense, stopped, aux, constants, pos, w):
        phs = l2_normalize(rows["av_ent"], axis=-1)
        pas = dense["attr"][pos[:, 1]]
        pvs = constants["literal_embeds"][pos[:, 2]]
        score = conv_score(dense["conv_ckga"], phs, pas, pvs)
        return positive_logistic_from_scores(score, weights=w)

    return _sampled_epoch(cfg, "ckga_attr", n, cfg.attribute_batch_size,
                          prep, loss_fn, with_weights=True,
                          needs_constants=True, steps=steps, pctx=pctx)


def build_common_space_epoch(cfg: Config, n: int, steps: int | None = None, pctx=None):
    """ITC combination (MultiKE_model.py:225-239): optimize
    cv_weight * (cv_name_weight*||e-n||^2 + ||e-r||^2 + ||e-a||^2)."""
    cvw, cnw = cfg.cv_weight, cfg.cv_name_weight

    def prep(constants, ents):
        return {"ent": ents, "rv_ent": ents, "av_ent": ents}, None

    def loss_fn(rows, dense, stopped, aux, constants, ents):
        final = l2_normalize(rows["ent"], axis=-1)
        names = constants["name_embeds"][ents]
        cr = l2_normalize(rows["rv_ent"], axis=-1)
        ca = l2_normalize(rows["av_ent"], axis=-1)
        loss = cnw * alignment_loss(final, names)
        loss += alignment_loss(final, cr)
        loss += alignment_loss(final, ca)
        return cvw * loss

    return _sampled_epoch(cfg, "common_space", n, cfg.entity_batch_size,
                          prep, loss_fn, with_weights=False,
                          needs_constants=True, steps=steps, pctx=pctx)


def build_space_mapping_epoch(cfg: Config, n: int, steps: int | None = None, pctx=None):
    """SSL combination (MultiKE_model.py:241-261): only 'shared' variables
    (ent + the three mappings) receive updates; rv/av are frozen reads."""
    ow = cfg.orthogonal_weight
    dim = cfg.dim
    eye = jnp.eye(dim, dtype=jnp.float32)

    def prep(constants, ents):
        return {"ent": ents}, None

    def loss_fn(rows, dense, stopped, aux, constants, ents):
        final = l2_normalize(rows["ent"], axis=-1)
        nv = constants["name_embeds"][ents]
        rv = lookup_norm(stopped["rv_ent"], ents)   # frozen reads
        av = lookup_norm(stopped["av_ent"], ents)
        loss = space_mapping_loss(nv, final, dense["nv_mapping"], eye, ow)
        loss += space_mapping_loss(rv, final, dense["rv_mapping"], eye, ow)
        loss += space_mapping_loss(av, final, dense["av_mapping"], eye, ow)
        return loss

    return _sampled_epoch(cfg, "space_mapping", n, cfg.entity_batch_size,
                          prep, loss_fn, with_weights=False,
                          needs_constants=True, steps=steps, pctx=pctx)
