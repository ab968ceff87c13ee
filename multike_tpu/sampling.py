"""On-device negative sampling.

The reference generates negatives in host producer processes with rejection
against the full triple set (base/batch.py:57-116: corrupt head or tail with
p=0.5, <=10 retries, 'truncated' mode restricts candidates to each entity's
top-2% cosine neighbors). Here sampling runs inside the jitted train step
with ``jax.random``:

  * corrupt-head-vs-tail is an independent Bernoulli(0.5) per negative;
  * candidates are uniform over the owning KG's contiguous entity-id range
    (sequential id assignment guarantees contiguity — kg.py
    ``entity_id_ranges``), or a row of the truncated-neighbor table when the
    corrupted entity has one;
  * true triples are NOT rejected: with |E| entities and average degree d the
    false-negative probability per sample is ~d/|E| (<0.1% on DWY100K). The
    reference itself gives up after 10 retries and accepts near-duplicates
    (base/batch.py:103-105). This delta is documented and testable.

Neighbor state is a pair of dense tables (one per KG) padded over the full
entity range with a per-entity validity flag, so lookups are a gather.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class TripleFilter:
    """Blocked Bloom filter over the true-triple set, for exact-rejection
    negative sampling on device (SURVEY.md §7 'host-precomputed bitmask'
    option).

    Both hash bits of a triple land in ONE 32-bit word (the classic
    cache-line-blocked Bloom layout), so a membership test costs a single
    word gather — the gather is the expensive part of an on-device test
    (measured ~2x sampling throughput vs two independent bit gathers on
    v5e). A positive test is 'possibly a true triple' (false-positive rate
    ~(64n/m / 32)^2, ~0.5% at the default 4 MB for DWY100K-sized triple
    sets — harmless extra rejections), a negative test is 'definitely not a
    true triple', so no true triple ever survives as a negative — stronger
    than the reference's 10-retry rejection which eventually gives up
    (base/batch.py:103-105).

    ``log2m`` (total bits) is pytree aux data (static under jit)."""

    def __init__(self, bits: jnp.ndarray, log2m: int):
        self.bits = bits        # (m/32,) uint32
        self.log2m = log2m

    def tree_flatten(self):
        return (self.bits,), self.log2m

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)


_H1 = np.uint32(0x9E3779B1)
_H2 = np.uint32(0x85EBCA77)
_HA = np.uint32(0xC2B2AE35)
_HB = np.uint32(0x27D4EB2F)
_HC = np.uint32(0x165667B1)


def _hash_word_bits_np(h, r, t, log2m):
    """(word index, bit1, bit2) — both bits within the same word."""
    h = h.astype(np.uint32)
    r = r.astype(np.uint32)
    t = t.astype(np.uint32)
    x = (h * _H1) ^ (r * _H2) ^ (t * _HA)
    word = (x * _H1) >> np.uint32(32 - (log2m - 5))
    b1 = (x * _HB + _HC) >> np.uint32(27)
    b2 = (x * _HA + _HB) >> np.uint32(27)
    return word, b1, b2


def build_triple_filter(triples: np.ndarray, log2m: int = 25) -> TripleFilter:
    """triples: (n, 3) int array. m = 2^log2m bits (4 MB at 25)."""
    m_words = (1 << log2m) // 32
    bits = np.zeros(m_words, np.uint32)
    if len(triples):
        word, b1, b2 = _hash_word_bits_np(
            triples[:, 0], triples[:, 1], triples[:, 2], log2m)
        mask = (np.uint32(1) << b1) | (np.uint32(1) << b2)
        np.bitwise_or.at(bits, word, mask)
    return TripleFilter(bits=jnp.asarray(bits), log2m=log2m)


def _filter_contains(tfilter: TripleFilter, h, r, t):
    log2m = tfilter.log2m
    h = h.astype(jnp.uint32)
    r = r.astype(jnp.uint32)
    t = t.astype(jnp.uint32)
    x = (h * _H1) ^ (r * _H2) ^ (t * _HA)
    word_idx = (x * _H1) >> np.uint32(32 - (log2m - 5))
    b1 = (x * _HB + _HC) >> np.uint32(27)
    b2 = (x * _HA + _HB) >> np.uint32(27)
    word = tfilter.bits[word_idx.astype(jnp.int32)]     # ONE gather
    mask = (jnp.uint32(1) << b1) | (jnp.uint32(1) << b2)
    return (word & mask) == mask


def triple_filter_contains(tfilter: TripleFilter, h, r, t):
    """Public membership test (broadcasting over any shape): True where
    (h, r, t) is *possibly* a true triple, False where definitely not."""
    return _filter_contains(tfilter, h, r, t)


class NeighborState(NamedTuple):
    """Truncated-sampling candidates: ``nbr[e, :cnt[e]]`` holds neighbor
    entity ids; ``cnt[e] == 0`` means entity e has no neighbor list (sampling
    falls back to uniform — the draw derives this from the one ``cnt``
    gather, so ``has`` is never gathered in the hot path). ``cnt`` allows the
    two KGs' different top-k sizes (K = 2% of each KG's entity count) to
    share one dense table without sampling bias."""
    nbr: jnp.ndarray  # (E, Kmax) int32
    has: jnp.ndarray  # (E,) bool  (== cnt > 0; kept for introspection/tests)
    cnt: jnp.ndarray  # (E,) int32 (0 = no neighbors)


def empty_neighbor_state(entities_num: int, k: int = 8) -> NeighborState:
    # k floor of 8: a degenerate (E, 1) table provokes a pathological XLA
    # optimization pass (~minutes of compile for the surrounding scan,
    # measured on the axon TPU backend). Prefer passing neighbors=None until
    # the first refresh — the no-neighbor epoch variant compiles leaner.
    return NeighborState(
        nbr=jnp.zeros((entities_num, max(k, 8)), jnp.int32),
        has=jnp.zeros((entities_num,), bool),
        cnt=jnp.zeros((entities_num,), jnp.int32),
    )


def sample_negatives(key, pos: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                     neg_num: int,
                     neighbors: Optional[NeighborState] = None,
                     tfilter: Optional[TripleFilter] = None,
                     retries: int = 0) -> jnp.ndarray:
    """pos: (B, 3) int32 [h, r, t]; lo/hi: (B,) per-row entity-id range of the
    owning KG (half-open). Returns (B * neg_num, 3) with reference layout —
    all ``neg_num`` corruptions of positive i occupy rows
    [i*neg_num, (i+1)*neg_num).

    With ``tfilter`` + ``retries`` > 0, candidates testing positive against
    the true-triple Bloom filter are resampled up to ``retries`` times
    (exact-rejection mode, cf. base/batch.py:86-116; the reference gives up
    after 10 retries and accepts a possibly-true triple — here a still-
    positive candidate after the last retry is likewise accepted)."""
    B = pos.shape[0]
    h = jnp.repeat(pos[:, 0], neg_num)
    r = jnp.repeat(pos[:, 1], neg_num)
    t = jnp.repeat(pos[:, 2], neg_num)
    lo_r = jnp.repeat(lo, neg_num)
    hi_r = jnp.repeat(hi, neg_num)
    n = B * neg_num

    def draw(k, corrupt_head):
        k_ent, k_pick = jax.random.split(k)
        uniform = lo_r + jax.random.randint(k_ent, (n,), 0, 1 << 30) % (hi_r - lo_r)
        if neighbors is not None:
            target = jnp.where(corrupt_head, h, t)
            cnts = neighbors.cnt[target]    # one gather; cnt 0 == no neighbors
            col = jax.random.randint(k_pick, (n,), 0, 1 << 30) \
                % jnp.maximum(cnts, 1)
            from_nbr = neighbors.nbr[target, col]
            return jnp.where(cnts > 0, from_nbr, uniform)
        return uniform

    key, k_side, k0 = jax.random.split(key, 3)
    corrupt_head = jax.random.bernoulli(k_side, 0.5, (n,))
    cand = draw(k0, corrupt_head)

    if tfilter is not None and retries > 0:
        for _ in range(retries):
            neg_h = jnp.where(corrupt_head, cand, h)
            neg_t = jnp.where(corrupt_head, t, cand)
            is_true = _filter_contains(tfilter, neg_h, r, neg_t)
            key, k_i = jax.random.split(key)
            redraw = draw(k_i, corrupt_head)
            cand = jnp.where(is_true, redraw, cand)

    neg_h = jnp.where(corrupt_head, cand, h)
    neg_t = jnp.where(corrupt_head, t, cand)
    return jnp.stack([neg_h, r, neg_t], axis=1)


def sample_corruptions(key, pos: jnp.ndarray, lo, hi, neg_num: int,
                       neighbors: Optional[NeighborState] = None,
                       tfilter: Optional[TripleFilter] = None,
                       retries: int = 0, reject_mode: str = "resample"):
    """Per-slot iid corruption draws in *structured* form: returns
    ``(cand (B, K) int32, corrupt_head (B, K) bool, keep)`` instead of
    assembled negative triples. Sampling semantics are identical to
    :func:`sample_negatives` (corrupt head-or-tail with p=0.5 per slot,
    uniform over the owning KG's range / neighbor rows, optional Bloom
    rejection) — the structured form lets the training step reuse the
    positive rows for the uncorrupted side, halving embedding-table
    gather/scatter traffic. ``lo``/``hi`` may be scalars or (B,) vectors.

    True-triple rejection (``tfilter`` set) has two modes:

      * ``"resample"`` (reference semantics, base/batch.py:86-116): redraw
        offenders up to ``retries`` times in an early-exit while_loop;
        ``keep`` is returned as None. Each redraw repeats the full
        (neighbor-)draw, so with neighbor tables a pass costs ~1 ms on v5e.
      * ``"drop"``: ONE Bloom pass; offenders are not replaced but returned
        with ``keep[b, k] = 0`` so the loss drops those slots. Statistically
        a ~hit-rate thinning of the K-sample negative Monte-Carlo sum
        (identical expectation over the surviving slots); unlike resampling
        it never accepts a true triple. ~2x sampling throughput in the
        neighbor-truncated phase (see docs/EXPERIMENTS.md breakdown).
    """
    if reject_mode not in ("drop", "resample"):
        raise ValueError(f"reject_mode must be 'drop' or 'resample', "
                         f"got {reject_mode!r}")
    B = pos.shape[0]
    h, r, t = pos[:, 0], pos[:, 1], pos[:, 2]
    lo = jnp.broadcast_to(jnp.asarray(lo, jnp.int32), (B,))
    hi = jnp.broadcast_to(jnp.asarray(hi, jnp.int32), (B,))

    if neighbors is not None:
        # per-POSITIVE cnt gathers (2B) instead of per-slot (B*K): each slot's
        # target is h or t, so the two per-side counts cover every coin
        cnt_h = neighbors.cnt[h]            # (B,)
        cnt_t = neighbors.cnt[t]

    def draw(k, corrupt_head):
        k_ent, k_pick = jax.random.split(k)
        uniform = (lo[:, None] + jax.random.randint(k_ent, (B, neg_num), 0, 1 << 30)
                   % (hi - lo)[:, None])
        if neighbors is not None:
            target = jnp.where(corrupt_head, h[:, None], t[:, None])
            cnts = jnp.where(corrupt_head, cnt_h[:, None], cnt_t[:, None])
            col = (jax.random.randint(k_pick, (B, neg_num), 0, 1 << 30)
                   % jnp.maximum(cnts, 1))
            from_nbr = neighbors.nbr[target, col]
            return jnp.where(cnts > 0, from_nbr, uniform)
        return uniform

    key, k_side, k0 = jax.random.split(key, 3)
    corrupt_head = jax.random.bernoulli(k_side, 0.5, (B, neg_num))
    cand = draw(k0, corrupt_head)
    keep = None

    def bloom_hits(cand):
        neg_h = jnp.where(corrupt_head, cand, h[:, None])
        neg_t = jnp.where(corrupt_head, t[:, None], cand)
        return _filter_contains(tfilter, neg_h, r[:, None], neg_t)

    if tfilter is not None and reject_mode == "drop":
        keep = 1.0 - bloom_hits(cand).astype(jnp.float32)
    elif tfilter is not None and retries > 0:
        # Early-exit rejection: each pass rechecks every candidate against
        # the Bloom filter and redraws the offenders; a clean pass ends the
        # loop. True-triple hits are ~degree/|E| rare, so the typical cost is
        # ~2 Bloom passes instead of the reference's fixed-10 retry budget
        # (base/batch.py:103-105) unrolled.
        def cond(state):
            _, _, i, pending = state
            return pending & (i < retries)

        def body(state):
            cand, key, i, _ = state
            is_true = bloom_hits(cand)
            key, k_i = jax.random.split(key)
            cand = jnp.where(is_true, draw(k_i, corrupt_head), cand)
            return cand, key, i + 1, jnp.any(is_true)

        cand, key, _, _ = jax.lax.while_loop(
            cond, body, (cand, key, jnp.int32(0), jnp.bool_(True)))

    return cand, corrupt_head, keep


def sample_shared_corruptions(key, num_chunks: int, neg_num: int, lo: int, hi: int):
    """Chunk-shared candidate pools (the TPU-native scheme; same family as
    DGL-KE's chunk-based and PyTorch-BigGraph's batched negative sampling).
    Each chunk of positives shares ``neg_num`` head-corruption candidates and
    ``neg_num`` tail-corruption candidates drawn uniformly from the owning
    KG's id range [lo, hi). Returns ``(cand_h, cand_t)``, each
    (num_chunks, neg_num) int32. Candidate *marginals* match the reference's
    per-slot uniform draws (base/batch.py:86-116); sharing across a chunk
    turns negative scoring into an MXU matmul and cuts gradient scatter rows
    from O(B*K) to O(chunks*K)."""
    kh, kt = jax.random.split(key)
    span = hi - lo
    ch = lo + jax.random.randint(kh, (num_chunks, neg_num), 0, 1 << 30) % span
    ct = lo + jax.random.randint(kt, (num_chunks, neg_num), 0, 1 << 30) % span
    return ch, ct


def sample_shared_neighbor_corruptions(key, pos: jnp.ndarray, num_chunks: int,
                                       chunk_rows: int, neg_num: int,
                                       lo: int, hi: int,
                                       neighbors: NeighborState,
                                       mask: jnp.ndarray | None = None):
    """Neighbor-restricted chunk-shared candidate pools (the truncated-phase
    analog of :func:`sample_shared_corruptions`; VERDICT r2 item 2's
    'neighbor-bucketed chunk scheme').

    Each chunk of ``chunk_rows`` positives shares a head-corruption pool and a
    tail-corruption pool of ``neg_num`` candidates. Pool slot j of chunk c is
    drawn by picking a uniform DONOR positive u within the chunk and sampling
    from the neighbor row of the entity it would replace (``nbr[h_u]`` for
    the head pool, ``nbr[t_u]`` for the tail pool; uniform over [lo, hi) when
    the donor entity has no neighbor list). Each positive then scores against
    all 2*neg_num pool members at weight K/(2C) (losses.py chunk loss).

    vs per_slot truncated draws: the marginal candidate distribution becomes
    the chunk's MIXTURE of neighbor distributions instead of each positive's
    own — hard negatives are shared across the chunk rather than per-entity.
    Quality A/B'd against per_slot in benchmarks/neg_scheme_quality.py /
    docs/EXPERIMENTS.md; the payoff is structural: gradient scatter rows per
    step drop from O(B*K) to O(chunks*C), which is THE truncated-phase
    bottleneck on TPU (XLA scatters serialize per row — ~33 ns/row on v5e —
    while gathers are parallel; benchmarks/apply_bench.py).

    ``pos``: (num_chunks * chunk_rows, 3) positive triples (chunk-padded).
    ``mask``: optional (num_chunks * chunk_rows,) validity mask (nonzero =
    real slot). Padded slots hold copies of earlier triples
    (streams._padded_epoch_indices pads with index 0), and the padding is a
    contiguous SUFFIX of each chunk — so donors are drawn from
    [0, real_rows) per chunk, keeping the donor distribution uniform over
    real positives even in tail chunks. Without a mask every slot is assumed
    real. Returns ``(cand_h, cand_t)``, each (num_chunks, neg_num) int32."""
    kd_h, kd_t, kc_h, kc_t, ku = jax.random.split(key, 5)
    h = pos[:, 0].reshape(num_chunks, chunk_rows)
    t = pos[:, 2].reshape(num_chunks, chunk_rows)
    if mask is not None:
        real_rows = jnp.maximum(
            (mask.reshape(num_chunks, chunk_rows) != 0)
            .sum(axis=1).astype(jnp.int32), 1)              # (NC,)
    else:
        real_rows = jnp.full((num_chunks,), chunk_rows, jnp.int32)
    span = hi - lo
    uni = lo + jax.random.randint(ku, (2, num_chunks, neg_num), 0, 1 << 30) % span

    def pool(kd, kc, ents, uniform):
        donor = (jax.random.randint(kd, (num_chunks, neg_num), 0, 1 << 30)
                 % real_rows[:, None])
        target = jnp.take_along_axis(ents, donor, axis=1)   # (NC, C)
        cnts = neighbors.cnt[target]
        col = (jax.random.randint(kc, (num_chunks, neg_num), 0, 1 << 30)
               % jnp.maximum(cnts, 1))
        return jnp.where(cnts > 0, neighbors.nbr[target, col], uniform)

    return pool(kd_h, kc_h, h, uni[0]), pool(kd_t, kc_t, t, uni[1])


def sample_neg_heads(key, pos_h: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                     neg_num: int,
                     neighbors: Optional[NeighborState] = None) -> jnp.ndarray:
    """Attribute-style corruption: head only (base/batch.py:172-184)."""
    k_ent, k_pick = jax.random.split(key)
    h = jnp.repeat(pos_h, neg_num)
    lo_r = jnp.repeat(lo, neg_num)
    hi_r = jnp.repeat(hi, neg_num)
    n = h.shape[0]
    uniform = lo_r + jax.random.randint(k_ent, (n,), 0, 1 << 30) % (hi_r - lo_r)
    if neighbors is not None:
        cnts = neighbors.cnt[h]             # one gather; cnt 0 == no neighbors
        col = jax.random.randint(k_pick, (n,), 0, 1 << 30) % jnp.maximum(cnts, 1)
        from_nbr = neighbors.nbr[h, col]
        return jnp.where(cnts > 0, from_nbr, uniform)
    return uniform


def build_neighbor_state(entities_num: int, parts) -> NeighborState:
    """Assemble one dense neighbor table from per-KG refresh results.

    ``parts``: iterable of (useful_entities (U,), neighbor_ids (U, K)) with
    neighbor ids already mapped into the global entity-id space."""
    # floor of 8 columns: see empty_neighbor_state (columns >= cnt are never
    # sampled; they only keep the table shape out of XLA's degenerate-gather
    # pathology)
    kmax = max(max(p[1].shape[1] for p in parts), 8)
    nbr = np.zeros((entities_num, kmax), np.int32)
    has = np.zeros((entities_num,), bool)
    cnt = np.zeros((entities_num,), np.int32)
    for useful_entities, neighbor_ids in parts:
        k = neighbor_ids.shape[1]
        nbr[useful_entities, :k] = neighbor_ids
        has[useful_entities] = True
        cnt[useful_entities] = k
    return NeighborState(nbr=jnp.asarray(nbr), has=jnp.asarray(has),
                         cnt=jnp.asarray(cnt))
