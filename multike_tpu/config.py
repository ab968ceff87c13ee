"""Configuration for MultiKE-TPU.

Mirrors every hyperparameter key of the reference config
(``/root/reference/code/args.json``, loaded by ``utils.load_args`` at
``utils.py:10-22``) so a reference ``args.json`` loads unchanged, and adds
TPU-specific knobs (mesh shape, eval block sizes, dtype policy).

Reference quirks preserved intentionally:
  * ``encoder_active`` defaults to ``"thah"`` — the reference's typo
    (``args.json:10``) matches neither 'sigmoid' nor 'tanh' in
    ``auto_encoder.py:75-78``, so the literal autoencoder is *linear* in
    practice. We reproduce that default; set ``encoder_active='tanh'`` to get
    the activation the authors presumably intended.
"""
from __future__ import annotations

import dataclasses
import json
from typing import List


@dataclasses.dataclass
class Config:
    # --- paths (args.json:2-5) ---
    training_data: str = ""
    output: str = "output/results/"
    word2vec_path: str = ""
    dataset_division: str = "631/"

    # --- alignment module (args.json:7); only 'swapping' is supported, as in
    # the reference (MultiKE_model.py:68-69) ---
    alignment_module: str = "swapping"

    # --- literal encoder (args.json:9-13) ---
    encoder_epoch: int = 100
    encoder_active: str = "thah"  # reference typo => linear AE (see module doc)
    encoder_normalize: bool = True
    retrain_literal_embeds: bool = True
    literal_normalize: bool = True

    # --- model (args.json:15) ---
    dim: int = 75

    # --- optimization (args.json:17-23) ---
    learning_rate: float = 0.001
    optimizer: str = "Adagrad"
    max_epoch: int = 200
    shared_learning_max_epoch: int = 200
    batch_size: int = 5000
    entity_batch_size: int = 5000
    attribute_batch_size: int = 5000

    # --- negative sampling (args.json:25-28) ---
    neg_triple_num: int = 10
    neg_sampling: str = "truncated"
    # On-device exact rejection of true triples via a Bloom filter, for the
    # per_slot (reference-exact) scheme: max resample rounds (the reference's
    # host rejection gives up after 10 tries, base/batch.py:103-105 — same
    # cap here). Implemented as an early-exit while_loop: a round that finds
    # no true triple ends the loop, so the typical cost is ~2 Bloom passes.
    # 0 = accept rare false negatives (~degree/|E| probability per draw).
    neg_rejection_tries: int = 10
    # How a per_slot candidate testing positive against the Bloom filter is
    # handled (sampling.sample_corruptions):
    #   "drop"     — one Bloom pass; the offending slot is zero-masked out of
    #     the negative sum. Never accepts a true triple; statistically a
    #     ~hit-rate thinning of the K-sample negative Monte-Carlo estimator
    #     (identical expectation over surviving slots). ~2x sampling
    #     throughput in the neighbor-truncated phase: each resample pass
    #     repeats the full neighbor-table draw (~1 ms at batch 5000 on v5e).
    #   "resample" — reference-exact semantics (base/batch.py:86-116): redraw
    #     offenders up to neg_rejection_tries times (early-exit while_loop),
    #     accepting survivors of the final pass.
    # Direct drop-vs-resample A/B (benchmarks/neg_scheme_quality.py, 20-epoch
    # full ITC with truncated sampling active from epoch 8): drop rv/final
    # test MRR 0.9511/0.6695 vs resample 0.9452/0.6588 — 'drop' is within
    # noise (slightly ahead) at lower cost, so it is the default; set
    # "resample" for reference-exact semantics (recorded docs/EXPERIMENTS.md).
    neg_reject_mode: str = "drop"
    # Exact rejection for the chunk_shared scheme: zero-mask (positive,
    # pool-candidate) pairs that are true triples. Default OFF: the mask
    # costs O(batch * 2C) Bloom gathers per step (measured 36x step-time at
    # C=256 on v5e) while a false-negative pair occurs with probability
    # ~degree/|E| (~3e-5 on DWY100K) and carries pair weight K/(2C) — a
    # negligible gradient perturbation the quality A/B cannot detect
    # (benchmarks/neg_scheme_quality.py). Turn on for strict parity runs.
    chunk_exact_rejection: bool = False
    truncated_epsilon: float = 0.98
    truncated_freq: int = 20
    # Negative batching scheme (TPU-native knob):
    #   "chunk_shared" — chunks of positives share candidate pools; scoring
    #     becomes an MXU matmul and gradient scatter rows drop from O(B*K)
    #     to O(chunks*K) (DGL-KE chunk / PBG batched-negatives family).
    #     ~4x training throughput on TPU at reference quality.
    #   "per_slot"     — reference-exact iid candidate per negative slot
    #     (base/batch.py:86-116). Always used when truncated-neighbor
    #     sampling is active (neighbor candidates are entity-specific).
    neg_scheme: str = "chunk_shared"
    # Uniform-phase chunk size. r5 sweep at batch 80000 / 100K entities:
    # pool rows scale as chunks*2C, and 4096 (with C=128 below) measures
    # 10.07M triples/s vs 8.13M at 1024/C=256; equal-epoch 20K/25-epoch
    # full-ITC A/B is neutral (rv 0.9831 / final 0.9043 / av 0.6328 vs
    # 0.9836/0.9055/0.6343 at the r4 defaults - UNIFORM_CHUNK_AB.json).
    neg_chunk_size: int = 4096
    # Negative scheme of the neighbor-TRUNCATED phase (epochs past the first
    # refresh — where the reference spends most of its schedule,
    # args.json:26-28):
    #   "per_slot"     — reference-exact: each negative slot draws iid from
    #     the corrupted entity's OWN top-(1-eps) neighbor row
    #     (base/batch.py:62-116).
    #   "chunk_shared" — chunks of truncated_chunk_size positives share
    #     neighbor-restricted candidate pools (each pool member drawn from a
    #     uniformly chosen chunk member's neighbor row); scoring rides the
    #     chunk-loss matmul and — decisively on TPU — the gradient scatter
    #     rows per step drop O(B*K) -> O(chunks*C). XLA:TPU scatters
    #     serialize per row (~33 ns/row measured on v5e,
    #     benchmarks/apply_bench.py), so per_slot's 50K+ scattered rows per
    #     step are the truncated-phase wall. Hard negatives become
    #     chunk-mixture instead of per-entity; quality A/B (20-epoch full
    #     ITC, truncated from epoch 8): chunk s=256 rv/final test MRR
    #     0.9389/0.6629 vs per_slot 0.9511/0.6695 — the same delta class as
    #     the uniform-phase chunk scheme, for the structural scatter win
    #     (docs/EXPERIMENTS.md; benchmarks/neg_scheme_quality.py). Default;
    #     set "per_slot" for reference-exact truncated sampling.
    truncated_neg_scheme: str = "chunk_shared"
    # Chunk size of the truncated chunk_shared scheme. Smaller chunks mix
    # fewer entities' neighbor rows per pool (harder negatives, more scatter
    # rows). r5 A/Bs (20K entities, 25-epoch full ITC, TPU): 1024 and 4096
    # are both quality-neutral vs 256 (4096: rv 0.9806 / final 0.9039 /
    # av 0.6321 vs 256's 0.9836/0.9055/0.6343 - TRUNC_CHUNK_AB.json), and
    # scatter rows drop 16x: truncated throughput 6.10M (256) -> 8.75M
    # (1024) -> 9.89M (4096) triples/s at batch 80000 / 100K entities
    # (docs/EXPERIMENTS.md r5). NB the 20K A/B regime shares pools across
    # ENTIRE steps (chunk >= batch there) - harsher than DWY100K scale.
    truncated_chunk_size: int = 4096
    # Pool size C of the truncated chunk_shared scheme; 0 = neg_pool_size.
    # Scatter rows per step scale with chunks*C, so this is a direct
    # throughput lever. A/B at s=256 (20-epoch ITC): C=128 rv/final MRR
    # 0.9388/0.6597 == C=256's 0.9389/0.6629 within noise — the truncated
    # pools draw from neighbor rows (already hard), so they need less width
    # than the uniform phase's C=256 (docs/EXPERIMENTS.md).
    truncated_pool_size: int = 128
    # Size C of each shared candidate pool per chunk (head pool + tail pool);
    # 0 = neg_triple_num. Every positive scores against all 2C pool members,
    # each weighted neg_triple_num / (2C) — same expectation as the
    # reference's neg_triple_num coin-mixed per-slot draws. A LARGE pool is
    # essential for quality: C=10 explores ~500x fewer distinct negatives
    # per epoch than per-slot draws and loses ~0.09 MRR on the 5K synthetic;
    # C=256 matches per_slot (0.941 vs 0.944 rv MRR, 20-epoch ITC) at the
    # same wall time — the extra pool columns ride the MXU matmul
    # (benchmarks/neg_scheme_quality.py; DGL-KE/PBG use the same recipe).
    # r5: C=128 at chunk 4096 re-A/B'd neutral at 20K/25 epochs
    # (UNIFORM_CHUNK_AB.json) and cuts scatter rows 2x - the default pair.
    neg_pool_size: int = 128

    # --- host parallelism knobs of the reference (args.json:30-31); kept for
    # config compatibility. On TPU, batching/eval are on-device, so these only
    # affect host-side helpers. ---
    batch_threads_num: int = 4
    test_threads_num: int = 8

    # --- evaluation cadence (args.json:33-37) ---
    start_valid: int = 100
    eval_freq: int = 10
    # Which validation metric the ITC early-stop rule watches when
    # ``enable_early_stop`` is on: 'mrr' or 'hits1'. Kept for args.json
    # compatibility (args.json:35); the reference defines the two-step
    # decline rule but never triggers it (MultiKE_CSL.py:77-78 checks an
    # always-False flag), so the gate below defaults off.
    stop_metric: str = "mrr"
    top_k: List[int] = dataclasses.field(default_factory=lambda: [1, 5, 10, 50])
    is_save: bool = True

    # --- combination losses (args.json:38-40) ---
    orthogonal_weight: float = 2.0
    cv_name_weight: float = 1.0
    cv_weight: float = 1.0

    # --- predicate alignment (args.json:42-44) ---
    start_predicate_soft_alignment: int = 10
    predicate_soft_sim: float = 0.85
    predicate_init_sim: float = 0.90

    # --- extra learning rates (args.json:45-46) ---
    relation_learning_rate: float = 0.005
    ITC_learning_rate: float = 0.004

    # ------------------------------------------------------------------
    # TPU-native knobs (new in this framework)
    # ------------------------------------------------------------------
    # Apply the two-step ``stop_metric``-decline early-stop rule in the ITC
    # driver (eval/evaluation.early_stop). Off by default = reference parity:
    # MultiKE_CSL.py:77-78 evaluates the rule against an always-False flag,
    # so the reference always trains to max_epoch.
    enable_early_stop: bool = False
    # Mesh axes: data-parallel x table(model)-parallel. Product must divide
    # (or equal) the number of participating devices.
    mesh_dp: int = 1
    mesh_tp: int = 1
    # Evaluation engine block sizes (the engine never materializes n1 x n2):
    # eval_row_block 0 = auto (rows sized so one (rows, n2) score tile fits
    # the ~1 GB budget, eval/alignment._eval_row_block); >0 forces the size.
    # eval_col_block is the CSLS column-penalty pass block.
    eval_row_block: int = 0
    eval_col_block: int = 4096
    # Similarity matmul dtype for eval / neighbor refresh ('float32'|'bfloat16')
    eval_matmul_dtype: str = "float32"
    # approx_max_k recall target of the truncated-neighbor refresh (TPU path;
    # CPU uses exact top_k). The reference's top-2% cut is itself a sampling
    # heuristic, so the candidate pool tolerates approximate membership; the
    # recall knob is THE refresh cost lever on v5e at DWY100K scale
    # (k=2000 over 100K rows/KG): 0.95 -> 6.2 s/KG, 0.85 -> 1.05 s/KG,
    # 0.7 -> 0.4 s/KG. Default 0.85 keeps ~1700 of the true top-2000 per
    # entity at ~6x less refresh time. NB backend divergence: TPU training
    # samples from the approximate pool, CPU from the exact one — the
    # truncated-phase quality band (tests/test_quality_parity.py) covers the
    # sampling scheme, and the recall-vs-quality A/B is recorded in
    # docs/EXPERIMENTS.md; set 1.0 to force exact top_k on TPU too.
    neighbor_recall_target: float = 0.85
    # Persistent XLA compilation cache directory ("" = off). The 8-stream
    # driver compiles ~15 executables (phase variants x capacity buckets);
    # on TPU that dominated the cold FULL_SCALE_r05 run (13.3 of 14.2
    # s/epoch averaged; steady-state is ~1.0 s/epoch at 100K entities/KG).
    # Set to reuse compilations across runs of the same shapes.
    compile_cache_dir: str = ""
    # Checkpointing
    checkpoint_dir: str = ""
    checkpoint_freq: int = 0  # epochs; 0 = only final save
    # Structured metrics (jsonl); empty = in-memory only
    metrics_log_path: str = ""
    # Row-sparse Adagrad (train/sparse_adagrad.py): apply optimizer updates
    # only to the rows each step touches — identical math to dense optax
    # Adagrad (TF1 sparse-semantics). XLA:TPU scatters serialize per row, so
    # the row-sparse apply scales with the step's SCATTERED-ROW count (1.3ms
    # @20K ids, 2.4ms @60K over a 200K-row table on v5e) while dense optax
    # is ~flat per table size (1.0ms@100K rows, 2.1ms@200K, 6.4ms@1M) —
    # benchmarks/apply_bench.py. "auto" picks row-sparse when the step
    # touches <= 1/4 of the table (streams.use_row_sparse; matches every
    # measured point) or the table exceeds row_sparse_min_rows; True/"on" or
    # False/"off" force. Only effective with optimizer == "Adagrad".
    row_sparse_updates: str | bool = "auto"
    row_sparse_min_rows: int = 400_000
    # RNG
    seed: int = 2019
    # Pallas rank kernel in the eval engine: True = allowed where supported
    # (auto-detected per backend, eval/alignment._use_pallas_default — CPU
    # and the wedge-prone axon tunnel always use the scanned-XLA engine);
    # False = force the scanned-XLA engine everywhere.
    use_pallas: bool = True
    # Fused Pallas Adagrad apply (kernels/apply_kernel.py): one HBM pass
    # over the touched rows instead of XLA's four-op gather/scatter chain.
    # DORMANT by default — Mosaic kernels wedge the axon tunnel (see
    # eval/alignment._use_pallas_default) so it is interpret-validated only
    # (tests/test_pallas_kernels.py); flip on for real TPU runtimes.
    use_pallas_apply: bool = False
    # word2vec token length for literal encoding (literal_encoder.py:161)
    tokens_max_len: int = 5
    word2vec_dim: int = 300

    @property
    def hidden_dims(self) -> List[int]:
        # auto_encoder.py:26 — AE stack 1500 -> 1024 -> 512 -> dim
        return [1024, 512, self.dim]

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def load_config(file_path: str, **overrides) -> Config:
    """Load a reference-format JSON config (utils.py:10-16 equivalent).

    Unknown keys are ignored with a warning so future reference configs load.
    """
    with open(file_path, "r") as f:
        raw = json.load(f)
    known = {f.name for f in dataclasses.fields(Config)}
    unknown = [k for k in raw if k not in known]
    if unknown:
        print("load_config: ignoring unknown keys:", unknown)
    kwargs = {k: v for k, v in raw.items() if k in known}
    kwargs.update(overrides)
    return Config(**kwargs)
