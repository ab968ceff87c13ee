"""Pallas TPU kernel: fused similarity + rank-count + argmax.

The evaluation hot spot (SURVEY.md §3.4: dense n1 x n2 matmul + per-row sort,
~19.6 GB materialized for DWY100K test) becomes one fused kernel: for each
(row-block i, col-block j) grid cell the MXU computes the (BM, BN) score tile
in VMEM, and the epilogue immediately reduces it into three (n1,) vectors —

    count[i] += #{ j in tile : s_ij > gold_i, j != gold_col_i }
    best_val / best_idx running argmax

so the score matrix never exists in HBM and no sort ever runs. The same
kernel serves greedy-alignment eval (Hits@k/MR/MRR are functions of count)
and, with the CSLS column penalty, the CSLS ranking path.

Grid: (n1/BM, n2/BN), col-blocks innermost; the per-row accumulators alias
the same output block across the j axis (standard Pallas reduction layout).
All vector operands are carried as (1, n) 2-D arrays — Mosaic requires
lane-aligned >=2-D layouts (1-D f32 blocks fail layout verification on real
TPUs). Inputs are padded to block multiples by the host wrapper; padded
columns are masked by index, padded rows produce garbage that the wrapper
drops.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = float("-inf")


def _rank_kernel(e1_ref, gold_ref, gidx_ref, e2_ref, r2_ref,
                 count_ref, bval_ref, bidx_ref, *, bn: int, n2: int,
                 use_csls: bool):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        count_ref[:] = jnp.zeros_like(count_ref)
        bval_ref[:] = jnp.full_like(bval_ref, NEG_INF)
        bidx_ref[:] = jnp.zeros_like(bidx_ref)

    # HIGHEST: the MXU's default rounds f32 inputs to bf16 (measured ~1e-1
    # score error) which corrupts ranks; 3-pass f32-equivalent mode keeps the
    # count exact to ~1e-5.
    s = jax.lax.dot_general(
        e1_ref[:], e2_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)           # (BM, BN)

    if use_csls:
        s = 2.0 * s - r2_ref[0, :][None, :]

    col0 = j * bn
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    valid = cols < n2
    s = jnp.where(valid, s, NEG_INF)

    gold = gold_ref[0, :]                               # (BM,)
    gidx = gidx_ref[0, :]
    beats = jnp.logical_and(s > gold[:, None], cols != gidx[:, None])
    count_ref[0, :] = count_ref[0, :] + jnp.sum(beats.astype(jnp.int32), axis=1)

    tile_best = jnp.max(s, axis=1)
    tile_arg = col0 + jnp.argmax(s, axis=1).astype(jnp.int32)
    take = tile_best > bval_ref[0, :]
    bidx_ref[0, :] = jnp.where(take, tile_arg, bidx_ref[0, :])
    bval_ref[0, :] = jnp.where(take, tile_best, bval_ref[0, :])


def _pad_to(x, m, axis, value=0.0):
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit,
                   static_argnames=("bm", "bn", "use_csls", "interpret"))
def rank_count_pallas(e1: jnp.ndarray, gold: jnp.ndarray, gold_idx: jnp.ndarray,
                      e2: jnp.ndarray, r2: Optional[jnp.ndarray] = None,
                      bm: int = 512, bn: int = 2048, use_csls: bool = False,
                      interpret: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (count, best_idx, best_val), each (n1,).

    e1 (n1, d), e2 (n2, d) — already normalized if cosine ranking is wanted;
    gold (n1,) score of the gold column (CSLS-adjusted when use_csls);
    gold_idx (n1,) its column id; r2 (n2,) CSLS column penalty.
    """
    n1, d = e1.shape
    n2 = e2.shape[0]
    e1p = _pad_to(e1, bm, 0)
    e2p = _pad_to(e2, bn, 0)
    goldp = _pad_to(gold, bm, 0)[None, :]
    gidxp = _pad_to(gold_idx, bm, 0)[None, :]
    if r2 is None:
        r2p = jnp.zeros((1, e2p.shape[0]), jnp.float32)
    else:
        r2p = _pad_to(r2, bn, 0)[None, :]
    m1, m2 = e1p.shape[0], e2p.shape[0]
    grid = (m1 // bm, m2 // bn)

    kernel = functools.partial(_rank_kernel, bn=bn, n2=n2, use_csls=use_csls)
    count, bval, bidx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, j: (i, 0)),
            pl.BlockSpec((1, bm), lambda i, j: (0, i)),
            pl.BlockSpec((1, bm), lambda i, j: (0, i)),
            pl.BlockSpec((bn, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, bm), lambda i, j: (0, i)),
            pl.BlockSpec((1, bm), lambda i, j: (0, i)),
            pl.BlockSpec((1, bm), lambda i, j: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, m1), jnp.int32),
            jax.ShapeDtypeStruct((1, m1), jnp.float32),
            jax.ShapeDtypeStruct((1, m1), jnp.int32),
        ],
        interpret=interpret,
    )(e1p, goldp, gidxp, e2p, r2p)
    return count[0, :n1], bidx[0, :n1], bval[0, :n1]
