"""Pallas TPU kernel: fused row-sparse Adagrad apply.

The optimizer apply is the measured wall of the training step at DWY100K
scale (docs/EXPERIMENTS.md r3/r4): XLA lowers the gather -> acc update ->
param update -> two scatters chain of train/sparse_adagrad.row_apply as FOUR
separate HBM passes whose scatters serialize per row (~33 ns/row on v5e).
This kernel performs the whole read-modify-write in ONE pass over the
touched rows: for each block of (deduplicated, sentinel-padded) row ids it
DMAs the param and accumulator rows HBM->VMEM, applies

    acc_row += gsum^2
    param_row -= lr * gsum * where(acc_row > 0, rsqrt(acc_row + eps), 0)

on the VPU, and DMAs both rows back — touching each row's bytes exactly
once per array instead of once per op, with the row DMAs batched per block
so their latencies overlap.

Status: DORMANT on the axon tunnel (Mosaic kernels execute but wedge every
subsequent device->host transfer — see eval/alignment._use_pallas_default);
validated in interpret mode against the XLA row_apply
(tests/test_pallas_kernels.py), gated by Config.use_pallas_apply for real
TPU runtimes. In-place semantics via input_output_aliases: the caller's
donated param/acc buffers are updated without a copy.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _apply_kernel(loc_ref, param_in, acc_in, gsum_ref, param_out, acc_out,
                  prow, arow, gsem, ssem, *, bl: int, E: int, lr: float,
                  eps: float):
    i = pl.program_id(0)
    base = i * bl

    def gather_one(k, _):
        r = loc_ref[base + k]

        @pl.when(r < E)
        def _():
            pltpu.make_async_copy(param_out.at[r], prow.at[k],
                                  gsem.at[0, k]).start()
            pltpu.make_async_copy(acc_out.at[r], arow.at[k],
                                  gsem.at[1, k]).start()
        return 0

    def gather_wait(k, _):
        r = loc_ref[base + k]

        @pl.when(r < E)
        def _():
            pltpu.make_async_copy(param_out.at[r], prow.at[k],
                                  gsem.at[0, k]).wait()
            pltpu.make_async_copy(acc_out.at[r], arow.at[k],
                                  gsem.at[1, k]).wait()
        return 0

    # start every row DMA of the block, then wait — the per-row latencies
    # overlap instead of serializing like XLA's scatter
    jax.lax.fori_loop(0, bl, gather_one, 0)
    jax.lax.fori_loop(0, bl, gather_wait, 0)

    g = gsum_ref[:]                              # (bl, d)
    new_acc = arow[:] + g * g
    upd = jnp.where(new_acc > 0,
                    jax.lax.rsqrt(new_acc + eps), 0.0) * g
    arow[:] = new_acc
    prow[:] = prow[:] - lr * upd

    def scatter_one(k, _):
        r = loc_ref[base + k]

        @pl.when(r < E)
        def _():
            pltpu.make_async_copy(prow.at[k], param_out.at[r],
                                  ssem.at[0, k]).start()
            pltpu.make_async_copy(arow.at[k], acc_out.at[r],
                                  ssem.at[1, k]).start()
        return 0

    def scatter_wait(k, _):
        r = loc_ref[base + k]

        @pl.when(r < E)
        def _():
            pltpu.make_async_copy(prow.at[k], param_out.at[r],
                                  ssem.at[0, k]).wait()
            pltpu.make_async_copy(arow.at[k], acc_out.at[r],
                                  ssem.at[1, k]).wait()
        return 0

    jax.lax.fori_loop(0, bl, scatter_one, 0)
    jax.lax.fori_loop(0, bl, scatter_wait, 0)


@functools.partial(jax.jit,
                   static_argnames=("lr", "eps", "bl", "interpret"))
def fused_row_adagrad_pallas(param: jnp.ndarray, acc: jnp.ndarray,
                             loc: jnp.ndarray, gsum: jnp.ndarray, lr: float,
                             eps: float = 1e-7, bl: int = 128,
                             interpret: bool = False):
    """One fused Adagrad step on ``param``/``acc`` rows ``loc``.

    loc (N,) int32: UNIQUE row ids; slots >= param.shape[0] are dropped
    (the sentinel convention of train/sparse_adagrad.row_apply, which
    produces (loc, gsum) from possibly-duplicated batch ids).
    gsum (N, d) f32: per-unique-row summed gradients. Returns the updated
    (param, acc) — same buffers when the caller donates them."""
    E, d = param.shape
    N = loc.shape[0]
    pad = (-N) % bl
    if pad:
        # distinct OOB sentinels keep the row set unique
        loc = jnp.concatenate(
            [loc, E + N + jnp.arange(pad, dtype=loc.dtype)])
        gsum = jnp.concatenate([gsum, jnp.zeros((pad, d), gsum.dtype)])
    n_pad = loc.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                     # loc
        grid=(n_pad // bl,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # param (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),  # acc (HBM)
            pl.BlockSpec((bl, d), lambda i, loc_ref: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((bl, d), jnp.float32),      # param rows
            pltpu.VMEM((bl, d), jnp.float32),      # acc rows
            pltpu.SemaphoreType.DMA((2, bl)),      # gather semaphores
            pltpu.SemaphoreType.DMA((2, bl)),      # scatter semaphores
        ],
    )
    kernel = functools.partial(_apply_kernel, bl=bl, E=E, lr=lr, eps=eps)
    new_param, new_acc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((E, d), param.dtype),
                   jax.ShapeDtypeStruct((E, d), acc.dtype)],
        # flat input order: loc (scalar prefetch), param, acc, gsum
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(loc, param, acc, gsum)
    return new_param, new_acc
