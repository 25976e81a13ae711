"""Pallas TPU kernels for the greedy-selection hot loop.

The per-iteration cost of the snnls build loop (SURVEY.md §3.1: the
hottest path in the framework) is one streaming pass over the (n, S)
selection matrix plus several small elementwise/reduction kernels.  XLA
already runs the streaming matmul at HBM speed-of-light; this kernel fuses
the score computation (matmul + geodesic guards + masking) WITH the argmax
reduction into a single pass, eliminating the intermediate (n, 2) score
materialization and the separate reduction kernels.

Used by the GIGA select when ``use_pallas=True`` is passed to
:func:`bayesian_coresets_tpu.ops.snnls.build`.

MEASURED (v5e, N=100k, S=500, int8 selection copy): the XLA path runs the
select at HBM speed-of-light (~0.072s for M=500) and this kernel is ~2.5x
slower (~0.178s) because the MXU's 128-lane minimum wastes 64x compute on
the 2-column direction matmul.  RE-MEASURED at beyond-HBM scale (v5e,
N=20M int8-resident, S=512): XLA 15.0 ms/iteration vs this kernel 228
ms/iteration — the per-sequential-grid-tile overhead is ~11 us (20k tiles
at tile_rows=1024), so the gap grows with n.

FORMAL CLOSURE (round 3 geometry sweep, scripts/bench_select_bandwidth.py):
the XLA int8 select matmul streams V at 756-758 GB/s at beyond-HBM sizes
(>=8M rows) with <0.2% run-to-run spread — ~100% of the 753 GB/s this
chip's memory system delivers to a matmul-free calibration read (92% of
the 819 GB/s spec, which no kernel reaches).  Geometry (row-tile
multiple, ragged n, unpadded S, 2-128 RHS columns) has no effect beyond
~2%; round 2's "75-91% band" low tail was relay-latency measurement
jitter at small sizes, not hardware.  The ENTIRE solver iteration (score
epilogue, argmax, row gather, reweight scalars, w update, monotonicity
bookkeeping) adds <=4% on top of that matmul.  There is no headroom for a fused kernel to
win on any hot path of this workload: selection is input-bandwidth-bound
at XLA's achieved rate, the reweight is O(S) scalars, the BPSVI
(sz, S, d) contraction is a single MXU einsum XLA already fuses, and the
streamed-quantize epilogue is a minor fraction of a chunk's projection
cost.  The kernel stays off by default and is kept as the tested exemplar
of the framework's Pallas integration path (incl. the sequential-grid
running-argmax accumulation pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _giga_select_kernel(v_ref, dirs_ref, nrminv_ref, bias_ref,
                        score_ref, idx_ref, *, tile_rows: int):
    """One row-tile: fused scores + RUNNING global argmax.

    v_ref:      (T, Sp) selection matrix tile (f32/bf16/int8)
    dirs_ref:   (Sp, 128) direction block; col 0 = cdir_n, col 1 = xw_n,
                remaining columns zero (lane padding)
    nrminv_ref: (T,) f32 reciprocal column norms (1 for int8/pre-normalized).
                1-D on purpose: an (n, 1) f32 operand would be laid out with
                128x lane padding in HBM (9.5 GB at n=20M)
    bias_ref:   (T,) f32 additive mask (0 valid, -inf invalid/padding)
    score_ref:  (1, 1) f32 out — global best score (accumulated across the
                sequential TPU grid; a per-tile output would need O(n/T)
                SMEM and stops scaling at beyond-HBM row counts)
    idx_ref:    (1, 1) int32 out — global argmax row index
    """
    i = pl.program_id(0)
    v = v_ref[:]
    if v.dtype == jnp.int8:
        acc = jax.lax.dot_general(
            v, dirs_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        dots = acc.astype(jnp.float32) * (1.0 / (127.0 * 127.0))
    else:
        dots = jax.lax.dot_general(
            v, dirs_ref[:].astype(v.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    nr = nrminv_ref[:].reshape(tile_rows, 1)
    bi = bias_ref[:].reshape(tile_rows, 1)
    d0 = dots[:, 0:1] * nr                           # (T, 1)
    d1 = dots[:, 1:2] * nr
    geo_ok = (d1 > -1.0 + 1e-14) & (1.0 - d1 * d1 > 0.0)
    denom = jnp.sqrt(jnp.clip(1.0 - d1 * d1, 1e-30, None))
    score = jnp.where(geo_ok, d0 / denom, 0.0) + bi  # (T, 1)

    best = jnp.max(score)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, 1), 0)
    best_row = jnp.min(jnp.where(score == best, rows, tile_rows)) + i * tile_rows

    @pl.when(i == 0)
    def _init():
        score_ref[0, 0] = best
        idx_ref[0, 0] = best_row

    @pl.when(i > 0)
    def _accumulate():
        prev = score_ref[0, 0]
        better = best > prev          # strict: first max wins, like argmax
        score_ref[0, 0] = jnp.where(better, best, prev)
        idx_ref[0, 0] = jnp.where(better, best_row, idx_ref[0, 0])


@functools.partial(jax.jit, static_argnames=("tile_rows",))
def giga_select_pallas(Vsel: jax.Array, dirs2: jax.Array, nrminv: jax.Array,
                       bias: jax.Array, tile_rows: int = 1024):
    """Fused GIGA selection: returns (global argmax index, its score).

    Vsel: (np, Sp) with np % tile_rows == 0 and Sp % 128 == 0 (make_consts
    pads the selection copy once); dirs2: (S, 2) [cdir_n, xw_n] with
    S <= Sp; nrminv: (np,) reciprocal norms; bias: (np,) additive mask
    (-inf on invalid/padded rows).
    """
    np_rows, Sp = Vsel.shape
    S = dirs2.shape[0]
    assert np_rows % tile_rows == 0 and Sp % 128 == 0
    if Vsel.dtype == jnp.int8:
        # quantize the (unit-norm) directions to match the int8 MXU path
        dirs2 = jnp.clip(jnp.round(dirs2 * 127.0), -127, 127).astype(jnp.int8)
    dirs = jnp.zeros((Sp, 128), dirs2.dtype).at[:S, :2].set(dirs2)

    grid = np_rows // tile_rows
    score, idx = pl.pallas_call(
        functools.partial(_giga_select_kernel, tile_rows=tile_rows),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile_rows, Sp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Sp, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
    )(Vsel, dirs, nrminv.astype(jnp.float32), bias.astype(jnp.float32))

    return idx[0, 0], score[0, 0]
