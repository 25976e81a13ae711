"""Probe: Pallas packed-int4 select — can VMEM unpack beat the int8 stream?

scripts/probe_int4_select.py showed XLA cannot exploit 4-bit selection
copies: native S4 dots crash the relay plugin and an XLA-level unpack
materializes the int8 intermediates in HBM (0.87 ms/iter vs 0.76 int8).
The only remaining route is a Pallas kernel that reads the PACKED
(n, S/2) buffer and unpacks in VMEM.  This probe times:
  (a) the existing giga_select_pallas (int8) at tile_rows 1024/4096/8192
      — isolates the known ~11 us/tile sequential-grid overhead;
  (b) a packed variant (two int4 per int8, lo|hi split matmuls) at the
      same tiles — half the HBM read traffic if the pipeline streams.
Baseline to beat: XLA int8 select at 0.761 ms/iter (N=1M, S=512).

Usage: python scripts/probe_int4_pallas.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, S, T_ITERS, REPS = 1 << 20, 512, 16, 3


def _packed_select_kernel(p_ref, dlo_ref, dhi_ref, nrminv_ref, bias_ref,
                          score_ref, idx_ref, *, tile_rows: int):
    i = pl.program_id(0)
    p = p_ref[:]                                      # (T, S/2) packed int8
    lo = ((p << 4).astype(jnp.int8) >> 4).astype(jnp.int8)   # sign-extended low nibble
    hi = (p >> 4).astype(jnp.int8)                            # high nibble (arithmetic)
    acc = (lax.dot_general(lo, dlo_ref[:], (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)
           + lax.dot_general(hi, dhi_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32))
    # NB bandwidth probe only: this dequant constant ignores the sqrt(S)/4
    # factor of make()'s quantization scale, so scores are intentionally
    # UNNORMALIZED (uniform across rows — argmax unaffected, timing
    # unaffected); do not reuse for accuracy comparisons
    dots = acc.astype(jnp.float32) * (1.0 / (7.0 * 127.0))
    nr = nrminv_ref[:].reshape(tile_rows, 1)
    bi = bias_ref[:].reshape(tile_rows, 1)
    d0 = dots[:, 0:1] * nr
    d1 = dots[:, 1:2] * nr
    denom = jnp.sqrt(jnp.clip(1.0 - d1 * d1, 1e-30, None))
    score = d0 / denom + bi

    best = jnp.max(score)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, 1), 0)
    best_row = jnp.min(jnp.where(score == best, rows, tile_rows)) + i * tile_rows

    @pl.when(i == 0)
    def _init():
        score_ref[0, 0] = best
        idx_ref[0, 0] = best_row

    @pl.when(i > 0)
    def _acc():
        prev = score_ref[0, 0]
        better = best > prev
        score_ref[0, 0] = jnp.where(better, best, prev)
        idx_ref[0, 0] = jnp.where(better, best_row, idx_ref[0, 0])


@functools.partial(jax.jit, static_argnames=("tile_rows",))
def packed_select(P, dirs2, nrminv, bias, tile_rows=4096):
    np_rows, Sp_half = P.shape
    Sq = jnp.clip(jnp.round(dirs2 * 127.0), -127, 127).astype(jnp.int8)  # (S, 2)
    # packed column j holds original columns (2j | 2j+1): lo-dirs = even rows
    dlo = jnp.zeros((Sp_half, 128), jnp.int8).at[:, :2].set(Sq[0::2])
    dhi = jnp.zeros((Sp_half, 128), jnp.int8).at[:, :2].set(Sq[1::2])
    grid = np_rows // tile_rows
    score, idx = pl.pallas_call(
        functools.partial(_packed_select_kernel, tile_rows=tile_rows),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile_rows, Sp_half), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Sp_half, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Sp_half, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
    )(P, dlo, dhi, nrminv.astype(jnp.float32), bias.astype(jnp.float32))
    return idx[0, 0], score[0, 0]


def timed_fetch(fn, *args):
    t0 = time.perf_counter()
    out = jax.device_get(fn(*args))
    return time.perf_counter() - t0, out


def main():
    from bayesian_coresets_tpu.ops.pallas_kernels import giga_select_pallas

    print("devices:", jax.devices())

    @jax.jit
    def make(key):
        v = jax.random.normal(key, (N, S), jnp.float32)
        vn = v / jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))
        V8 = jnp.clip(jnp.round(vn * 127.0), -127, 127).astype(jnp.int8)
        scale = 7.0 * jnp.sqrt(jnp.float32(S)) / 4.0
        q = jnp.clip(jnp.round(vn * scale), -7, 7).astype(jnp.int8)
        P = ((q[:, 0::2] & 0x0F) | (q[:, 1::2] << 4)).astype(jnp.int8)
        return V8, P

    V8, P = jax.block_until_ready(make(jax.random.key(0)))
    nrminv = jnp.ones((N,), jnp.float32)
    bias = jnp.zeros((N,), jnp.float32)

    null = jax.jit(lambda x: x + 1)
    jax.device_get(null(jnp.int32(0)))
    nulls = sorted(timed_fetch(null, jnp.int32(i))[0] for i in range(7))
    null_t = nulls[len(nulls) // 2]
    print(f"null rtt: {null_t*1e3:.1f} ms")

    def scan_over(fn, buf, tile_rows):
        @jax.jit
        def run(buf):
            def body(acc, k):
                d = jax.random.uniform(k, (S, 2), jnp.float32, -0.04, 0.04)
                idx, sc = fn(buf, d, nrminv, bias, tile_rows=tile_rows)
                return acc + sc + jnp.float32(idx), None
            acc, _ = lax.scan(body, jnp.float32(0),
                              jax.random.split(jax.random.key(9), T_ITERS))
            return acc
        return run

    for name, fn, buf, nbytes in [
        ("pallas-int8", giga_select_pallas, V8, N * S),
        ("pallas-packed4", packed_select, P, N * S // 2),
    ]:
        for tile in (4096, 8192):
            try:
                run = scan_over(fn, buf, tile)
                timed_fetch(run, buf)  # compile
                ts = sorted(timed_fetch(run, buf)[0] - null_t for _ in range(REPS))
                per_it = ts[len(ts) // 2] / T_ITERS
                gbs = nbytes / per_it / 1e9
                print(f"{name:15s} T={tile:5d}: {per_it*1e3:7.3f} ms/iter  "
                      f"{gbs:6.1f} GB/s read")
            except Exception as e:
                print(f"{name:15s} T={tile:5d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
