"""Hilbert-norm coresets: projection + sparse NNLS.

Covers the reference's ``bayesiancoresets/coreset/hilbert.py:6-48``:
discretize log-likelihoods into per-datum feature vectors, form the system
A = vecs.T, b = sum of vecs, and delegate to a pluggable snnls solver
(default GIGA).  Weights map back through the (optional) subsample indices.

TPU-native departures:
- the (n, S) projection is one jitted matmul-dominated evaluation;
- the subsample keeps a *static* trace shape: the reference's
  ``np.unique(np.random.randint(...))`` (hilbert.py:16) shrinks the array,
  so here duplicate and zero-vector rows are masked ``valid=False`` (the
  solver can never select them) instead of being physically removed;
- ``stream_chunk_size`` enables beyond-f32-HBM construction: the data is
  projected chunk by chunk, each f32 chunk is quantized ON-CHIP to the
  int8-resident representation (normalized int8 rows + f32 row norms) and
  only that copy is kept, so the peak footprint is N*S bytes + one chunk —
  ~4x the dataset capacity of the default path on the same chip.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.snnls import GIGA, make_consts_quantized
from .coreset import Coreset
from .projector import Projector


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.jit
def _quantize_chunk(vecs, live):
    """f32 (C, S) projection chunk -> (int8 normalized rows, norms, b part).

    Module-level jit so every streamed HilbertCoreset with the same chunk
    shape shares one compilation.
    """
    rowmask = jnp.arange(vecs.shape[0]) < live
    vecs = jnp.where(rowmask[:, None], vecs, 0.0)
    nrm = jnp.sqrt(jnp.sum(vecs * vecs, axis=1))
    safe = jnp.where(nrm > 0, nrm, 1.0)
    q = jnp.clip(jnp.round(vecs / safe[:, None] * 127.0), -127, 127).astype(jnp.int8)
    return q, nrm, jnp.sum(vecs, axis=0)


@partial(jax.jit, donate_argnums=(0,))
def _write_chunk(buf, q, start, bacc, bsum):
    return (jax.lax.dynamic_update_slice(buf, q, (start, 0)), bacc + bsum)


class HilbertCoreset(Coreset):
    def __init__(self, data, ll_projector: Projector, n_subsample: int | None = None,
                 snnls=GIGA, seed: int = 0, max_active: int | None = None,
                 select_dtype=None, stream_chunk_size: int | None = None):
        super().__init__()
        data = np.asarray(data)
        if stream_chunk_size is not None:
            self._init_streamed(data, ll_projector, int(stream_chunk_size),
                                snnls, seed, max_active, n_subsample)
            return
        if n_subsample is None:
            sub_idcs = np.arange(data.shape[0])
            vecs = np.asarray(ll_projector.project(data))
            valid = np.ones(data.shape[0], dtype=bool)
        else:
            # match reference sampling distribution (randint-with-replacement
            # then dedup, hilbert.py:16) but keep static shape via masking
            rng = np.random.default_rng(seed)
            sub_idcs = rng.integers(0, data.shape[0], size=n_subsample)
            uniq = np.zeros(n_subsample, dtype=bool)
            uniq[np.unique(sub_idcs, return_index=True)[1]] = True
            vecs = np.asarray(ll_projector.project(data[sub_idcs]))
            valid = uniq
        # mask zero vectors instead of pruning (hilbert.py:20-22)
        valid = valid & (np.sqrt((vecs**2).sum(axis=1)) > 0.0)
        if not valid.any():
            raise ValueError("all projected vectors are zero or masked")

        b = vecs[valid].sum(axis=0)
        self.snnls = snnls(jnp.asarray(vecs.T), jnp.asarray(b),
                           valid=jnp.asarray(valid), seed=seed,
                           max_active=max_active, select_dtype=select_dtype)
        self.sub_idcs = sub_idcs
        self.data = data

    def _init_streamed(self, data, ll_projector, chunk: int, snnls_cls,
                       seed: int, max_active, n_subsample):
        """Chunked projection -> on-chip int8 quantization -> int8-resident
        solver consts.  No f32 (n, S) is materialized on device or host."""
        if n_subsample is not None:
            raise ValueError("stream_chunk_size and n_subsample are mutually "
                             "exclusive (subsample the data first instead)")
        n = data.shape[0]
        n_chunks = -(-n // chunk)

        # streaming chunks are only consistent if the projector holds ONE
        # fixed context across project() calls (true for FamilyProjector /
        # BlackBoxProjector; a custom Projector that resamples inside
        # project() would put chunks in different tangent bases).  Verify by
        # projecting a sentinel row twice before committing to the stream.
        sentinel = jnp.asarray(data[:1])
        p1 = np.asarray(ll_projector.project(sentinel))
        p2 = np.asarray(ll_projector.project(sentinel))
        if not np.array_equal(p1, p2):
            raise ValueError(
                "stream_chunk_size requires a projector with a fixed context "
                "across project() calls; this one returned different vectors "
                "for the same input (does it resample inside project()?)")

        buf = None
        b = None
        norm_chunks = []
        for c in range(n_chunks):
            lo = c * chunk
            live = min(chunk, n - lo)
            xc = np.zeros((chunk,) + data.shape[1:], data.dtype)
            xc[:live] = data[lo:lo + live]
            vecs = ll_projector.project(jnp.asarray(xc))
            if buf is None:
                S = vecs.shape[1]
                # allocate pre-padded (row tile multiple x lane multiple) so
                # make_consts_quantized never has to copy the big buffer
                rows = _round_up(max(n, n_chunks * chunk), 1024)
                Sp = _round_up(S, 128)
                buf = jnp.zeros((rows, Sp), jnp.int8)
                b = jnp.zeros((S,), jnp.float32)
            q, nrm, bsum = _quantize_chunk(vecs, jnp.int32(live))
            buf, b = _write_chunk(buf, q, jnp.int32(lo), b, bsum)
            norm_chunks.append(np.asarray(nrm)[:live])

        norms = np.concatenate(norm_chunks)
        pad = buf.shape[0] - n
        valid = np.pad(norms > 0.0, (0, pad))
        if not valid.any():
            raise ValueError("all projected vectors are zero or masked")
        sampling = snnls_cls.method if snnls_cls.method in ("importance", "uniform") else None
        consts = make_consts_quantized(
            buf, jnp.asarray(np.pad(norms, (0, pad), constant_values=1.0)),
            jnp.pad(b, (0, buf.shape[1] - b.shape[0])),   # tiny (S,) -> (Sp,)
            valid=jnp.asarray(valid), sampling=sampling)
        self.snnls = snnls_cls.from_consts(consts, seed=seed, max_active=max_active)
        self.sub_idcs = np.arange(n)
        self.data = data

    def reset(self):
        self.snnls.reset()
        super().reset()

    def _sync(self):
        # device-side active-set extraction: transfers O(max_active) values
        # instead of the full (n,) weight vector (the dominant host-sync
        # cost at beyond-HBM n).  Solver rows may be padded beyond the true
        # candidate count (int8-resident tile padding; pads stay at w=0).
        idx, vals = self.snnls.active()
        keep = (idx >= 0) & (idx < len(self.sub_idcs))
        idx, vals = idx[keep], vals[keep]
        order = np.argsort(idx)            # stable order by solver column
        self.wts = vals[order]
        self.idcs = self.sub_idcs[idx[order]]
        self.pts = self.data[self.idcs]
        self.reached_numeric_limit = self.snnls.reached_numeric_limit

    def _build(self, itrs: int):
        self.snnls.build(itrs)
        self._sync()

    def _optimize(self):
        self.snnls.optimize()
        self._sync()

    def error(self) -> float:
        return self.snnls.error()
