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
  solver can never select them) instead of being physically removed.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.snnls import GIGA
from .coreset import Coreset
from .projector import Projector


class HilbertCoreset(Coreset):
    def __init__(self, data, ll_projector: Projector, n_subsample: int | None = None,
                 snnls=GIGA, seed: int = 0, max_active: int | None = None,
                 select_dtype=None):
        super().__init__()
        data = np.asarray(data)
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

    def reset(self):
        self.snnls.reset()
        super().reset()

    def _sync(self):
        w = self.snnls.weights()
        keep = w > 0
        self.wts = w[keep]
        self.idcs = self.sub_idcs[keep]
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
