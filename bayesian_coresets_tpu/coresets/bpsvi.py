"""Batch pseudocoreset variational inference (BatchPSVI).

Covers the reference's ``bayesiancoresets/coreset/bpsvi.py:6-63``: initialize
``sz`` synthetic pseudo-points by uniform subsampling with weights N/sz and
idcs = -1, then *jointly* optimize weights and point locations by projected
Adam, where every gradient step refits the sampler, redraws S posterior
samples, and evaluates log-likelihood + datapoint-gradient projections.

The hot contraction — ``ugrad = -(w ⊙ pgrads ⊙ resid).sum(samples)/S`` over a
(sz, S, d) tensor (reference bpsvi.py:53) — is a single einsum that XLA fuses
with the projection matmuls; the whole optimization is one jitted
``lax.scan``.  Nonnegativity is enforced on the weight block only
(reference nn_idcs = arange(sz), bpsvi.py:58).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.opt import nn_opt
from ..utils import config
from .coreset import Coreset
from .projector import TangentFamily
from .sparsevi import resolve_family


def uniform_init_idcs(n: int, sz: int, key) -> jax.Array:
    """Uniform without-replacement init draw, computed on the HOST.

    The reference initializes with ``np.random.choice(..., replace=False)``
    (bpsvi.py:17-20).  Drawing in-jit with ``jax.random.choice`` lowers to
    a full n-element random sort that GSPMD REPLICATES on every device of
    a row-sharded build — a measured 1.6-1.8x per-device compiled-work
    inflation at 8 devices (tests/test_sharding_hlo.py::
    test_svi_bpsvi_sharded_work_is_flat caught it).  A one-time O(sz) host
    draw (seeded deterministically from the jax key, so reset()/rebuild
    reproducibility is preserved) removes the device cost entirely; the
    in-jit ``data[init_idcs]`` gather stays an O(sz*d) partial-gather.
    """
    seed = int(np.asarray(jax.random.key_data(key)).ravel()[-1])
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.choice(int(n), size=int(sz),
                                  replace=False).astype(np.int32))


@partial(jax.jit, static_argnames=("family", "n_sub_opt",
                                   "opt_itrs", "step_sched"))
def bpsvi_build(data, init_idcs, key, *, family: TangentFamily,
                n_sub_opt, opt_itrs: int, step_sched):
    """Optimize a size-``len(init_idcs)`` pseudocoreset initialized at the
    given data rows (see :func:`uniform_init_idcs`); returns (wts, pts)."""
    n, d = data.shape
    sz = init_idcs.shape[0]
    k_opt = key

    # uniform without-replacement init (reference bpsvi.py:17-20), drawn on
    # the host by the caller so no n-scale replicated sort enters the jit
    pts0 = data[init_idcs]
    wts0 = jnp.full((sz,), n / sz, data.dtype)
    x0 = jnp.concatenate([wts0, pts0.reshape(-1)])
    nn_mask = jnp.arange(sz * (1 + d)) < sz         # clamp weights only

    def grad_fn(x, k, carry):
        w = x[:sz]
        u = x[sz:].reshape(sz, d)
        k1, k2 = jax.random.split(k)
        if family.make_ctx_warm is not None:
            # warm-started refit (e.g. Laplace mode carried across Adam
            # steps; see TangentFamily) — the pseudo-points move slowly
            ctx, carry = family.make_ctx_warm(k1, w, u, carry)
        else:
            ctx = family.make_ctx(k1, w, u)
        if n_sub_opt is None:
            vecs = family.project(ctx, data)
            scale = 1.0
        else:
            sub_idcs = jax.random.randint(k2, (n_sub_opt,), 0, n)
            vecs = family.project(ctx, data[sub_idcs])
            scale = n / n_sub_opt
        corevecs = family.project(ctx, u)            # (sz, S)
        pgrads = family.project_grad(ctx, u)         # (sz, S, d)
        S = vecs.shape[1]
        resid = scale * jnp.sum(vecs, axis=0) - w @ corevecs     # (S,)
        wgrad = -(corevecs @ resid) / S
        ugrad = -jnp.einsum("m,msd,s->md", w, pgrads, resid) / S
        return jnp.concatenate([wgrad, ugrad.reshape(-1)]), carry

    if family.make_ctx_warm is not None:
        carry0 = family.init_carry(wts0, pts0)
        xf, _ = nn_opt(x0, grad_fn, k_opt, nn_mask=nn_mask, opt_itrs=opt_itrs,
                       step_sched=step_sched, aux0=carry0)
    else:
        xf = nn_opt(x0, lambda x, k: grad_fn(x, k, None)[0], k_opt,
                    nn_mask=nn_mask, opt_itrs=opt_itrs, step_sched=step_sched)
    return xf[:sz], xf[sz:].reshape(sz, d)


@partial(jax.jit, static_argnames=("family", "n_sub"))
def bpsvi_error(data, wts, pts, key, *, family: TangentFamily, n_sub):
    """Monte-Carlo estimate of the Hilbert residual norm
    ||sum_i ell_i - sum_m w_m ell_m|| / sqrt(S) under the current
    pseudocoreset posterior — the objective BPSVI's joint optimization
    drives down.  (The reference's error() is an unimplemented TODO
    returning 0, bpsvi.py:62-63; same extension as SparseVI's svi_error.)"""
    n = data.shape[0]
    k1, k2 = jax.random.split(key)
    ctx = family.make_ctx(k1, wts, pts)
    if n_sub is None:
        vecs = family.project(ctx, data)
        scale = 1.0
    else:
        sub_idcs = jax.random.randint(k2, (n_sub,), 0, n)
        vecs = family.project(ctx, data[sub_idcs])
        scale = n / n_sub
    corevecs = family.project(ctx, pts)
    resid = scale * jnp.sum(vecs, axis=0) - wts @ corevecs
    return jnp.sqrt(jnp.sum(resid * resid) / vecs.shape[1])


class BatchPSVICoreset(Coreset):
    """Stateful facade with the reference's API (bpsvi.py:7-13).

    NOTE: as in the reference, ``build(sz)``'s argument is the pseudocoreset
    SIZE, not an iteration count, and each call re-initializes.
    """

    def __init__(self, data, ll_projector, opt_itrs: int, n_subsample_opt=None,
                 step_sched=lambda i: 1.0 / (1.0 + i), seed: int = 0):
        super().__init__()
        self.data = jnp.asarray(data, config.default_dtype())
        self.family = resolve_family(ll_projector)
        if self.family.project_grad is None:
            raise ValueError("BatchPSVICoreset requires a grad_loglikelihood "
                             "(reference projector.py:23-24)")
        n = self.data.shape[0]
        self.opt_itrs = int(opt_itrs)
        self.n_subsample_opt = None if n_subsample_opt is None else min(n, int(n_subsample_opt))
        self.step_sched = step_sched
        self._seed = seed
        self._key = jax.random.key(seed)

    def reset(self):
        self._key = jax.random.key(self._seed)
        super().reset()

    def _build(self, sz: int):
        self._key, k_init, k = jax.random.split(self._key, 3)
        init_idcs = uniform_init_idcs(self.data.shape[0], int(sz), k_init)
        wts, pts = bpsvi_build(
            self.data, init_idcs, k, family=self.family,
            n_sub_opt=self.n_subsample_opt, opt_itrs=self.opt_itrs,
            step_sched=self.step_sched)
        self.wts = np.asarray(wts)
        self.pts = np.asarray(pts)
        self.idcs = -1 * np.ones(int(sz), dtype=np.int64)   # synthetic points

    def _optimize(self):
        pass  # joint optimization already runs inside _build (bpsvi.py:21-22)

    def error(self) -> float:
        """MC estimate of the Hilbert residual norm (see bpsvi_error).

        The reference returns 0.0 here (unimplemented TODO, bpsvi.py:62-63).
        Returns 0.0 for an empty pseudocoreset to preserve the base-class
        optimize() contract.
        """
        if self.wts is None or np.size(self.wts) == 0:
            return 0.0
        self._key, k = jax.random.split(self._key)
        return float(bpsvi_error(
            self.data, jnp.asarray(self.wts, self.data.dtype),
            jnp.asarray(self.pts, self.data.dtype), k,
            family=self.family, n_sub=self.n_subsample_opt))
