"""Leapfrog integrator + metric operations for HMC/NUTS.

The mass-matrix metric is a single array ``inv_mass`` whose rank selects
the geometry at TRACE time (both paths compile to static code):

- ``(d,)``  — diagonal metric, ``inv_mass`` = estimated posterior variances
  (Stan's ``diag_e``, the reference's implicit default via pystan).
- ``(d, d)`` — dense metric, ``inv_mass`` = regularized posterior
  covariance estimate Sigma = M^{-1} (Stan's ``dense_e``).  Momentum is
  drawn as r = L^{-T} u with Sigma = L L^T, so cov(r) = Sigma^{-1} = M.

Dense mode targets strongly correlated posteriors where no diagonal
rescaling helps (e.g. the airportdelays d=16 coreset posteriors); its
per-transition cost is one (d, d) Cholesky + O(d^2) matvecs per leapfrog —
negligible next to the log-density gradient for the small-d weighted
posteriors this package samples.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class IntegratorState(NamedTuple):
    z: jax.Array      # position (d,)
    r: jax.Array      # momentum (d,)
    logp: jax.Array   # log-density at z
    grad: jax.Array   # d logp / dz


def mass_mul(inv_mass, r):
    """M^{-1} r (the metric velocity).  ``r`` may be (d,) or batched (K, d);
    the dense inverse mass is symmetric so ``r @ inv_mass`` covers both."""
    if inv_mass.ndim == 1:
        return r * inv_mass
    return r @ inv_mass


def sample_momentum(key, inv_mass, shape, dtype):
    """Draw r ~ N(0, M) for the given metric (M = inv_mass^{-1})."""
    u = jax.random.normal(key, shape, dtype)
    if inv_mass.ndim == 1:
        return u / jnp.sqrt(inv_mass)
    # Sigma = L L^T  =>  M = L^{-T} L^{-1};  r = L^{-T} u has cov M
    L = jnp.linalg.cholesky(inv_mass)
    return jax.scipy.linalg.solve_triangular(L.T, u, lower=False)


def leapfrog(value_and_grad_fn: Callable, state: IntegratorState, step_size,
             inv_mass) -> IntegratorState:
    """One leapfrog step; ``step_size`` may be negative (backward in time)."""
    r = state.r + 0.5 * step_size * state.grad
    z = state.z + step_size * mass_mul(inv_mass, r)
    logp, grad = value_and_grad_fn(z)
    r = r + 0.5 * step_size * grad
    return IntegratorState(z, r, logp, grad)


def kinetic(r, inv_mass):
    return 0.5 * jnp.sum(r * mass_mul(inv_mass, r), axis=-1)
