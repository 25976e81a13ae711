"""Log-likelihood projectors: finite discretizations of the tangent space.

Covers the reference's ``bayesiancoresets/projector.py:4-32``.  A projector
draws S posterior-approximation samples theta_s and maps each datapoint to
the S-vector of *centered* log-likelihoods [ll(x, theta_s) - mean_s ll] —
the Hilbert-space feature vectors consumed by the snnls solvers and the
Monte-Carlo gradients of SparseVI/BatchPSVI.

TPU-native departures:
- samplers are keyed: ``sampler(key, n_samples, wts, pts)`` (explicit PRNG
  instead of the reference's global NumPy stream);
- ``project`` is jitted, batched over data, and returns fixed-shape arrays;
- gradient projections are centered over the *sample* axis.  (The reference
  centers ``glls`` over the parameter axis — ``glls.mean(axis=2)`` at
  projector.py:26 — which is inconsistent with the centering of ``lls`` over
  samples at projector.py:21; we center both over samples, matching the
  pseudocoreset construction in the PSVI paper.)
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class ProjectorFns(NamedTuple):
    """Pure-function projector protocol consumed by the jitted coreset cores.

    sample:     (key, n_samples:int, wts, pts) -> (S, d_theta) samples
    loglik:     (pts, samples) -> (n, S) log-likelihood matrix
    grad_loglik: optional (pts, samples) -> (n, S, d) gradient wrt datapoints
    """

    sample: Callable
    loglik: Callable
    grad_loglik: Optional[Callable] = None


def center_lls(lls: jax.Array) -> jax.Array:
    """Per-datum centering over samples (reference projector.py:21)."""
    return lls - jnp.mean(lls, axis=1, keepdims=True)


def center_glls(glls: jax.Array) -> jax.Array:
    """Per-datum/per-coordinate centering over samples (see module note)."""
    return glls - jnp.mean(glls, axis=1, keepdims=True)


from functools import partial


@partial(jax.jit, static_argnames=("fns", "grad"))
def project(fns: ProjectorFns, pts: jax.Array, samples: jax.Array, grad: bool = False):
    """Compute centered (and optionally gradient) projections (jitted)."""
    lls = center_lls(fns.loglik(pts, samples))
    if not grad:
        return lls
    if fns.grad_loglik is None:
        raise ValueError("grad projection requested but grad_loglik not provided")
    glls = center_glls(fns.grad_loglik(pts, samples))
    return lls, glls


class Projector:
    """Abstract stateful projector (reference projector.py:4-9)."""

    def project(self, pts, grad: bool = False):
        raise NotImplementedError

    def update(self, wts, pts):
        raise NotImplementedError


class BlackBoxProjector(Projector):
    """Sampler + log-likelihood discretizer (reference projector.py:11-32).

    ``sampler(key, n_samples, wts, pts)`` must be jittable; the projector
    threads an internal PRNG key so repeated ``update`` calls draw fresh
    posterior samples (the reference advances the global NumPy stream).
    """

    def __init__(self, sampler, projection_dimension: int, loglikelihood,
                 grad_loglikelihood=None, key: jax.Array | None = None):
        self.projection_dimension = int(projection_dimension)
        self.fns = ProjectorFns(sampler, loglikelihood, grad_loglikelihood)
        self._key = key if key is not None else jax.random.key(0)
        self.samples = None
        self.update(jnp.zeros((0,)), jnp.zeros((0, 0)))

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def update(self, wts, pts):
        """Redraw S samples from the current coreset posterior approximation."""
        sample = jax.jit(self.fns.sample, static_argnums=(1,))
        self.samples = sample(self._next_key(), self.projection_dimension,
                              jnp.asarray(wts), jnp.asarray(pts))

    def project(self, pts, grad: bool = False):
        return project(self.fns, jnp.asarray(pts), self.samples, grad=grad)
