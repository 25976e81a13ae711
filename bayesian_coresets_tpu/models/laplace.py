"""Jittable Laplace approximation via fixed-iteration Newton.

Replaces the reference's host-side ``get_laplace`` (scipy BFGS + retry loop,
reference examples/logistic_poisson_regression/main.py:16-41) with a
bounded, branch-free Newton solve that runs inside jit/scan — SparseVI
refits the posterior approximation on *every* optimizer step
(reference coreset/sparsevi.py:70-74), so this must be compilable into the
inner loop rather than a scipy callback.

For the models used here (logistic/Poisson regression with N(0, I) priors)
the weighted log-joint is strictly concave with Hessian ⪯ -I, so damped
Newton converges quadratically; a fixed iteration count (default 25) is a
deterministic-shape substitute for scipy's convergence test.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve, solve_triangular


class LaplaceResult(NamedTuple):
    mu: jax.Array       # mode of the weighted log-joint (d,)
    USig: jax.Array     # Sig = USig @ USig.T (upper tri); None-like for diag mode
    LSigInv: jax.Array  # SigInv = LSigInv @ LSigInv.T (lower tri)


@partial(jax.jit, static_argnames=("grad_fn", "hess_fn", "num_iters", "diag"))
def laplace_approx(
    z: jax.Array,
    wts: jax.Array,
    mu0: jax.Array,
    grad_fn: Callable,   # (z, th(1,d), wts) -> (1, d)
    hess_fn: Callable,   # (z, th(1,d), wts) -> (1, d, d)  (or (1, d) diag)
    num_iters: int = 25,
    diag: bool = False,
    damping: float = 1e-7,
) -> LaplaceResult:
    """Fit a Gaussian N(mu, Sig) at the mode of the weighted log-joint.

    Unlike the reference we sample with the exact covariance factor:
    Sig = inv(-H) = L^{-T} L^{-1} with L = chol(-H), so USig = L^{-T} and
    samples are mu + eps @ USig.T.  (The reference samples with
    inv(L) inv(L)^T = inv(L^T L), a transpose slip in get_laplace; the
    difference is a rotation of the proposal and does not affect its use as
    a projector, but we keep the exact form.)
    """
    d = mu0.shape[0]

    def newton_step(_, th):
        g = grad_fn(z, th[None, :], wts)[0]
        if diag:
            h = hess_fn(z, th[None, :], wts)[0]
            step = g / (-h + damping)
        else:
            h = hess_fn(z, th[None, :], wts)[0]
            nh = -h + damping * jnp.eye(d, dtype=h.dtype)
            step = cho_solve(cho_factor(nh, lower=True), g)
        return th + step

    mu = jax.lax.fori_loop(0, num_iters, newton_step, mu0)

    if diag:
        hdiag = hess_fn(z, mu[None, :], wts)[0]
        lsiginv = jnp.sqrt(-hdiag)
        usig = 1.0 / lsiginv
        return LaplaceResult(mu, usig, lsiginv)

    h = hess_fn(z, mu[None, :], wts)[0]
    LSigInv = jnp.linalg.cholesky(-h)
    USig = solve_triangular(LSigInv, jnp.eye(d, dtype=h.dtype), lower=True).T
    return LaplaceResult(mu, USig, LSigInv)


def sample_laplace(key, result: LaplaceResult, n_samples: int, diag: bool = False) -> jax.Array:
    """Draw n_samples from the fitted Gaussian."""
    d = result.mu.shape[0]
    eps = jax.random.normal(key, (n_samples, d), dtype=result.mu.dtype)
    if diag:
        return result.mu + eps * result.USig
    return result.mu + eps @ result.USig.T
