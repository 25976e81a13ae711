"""Weighted-likelihood posteriors and the user-facing MCMC entry point.

The reference achieves weighted-likelihood MCMC by hand-editing
Stan-generated C++ to scale each datum's log-likelihood contribution
(reference examples/common/mcmc.py:9-30 and
examples/common/stan_cache/weighted_*.cpp — the repo's only native code).
Here the weighted log-joint is just a jittable function
``sum_i w_i ll_i(theta) + log pi(theta)`` and any model module with
``log_joint`` works unmodified.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

from .sample import MCMCResult, run_nuts


def weighted_logdensity(model, z, wts) -> Callable:
    """Build theta -> log p(theta) + sum_i w_i ll(z_i, theta).

    ``model`` is any module/namespace exposing ``log_joint(z, th, wts)``
    batched over rows of th (e.g. models.logistic, models.poisson).
    """
    z = jnp.asarray(z)
    wts = jnp.asarray(wts)

    def logdensity(theta):
        return model.log_joint(z, theta[None, :], wts)[0]

    return logdensity


def laplace_init(model, z, wts, num_chains: int, key, d: int):
    """Overdispersed chain initializations from the Laplace approximation.

    Concentrated weighted posteriors (total weight ~N) sit tens of
    posterior-sds from the zero vector; a chain that has not finished that
    transit when the first adaptation window closes locks in a collapsed
    mass matrix and freezes.  Initializing from the Laplace fit (available
    for every model exposing grad/hess of the log-joint) starts every chain
    in the typical set AND gives properly overdispersed inits for split
    R-hat.  Falls back to zeros when the model lacks Hessians.
    """
    grad_fn = getattr(model, "grad_th_log_joint", None)
    hess_fn = getattr(model, "hess_th_log_joint", None)
    if grad_fn is None or hess_fn is None:
        return jnp.zeros((num_chains, d), jnp.asarray(z).dtype)
    from ..models.laplace import laplace_approx, sample_laplace
    lap = laplace_approx(jnp.asarray(z), jnp.asarray(wts), jnp.zeros(d),
                         grad_fn=grad_fn, hess_fn=hess_fn)
    return sample_laplace(key, lap, num_chains)


def run(model, z, wts, n_samples: int, key, d: int | None = None,
        num_chains: int = 1, max_depth: int = 10, target_accept: float = 0.9,
        init: jax.Array | None = None, pooled_adaptation: bool = False):
    """Weighted-posterior NUTS with the reference driver's conventions.

    Mirrors ``mcmc.run(...) -> (samples, t_sample)`` (reference
    examples/common/mcmc.py:58-68): ``n_samples`` warmup steps are taken
    before ``n_samples`` kept draws (the reference samples iter=2*N with
    half burn-in), and ``target_accept`` defaults to Stan's adapt_delta=0.9.
    Chains initialize from the Laplace approximation when the model provides
    gradients/Hessians (see :func:`laplace_init`); pass ``init`` to override.
    Returns (samples (num_chains*n_samples, d), wall_seconds, MCMCResult).
    """
    z = jnp.asarray(z)
    if d is None:
        d = z.shape[1]
    logdensity = weighted_logdensity(model, z, wts)
    if init is None:
        key, k_init = jax.random.split(key)
        init = laplace_init(model, z, wts, num_chains, k_init, d)
    t0 = time.perf_counter()
    res: MCMCResult = run_nuts(logdensity, init, key, num_warmup=n_samples,
                               num_samples=n_samples, max_depth=max_depth,
                               target_accept=target_accept,
                               pooled_adaptation=pooled_adaptation)
    jax.block_until_ready(res.samples)
    t = time.perf_counter() - t0
    samples = res.samples.reshape(-1, d)
    return samples, t, res
