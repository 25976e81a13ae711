"""NUTS driver: warmup + sampling for vmapped chains in one jit.

Replaces the reference's pystan driver (examples/common/mcmc.py:58-68,
``iter=2*N`` with half burn-in, chains=1).  Chains here are vmapped on-chip
and can be sharded across a device mesh (see parallel/); warmup adaptation
runs per chain.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .adapt import (
    build_segments,
    da_init,
    da_update,
    find_reasonable_step_size,
    welford_init,
    welford_update,
    welford_update_batch,
    welford_variance,
)
from .integrators import IntegratorState, mass_chol
from .nuts import nuts_kernel


class MCMCResult(NamedTuple):
    samples: jax.Array        # (num_chains, num_samples, d)
    accept_prob: jax.Array    # (num_chains,) mean sampling-phase acceptance
    num_divergent: jax.Array  # (num_chains,)
    step_size: jax.Array      # (num_chains,) adapted step size
    inv_mass: jax.Array       # (num_chains, d) diag metric, (num_chains, d, d) dense

    @property
    def inv_mass_diag(self):
        """Deprecated alias from before the dense metric existed — the field
        holds full (d, d) matrices in dense mode, so the name lied."""
        return self.inv_mass


def _single_chain(logdensity_fn, init_z, key, segments, num_samples,
                  max_depth, target_accept, dense_mass=False):
    vg = jax.value_and_grad(logdensity_fn)
    logp0, grad0 = vg(init_z)
    d = init_z.shape[0]
    dtype = init_z.dtype

    key, k_find = jax.random.split(key)
    inv_mass = jnp.eye(d, dtype=dtype) if dense_mass else jnp.ones(d, dtype)
    chol = mass_chol(inv_mass)
    step0 = find_reasonable_step_size(vg, init_z, logp0, grad0, inv_mass,
                                      k_find, chol=chol)

    state = IntegratorState(init_z, jnp.zeros(d, dtype), logp0, grad0)
    da = da_init(step0)
    wf = welford_init(d, dtype, dense=dense_mass)

    # one scan per (static) schedule segment; the mass matrix AND its
    # momentum factor are captured constants within each segment (the
    # Cholesky happens once per boundary, not per transition).  At window
    # boundaries: swap in the new mass, RE-SEARCH a reasonable step size
    # under it, restart dual averaging and Welford (Stan semantics — see
    # adapt.build_segments).
    for length, slow, boundary in segments:
        def warmup_step(carry, _, inv_mass=inv_mass, chol=chol, slow=slow):
            state, da, wf, key = carry
            key, k = jax.random.split(key)
            state, info = nuts_kernel(vg, k, state, jnp.exp(da.log_step),
                                      inv_mass, max_depth, inv_mass_chol=chol)
            da = da_update(da, info.accept_prob, target=target_accept)
            if slow:
                wf = welford_update(wf, state.z)
            return (state, da, wf, key), None

        (state, da, wf, key), _ = jax.lax.scan(
            warmup_step, (state, da, wf, key), None, length=length)
        if boundary:
            inv_mass = welford_variance(wf)
            chol = mass_chol(inv_mass)
            key, k_find = jax.random.split(key)
            step_b = find_reasonable_step_size(
                vg, state.z, state.logp, state.grad, inv_mass, k_find,
                init_step=jnp.exp(da.log_step), chol=chol)
            da = da_init(step_b)
            wf = welford_init(d, dtype, dense=dense_mass)

    step_size = jnp.exp(da.log_step_avg)

    def sample_step(carry, _):
        state, key = carry
        key, k = jax.random.split(key)
        state, info = nuts_kernel(vg, k, state, step_size, inv_mass, max_depth,
                                  inv_mass_chol=chol)
        return (state, key), (state.z, info.accept_prob, info.diverging)

    (_, _), (zs, accepts, divs) = jax.lax.scan(
        sample_step, (state, key), None, length=num_samples)
    return zs, jnp.mean(accepts), jnp.sum(divs), step_size, inv_mass


def _pooled_reasonable_step(vg, states, inv_mass, chol, key, num_chains,
                            init_step=None):
    """Median of per-chain reasonable step sizes — the pooled analogue of
    Stan's single-chain search, robust to any one outlier start."""
    ks = jax.random.split(key, num_chains)
    kw = {} if init_step is None else {"init_step": init_step}
    steps = jax.vmap(
        lambda k, z, lp, g: find_reasonable_step_size(
            vg, z, lp, g, inv_mass, k, chol=chol, **kw)
    )(ks, states.z, states.logp, states.grad)
    return jnp.median(steps)


def _pooled_chains(logdensity_fn, init_params, key, segments, num_samples,
                   max_depth, target_accept, dense_mass=False):
    """Warmup with CROSS-CHAIN pooled adaptation: one shared step size driven
    by the mean acceptance statistic over all chains, and one shared mass
    matrix estimated from every chain's positions (Chan-merged Welford).
    With chains sharded over a mesh these means become XLA collectives —
    the 'collective step-size adaptation' of the distributed design."""
    vg = jax.value_and_grad(logdensity_fn)
    num_chains, d = init_params.shape
    dtype = init_params.dtype

    logp0, grad0 = jax.vmap(vg)(init_params)
    states = IntegratorState(init_params, jnp.zeros_like(init_params), logp0, grad0)

    key, k_find = jax.random.split(key)
    inv_mass = jnp.eye(d, dtype=dtype) if dense_mass else jnp.ones(d, dtype)
    chol = mass_chol(inv_mass)
    # the shared dual-averaging seed pools ALL chains (median of per-chain
    # reasonable step sizes): with overdispersed inits, seeding from chain 0
    # alone lets one unlucky start poison the shared schedule
    step0 = _pooled_reasonable_step(vg, states, inv_mass, chol, k_find,
                                    num_chains)
    da = da_init(step0)
    wf = welford_init(d, dtype, dense=dense_mass)

    kernel = jax.vmap(
        lambda k, s, step, im, ch: nuts_kernel(vg, k, s, step, im, max_depth,
                                               inv_mass_chol=ch),
        in_axes=(0, 0, None, None, None))

    for length, slow, boundary in segments:
        def warmup_step(carry, _, inv_mass=inv_mass, chol=chol, slow=slow):
            states, da, wf, key = carry
            key, k = jax.random.split(key)
            ks = jax.random.split(k, num_chains)
            states, infos = kernel(ks, states, jnp.exp(da.log_step), inv_mass,
                                   chol)
            da = da_update(da, jnp.mean(infos.accept_prob), target=target_accept)
            if slow:
                wf = welford_update_batch(wf, states.z)
            return (states, da, wf, key), None

        (states, da, wf, key), _ = jax.lax.scan(
            warmup_step, (states, da, wf, key), None, length=length)
        if boundary:
            inv_mass = welford_variance(wf)
            chol = mass_chol(inv_mass)
            key, k_find = jax.random.split(key)
            step_b = _pooled_reasonable_step(
                vg, states, inv_mass, chol, k_find, num_chains,
                init_step=jnp.exp(da.log_step))
            da = da_init(step_b)
            wf = welford_init(d, dtype, dense=dense_mass)

    step_size = jnp.exp(da.log_step_avg)

    def sample_step(carry, _):
        states, key = carry
        key, k = jax.random.split(key)
        ks = jax.random.split(k, num_chains)
        states, infos = kernel(ks, states, step_size, inv_mass, chol)
        return (states, key), (states.z, infos.accept_prob, infos.diverging)

    (_, _), (zs, accepts, divs) = jax.lax.scan(
        sample_step, (states, key), None, length=num_samples)
    # zs: (num_samples, chains, d) -> (chains, num_samples, d)
    zs = jnp.swapaxes(zs, 0, 1)
    return (zs, jnp.mean(accepts, axis=0), jnp.sum(divs, axis=0),
            jnp.full((num_chains,), step_size),
            jnp.broadcast_to(inv_mass, (num_chains,) + inv_mass.shape))


@partial(jax.jit, static_argnames=("logdensity_fn", "num_warmup", "num_samples",
                                   "max_depth", "pooled_adaptation",
                                   "dense_mass"))
def run_nuts(logdensity_fn: Callable, init_params: jax.Array, key,
             num_warmup: int = 1000, num_samples: int = 1000,
             max_depth: int = 10, target_accept: float = 0.8,
             pooled_adaptation: bool = False,
             dense_mass: bool = False) -> MCMCResult:
    """Sample with NUTS.  ``init_params``: (num_chains, d); returns all chains.

    ``target_accept`` default 0.8; the reference drivers use Stan's
    adapt_delta=0.9 (mcmc.py:58) — pass 0.9 for strict parity.
    ``pooled_adaptation=True`` shares step-size/mass adaptation across all
    chains (collective statistics; reduces warmup variance and keeps sharded
    chains in lockstep).

    ``dense_mass=True`` adapts a FULL (d, d) covariance metric (Stan's
    ``dense_e``) instead of the diagonal: the windowed Welford estimator
    accumulates the scatter matrix and the regularized covariance becomes
    the inverse mass (see integrators.py).  Use for strongly correlated
    posteriors no diagonal rescaling can equalize; ``inv_mass`` in the
    result then holds the (num_chains, d, d) inverse-mass matrices.
    """
    segments = build_segments(num_warmup)
    num_chains = init_params.shape[0]

    if pooled_adaptation:
        zs, acc, divs, steps, inv_mass = _pooled_chains(
            logdensity_fn, init_params, key, segments, num_samples,
            max_depth, target_accept, dense_mass=dense_mass)
        return MCMCResult(zs, acc, divs, steps, inv_mass)

    keys = jax.random.split(key, num_chains)
    chain = partial(_single_chain, logdensity_fn,
                    segments=segments, num_samples=num_samples,
                    max_depth=max_depth, target_accept=target_accept,
                    dense_mass=dense_mass)
    zs, acc, divs, steps, inv_mass = jax.vmap(chain)(init_params, keys)
    return MCMCResult(zs, acc, divs, steps, inv_mass)
