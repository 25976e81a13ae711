"""Leapfrog integrator for HMC/NUTS."""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class IntegratorState(NamedTuple):
    z: jax.Array      # position (d,)
    r: jax.Array      # momentum (d,)
    logp: jax.Array   # log-density at z
    grad: jax.Array   # d logp / dz


def leapfrog(value_and_grad_fn: Callable, state: IntegratorState, step_size,
             inv_mass_diag) -> IntegratorState:
    """One leapfrog step; ``step_size`` may be negative (backward in time)."""
    r = state.r + 0.5 * step_size * state.grad
    z = state.z + step_size * inv_mass_diag * r
    logp, grad = value_and_grad_fn(z)
    r = r + 0.5 * step_size * grad
    return IntegratorState(z, r, logp, grad)


def kinetic(r, inv_mass_diag):
    return 0.5 * jnp.sum(r * r * inv_mass_diag)
