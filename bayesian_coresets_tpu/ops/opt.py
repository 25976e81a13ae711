"""Projected Adam for (partially) nonnegativity-constrained objectives.

Jittable redesign of the reference's ``nn_opt`` (util/opt.py:4-28): same
bias-corrected Adam update ``step_sched(i) * m1_hat / (eps + sqrt(m2_hat))``
followed by clamping the constrained coordinates at zero — but expressed as
a ``lax.scan`` whose gradient callback receives a fresh PRNG key each step,
because SparseVI/BatchPSVI re-draw Monte-Carlo samples inside every gradient
evaluation (reference coreset/sparsevi.py:70-74, coreset/bpsvi.py:46-55).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def nn_opt(
    x0: jax.Array,
    grad_fn: Callable,                  # (x, key) -> grad, or with aux below
    key: jax.Array,
    nn_mask: jax.Array | None = None,   # True where x is constrained >= 0
    opt_itrs: int = 1000,
    step_sched: Callable = lambda i: 1.0 / (1.0 + i),
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    aux0=None,                          # opt. carried state threaded through
):
    """Run ``opt_itrs`` projected-Adam steps; returns the final iterate.

    nn_mask=None clamps every coordinate (the reference's nn_idcs=None case,
    util/opt.py:21-24).

    With ``aux0`` given, ``grad_fn(x, key, aux) -> (grad, aux)`` threads a
    carried state through the steps (e.g. a warm-started Laplace mode for
    SparseVI's per-step posterior refits) and ``(x, aux)`` is returned.
    """
    mask = jnp.ones_like(x0, dtype=bool) if nn_mask is None else nn_mask
    keys = jax.random.split(key, opt_itrs)
    with_aux = aux0 is not None

    def body(carry, inp):
        x, m1, m2, aux = carry
        i, k = inp
        if with_aux:
            g, aux = grad_fn(x, k, aux)
        else:
            g = grad_fn(x, k)
        m1 = b1 * m1 + (1.0 - b1) * g
        m2 = b2 * m2 + (1.0 - b2) * g * g
        i1 = i + 1.0
        m1_hat = m1 / (1.0 - b1**i1)
        m2_hat = m2 / (1.0 - b2**i1)
        x = x - step_sched(i) * m1_hat / (eps + jnp.sqrt(m2_hat))
        x = jnp.where(mask, jnp.maximum(x, 0.0), x)
        return (x, m1, m2, aux), None

    steps = jnp.arange(opt_itrs, dtype=x0.dtype)
    (x, _, _, aux), _ = jax.lax.scan(
        body, (x0, jnp.zeros_like(x0), jnp.zeros_like(x0), aux0),
        (steps, keys))
    return (x, aux) if with_aux else x
