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
    grad_fn: Callable[[jax.Array, jax.Array], jax.Array],  # (x, key) -> grad
    key: jax.Array,
    nn_mask: jax.Array | None = None,   # True where x is constrained >= 0
    opt_itrs: int = 1000,
    step_sched: Callable = lambda i: 1.0 / (1.0 + i),
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> jax.Array:
    """Run ``opt_itrs`` projected-Adam steps; returns the final iterate.

    nn_mask=None clamps every coordinate (the reference's nn_idcs=None case,
    util/opt.py:21-24).
    """
    mask = jnp.ones_like(x0, dtype=bool) if nn_mask is None else nn_mask
    keys = jax.random.split(key, opt_itrs)

    def body(carry, inp):
        x, m1, m2 = carry
        i, k = inp
        g = grad_fn(x, k)
        m1 = b1 * m1 + (1.0 - b1) * g
        m2 = b2 * m2 + (1.0 - b2) * g * g
        i1 = i + 1.0
        m1_hat = m1 / (1.0 - b1**i1)
        m2_hat = m2 / (1.0 - b2**i1)
        x = x - step_sched(i) * m1_hat / (eps + jnp.sqrt(m2_hat))
        x = jnp.where(mask, jnp.maximum(x, 0.0), x)
        return (x, m1, m2), None

    steps = jnp.arange(opt_itrs, dtype=x0.dtype)
    (x, _, _), _ = jax.lax.scan(body, (x0, jnp.zeros_like(x0), jnp.zeros_like(x0)),
                                (steps, keys))
    return x
