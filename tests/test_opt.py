"""Projected-Adam tests (reference util/opt.py:4-28 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesian_coresets_tpu.ops import nn_opt


def test_converges_to_projected_quadratic_optimum():
    # min 0.5||x - t||^2 with x >= 0  →  x* = max(t, 0)
    t = jnp.asarray([1.5, -2.0, 0.3, -0.1])
    grad_fn = lambda x, k: x - t
    x = nn_opt(jnp.zeros(4), grad_fn, jax.random.key(0), opt_itrs=2000,
               step_sched=lambda i: 0.05)
    np.testing.assert_allclose(np.asarray(x), np.maximum(np.asarray(t), 0), atol=1e-3)


def test_partial_constraint_mask():
    t = jnp.asarray([-1.0, -1.0])
    mask = jnp.asarray([True, False])  # only x0 constrained
    grad_fn = lambda x, k: x - t
    x = nn_opt(jnp.zeros(2), grad_fn, jax.random.key(0), nn_mask=mask,
               opt_itrs=2000, step_sched=lambda i: 0.05)
    assert abs(float(x[0]) - 0.0) < 1e-3
    assert abs(float(x[1]) - (-1.0)) < 1e-3


def test_matches_reference_adam_recursion():
    # deterministic gradient: replicate the exact update of util/opt.py:4-28
    # in NumPy and check our scan agrees step for step.
    rng = np.random.default_rng(0)
    t = rng.normal(size=5).astype(np.float32)
    sched = lambda i: 1.0 / (1.0 + i)
    b1, b2, eps = 0.9, 0.999, 1e-8

    x_np = np.zeros(5, np.float32)
    m1 = np.zeros(5, np.float32)
    m2 = np.zeros(5, np.float32)
    for i in range(50):
        g = x_np - t
        m1 = b1 * m1 + (1 - b1) * g
        m2 = b2 * m2 + (1 - b2) * g**2
        upd = sched(i) * (m1 / (1 - b1 ** (i + 1))) / (eps + np.sqrt(m2 / (1 - b2 ** (i + 1))))
        x_np = np.maximum(x_np - upd, 0.0)

    x = nn_opt(jnp.zeros(5), lambda x, k: x - jnp.asarray(t), jax.random.key(0),
               opt_itrs=50, step_sched=sched)
    np.testing.assert_allclose(np.asarray(x), x_np, rtol=1e-4, atol=1e-5)


def test_keys_differ_per_step():
    seen = []

    def grad_fn(x, k):
        # key-dependent gradient: returns the key's first random value so the
        # trajectory depends on per-step keys being distinct
        return jax.random.normal(k, x.shape) * 0.0 + x

    x1 = nn_opt(jnp.ones(3), lambda x, k: jax.random.normal(k, x.shape),
                jax.random.key(0), opt_itrs=10, step_sched=lambda i: 0.1)
    x2 = nn_opt(jnp.ones(3), lambda x, k: jax.random.normal(k, x.shape),
                jax.random.key(1), opt_itrs=10, step_sched=lambda i: 0.1)
    assert not np.allclose(np.asarray(x1), np.asarray(x2))
