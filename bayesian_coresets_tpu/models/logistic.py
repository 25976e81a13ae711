"""Bayesian logistic regression with the z = y*x folding trick.

Covers the reference's ``examples/common/model_lr.py:3-116``: stable
log-likelihood, standard-normal prior, closed-form gradients/Hessians in
theta and z, and the weighted log-joint.  The reference's manual
``log1p(exp)`` branch guards become ``jax.nn.softplus`` /
``jax.nn.sigmoid`` — branch-free, stable, and fusable on the VPU.

Data convention: each row z_i = y_i * x_i with y in {-1, +1}, so
  log p(y_i | x_i, th) = -softplus(-z_i . th).
Prior: th ~ N(0, I).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG2PI = 1.8378770664093453


def _logits(z: jax.Array, th: jax.Array) -> jax.Array:
    z = jnp.atleast_2d(z)
    th = jnp.atleast_2d(th)
    # accumulate at (at least) the input precision: forcing f32 here would
    # silently downcast the f64 log-density island used by mcmc.run
    acc = jnp.promote_types(z.dtype, jnp.float32)
    return jnp.dot(z, th.T, preferred_element_type=acc)  # (n, S)


def log_likelihood(z: jax.Array, th: jax.Array) -> jax.Array:
    """(n, S) log-likelihood matrix (model_lr.py:25-32 semantics)."""
    return -jax.nn.softplus(-_logits(z, th))


def log_prior(th: jax.Array) -> jax.Array:
    th = jnp.atleast_2d(th)
    return -0.5 * th.shape[1] * _LOG2PI - 0.5 * jnp.sum(th**2, axis=1)


def log_joint(z: jax.Array, th: jax.Array, wts: jax.Array) -> jax.Array:
    """(S,) weighted log-joint: sum_i w_i ll_i(th) + log prior (model_lr.py:39-40)."""
    return jnp.sum(wts[:, None] * log_likelihood(z, th), axis=0) + log_prior(th)


def grad_th_log_likelihood(z: jax.Array, th: jax.Array) -> jax.Array:
    """(n, S, d): d/dth -softplus(-z.th) = sigmoid(-z.th) * z (model_lr.py:42-49)."""
    s = jax.nn.sigmoid(-_logits(z, th))              # (n, S)
    return s[:, :, None] * jnp.atleast_2d(z)[:, None, :]


def grad_z_log_likelihood(z: jax.Array, th: jax.Array) -> jax.Array:
    """(n, S, d): gradient wrt the (folded) datapoint z (model_lr.py:51-58)."""
    s = jax.nn.sigmoid(-_logits(z, th))
    return s[:, :, None] * jnp.atleast_2d(th)[None, :, :]


def grad_th_log_prior(th: jax.Array) -> jax.Array:
    return -jnp.atleast_2d(th)


def grad_th_log_joint(z: jax.Array, th: jax.Array, wts: jax.Array) -> jax.Array:
    """(S, d) gradient of the weighted log-joint (model_lr.py:63-64)."""
    return grad_th_log_prior(th) + jnp.einsum(
        "n,nsd->sd", wts, grad_th_log_likelihood(z, th)
    )


def _sig_pp(z, th):
    """sigmoid'(logit) = sig*(1-sig), batched (n, S)."""
    s = jax.nn.sigmoid(_logits(z, th))
    return s * (1.0 - s)


def hess_th_log_likelihood(z: jax.Array, th: jax.Array) -> jax.Array:
    """(n, S, d, d) per-datum Hessians (model_lr.py:66-73)."""
    z = jnp.atleast_2d(z)
    m = _sig_pp(z, th)
    return -m[:, :, None, None] * z[:, None, :, None] * z[:, None, None, :]


def hess_th_log_joint(z: jax.Array, th: jax.Array, wts: jax.Array) -> jax.Array:
    """(S, d, d) Hessian of the weighted log-joint as one MXU contraction.

    Reference semantics (model_lr.py:79-80) but computed as
    -I - (w*m Z)^T Z instead of materializing the (n,S,d,d) tensor.
    """
    z = jnp.atleast_2d(z)
    th2 = jnp.atleast_2d(th)
    m = _sig_pp(z, th2) * wts[:, None]               # (n, S)
    hess_ll = -jnp.einsum("ns,ni,nj->sij", m, z, z)
    eye = jnp.eye(z.shape[1], dtype=z.dtype)
    return hess_ll - eye[None, :, :]


def diag_hess_th_log_joint(z: jax.Array, th: jax.Array, wts: jax.Array) -> jax.Array:
    """(S, d) diagonal Hessian (model_lr.py:82-92)."""
    z = jnp.atleast_2d(z)
    m = _sig_pp(z, jnp.atleast_2d(th)) * wts[:, None]
    return -jnp.einsum("ns,ni->si", m, z**2) - 1.0


def gen_synthetic(key, n: int, d: int = 2, theta_scale: float = 3.0, dtype=jnp.float32):
    """Synthetic LR data (model_lr.py:15-23): returns folded Z = y*x."""
    kx, ky = jax.random.split(key)
    th = theta_scale * jnp.ones(d, dtype)
    x = jax.random.normal(kx, (n, d), dtype)
    ps = jax.nn.sigmoid(x @ th)
    y = jnp.where(jax.random.uniform(ky, (n,)) <= ps, 1.0, -1.0).astype(dtype)
    return y[:, None] * x
