"""Exact (closed-form) tangent families for conjugate models.

The reference defines these inline in its drivers:
- ``GaussianProjector`` (examples/gaussian/main.py:117-135): exact tangent
  features ``[nu @ PsiL, sqrt(tr(Psi^T Psi)/2)]`` whose inner products equal
  the exact Hilbert inner products under the current coreset posterior —
  no Monte-Carlo samples at all.
- ``LinRegProjector`` (examples/linear_regression/main.py:158-186): exact
  features with the second-order term projected onto the top eigenvectors
  ``bV`` of X^T X to bound memory.

Here they are first-class :class:`TangentFamily` implementations usable by
every coreset builder.  The projection context is the closed-form weighted
posterior (mean + covariance factors), refit each build/optimize step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import gaussian, linreg
from .projector import TangentFamily


def gaussian_tangent_family(mu0, Sig0inv, Siginv, LSigInv) -> TangentFamily:
    """Exact tangent family for the conjugate Gaussian model.

    ``LSigInv`` is the lower Cholesky factor of the likelihood precision
    (Siginv = LSigInv LSigInv^T).  Features have dimension d+1.

    The refit context uses the one-time joint diagonalization
    (:func:`models.gaussian.posterior_basis`), so SparseVI's per-Adam-step
    ``make_ctx`` costs O(d^2) matmuls with no Cholesky on the critical path.
    The returned covariance factor is non-triangular but enters only through
    its Gram (Psi and nu @ PsiL below), which is factor-invariant.
    """
    mu0 = jnp.asarray(mu0)
    d = mu0.shape[0]
    basis = jax.jit(gaussian.posterior_basis)(mu0, Sig0inv, Siginv)

    def make_ctx(key, wts, pts):
        return gaussian.weighted_post_basis(basis, pts, wts)

    def project(ctx, pts):
        muw, USigw = ctx
        nu = (jnp.atleast_2d(pts) - muw) @ LSigInv          # (n, d)
        PsiL = LSigInv.T @ USigw                            # (d, d)
        Psi = PsiL @ PsiL.T
        const = jnp.sqrt(0.5 * jnp.sum(Psi * Psi))
        feats = jnp.concatenate(
            [nu @ PsiL, jnp.full((nu.shape[0], 1), const, nu.dtype)], axis=1)
        return feats * jnp.sqrt(jnp.asarray(d + 1, feats.dtype))

    def project_grad(ctx, pts):
        # d feats[:, s] / d x = (LSigInv @ PsiL)[:, s] (constant in x); the
        # constant feature has zero gradient.  (The reference's gnu branch
        # at gaussian/main.py:127-131 references an undefined name and is
        # dead code; this is the correct derivative.)
        _, USigw = ctx
        PsiL = LSigInv.T @ USigw
        G = LSigInv @ PsiL                                   # (d, d): dfeat_s/dx_j = G[j, s]
        n = jnp.atleast_2d(pts).shape[0]
        g = jnp.concatenate([G.T, jnp.zeros((1, d), G.dtype)], axis=0)  # (d+1, d)
        g = g * jnp.sqrt(jnp.asarray(d + 1, G.dtype))
        return jnp.broadcast_to(g[None, :, :], (n, d + 1, d))

    return TangentFamily(make_ctx, project, project_grad)


def linreg_tangent_family(mu0, Sig0inv, sigsq, bV,
                          lowrank_refit: bool | None = None) -> TangentFamily:
    """Exact tangent family for Bayesian linear regression.

    ``bV`` (d, p): top-p eigenvectors of X^T X; the quadratic feature block
    is projected onto them, giving feature dimension d + p^2
    (reference linear_regression/main.py:158-186).

    ``lowrank_refit``: use the rank-m Woodbury posterior refit
    (:func:`models.linreg.weighted_post_lowrank`) instead of the (m+d, d)
    QR on SparseVI's per-Adam-step critical path.  Default (None) picks it
    automatically when the coreset capacity m is below the parameter
    dimension d at trace time; pass False for extremely ill-conditioned
    designs (see the weighted_post_lowrank note).
    """
    mu0 = jnp.asarray(mu0)
    bV = jnp.asarray(bV)
    d = mu0.shape[0]
    lr_basis = jax.jit(linreg.lowrank_basis)(mu0, Sig0inv, sigsq)

    def make_ctx(key, wts, pts):
        if pts.size == 0:  # trace-time: empty coreset -> prior posterior
            wts = jnp.zeros(1, mu0.dtype)
            pts = jnp.zeros((1, d + 1), mu0.dtype)
        use_lr = (pts.shape[0] <= d) if lowrank_refit is None else lowrank_refit
        if use_lr:
            return linreg.weighted_post_lowrank(lr_basis, pts, wts)
        post = linreg.weighted_post(mu0, Sig0inv, sigsq, pts, wts)
        return (post.mu, post.USig)

    def project(ctx, pts):
        muw, USigw = ctx
        z = jnp.atleast_2d(pts)
        X = z[:, :-1]
        Y = z[:, -1]
        beta = X @ USigw                                     # (n, d)
        nu = Y - X @ muw                                     # (n,)
        bproj = beta @ bV                                    # (n, p)
        quad = (bproj[:, :, None] * bproj[:, None, :]).reshape(z.shape[0], -1)
        return jnp.concatenate(
            [nu[:, None] * beta, quad / jnp.sqrt(2.0)], axis=1) / sigsq

    return TangentFamily(make_ctx, project, None)


def identity_tangent_family() -> TangentFamily:
    """Raw-vector projector (reference synthetic_vectors IDProjector,
    examples/synthetic_vectors/main.py:82-89)."""
    return TangentFamily(
        make_ctx=lambda key, wts, pts: None,
        project=lambda ctx, pts: jnp.atleast_2d(pts),
        project_grad=None,
    )
