"""Minimal end-to-end tutorial: logistic-regression Hilbert coreset.

Covers the reference's ``examples/simple_lr/main.py``: synthesize LR data,
fit a Laplace approximation at the MAP for the projection tangent space,
build a GIGA Hilbert coreset, refit Laplace on the weighted coreset, and
report KL(coreset posterior || full posterior).

Run: python -m bayesian_coresets_tpu.experiments.simple_lr
"""

from __future__ import annotations

import numpy as np


def main(N: int = 10000, D: int = 10, projection_dim: int = 500, M: int = 500,
         seed: int = 1, verbose: bool = True):
    import jax
    import jax.numpy as jnp

    from .. import coresets as bc
    from ..models import logistic
    from ..models.gaussian import kl_divergence
    from ..models.laplace import laplace_approx, sample_laplace

    def log(*a):
        if verbose:
            print(*a)

    log("Generating data...")
    key = jax.random.key(seed)
    Z = logistic.gen_synthetic(key, N, D)

    log("Finding MAP for tangent space approximation...")
    lap = laplace_approx(Z, jnp.ones(N), jnp.zeros(D),
                         grad_fn=logistic.grad_th_log_joint,
                         hess_fn=logistic.hess_th_log_joint)

    log("Building the coreset...")
    sampler = lambda k, sz, w, p: sample_laplace(k, lap, sz)
    projector = bc.BlackBoxProjector(sampler, projection_dim, logistic.log_likelihood)
    coreset = bc.HilbertCoreset(Z, projector)
    coreset.build(M)
    wts, pts, idcs = coreset.get()
    log(f"coreset size: {idcs.shape[0]}")

    log("Evaluating coreset quality...")
    w_full = np.zeros(N, np.float32)
    w_full[idcs] = wts
    lap_w = laplace_approx(Z, jnp.asarray(w_full), jnp.zeros(D),
                           grad_fn=logistic.grad_th_log_joint,
                           hess_fn=logistic.hess_th_log_joint)
    cov = np.asarray(lap.USig @ lap.USig.T)
    covw = np.asarray(lap_w.USig @ lap_w.USig.T)
    kl = float(kl_divergence(lap_w.mu, jnp.asarray(covw), lap.mu,
                             jnp.linalg.inv(jnp.asarray(cov))))
    log(f"Posterior requires {N} data")
    log(f"Coreset requires {idcs.shape[0]} data")
    log(f"KL(coreset || posterior) = {kl}")
    return kl, coreset


if __name__ == "__main__":
    main()
