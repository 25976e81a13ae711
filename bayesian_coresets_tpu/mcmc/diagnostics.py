"""Cross-chain MCMC diagnostics: split R-hat and effective sample size.

The reference has no diagnostics (chains=1 hardcoded, mcmc.py:58-65); these
follow the standard split-R-hat / autocorrelation-ESS definitions
(Vehtari et al. 2021) and are jittable for on-device use with sharded
chains.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split_rhat(samples: jax.Array) -> jax.Array:
    """samples: (chains, draws, d) -> (d,) split-R-hat."""
    c, n, d = samples.shape
    half = n // 2
    x = samples[:, : 2 * half, :].reshape(c * 2, half, d)
    m = x.shape[0]
    chain_mean = x.mean(axis=1)                        # (m, d)
    chain_var = x.var(axis=1, ddof=1)                  # (m, d)
    between = half * chain_mean.var(axis=0, ddof=1)    # (d,)
    within = chain_var.mean(axis=0)                    # (d,)
    var_est = (half - 1) / half * within + between / half
    return jnp.sqrt(var_est / within)


def ess(samples: jax.Array, max_lag: int | None = None) -> jax.Array:
    """samples: (chains, draws, d) -> (d,) bulk effective sample size."""
    c, n, d = samples.shape
    if max_lag is None:
        max_lag = min(n - 1, 1000)
    x = samples - samples.mean(axis=1, keepdims=True)
    # FFT autocovariance per chain/dim
    nfft = 1 << (2 * n - 1).bit_length()
    f = jnp.fft.rfft(x, n=nfft, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=1)[:, :n, :].real / n
    acov = acov.mean(axis=0)                           # (n, d) chain-averaged
    var = acov[0]
    rho = acov[:max_lag] / jnp.where(var > 0, var, 1.0)
    # Geyer initial positive sequence on paired sums
    even = rho[0::2][: max_lag // 2]
    odd = rho[1::2][: max_lag // 2]
    pair = even + odd
    pos = jnp.cumprod(pair > 0, axis=0).astype(pair.dtype)
    tau = -1.0 + 2.0 * jnp.sum(pair * pos, axis=0)
    return c * n / jnp.maximum(tau, 1.0 / (c * n))
