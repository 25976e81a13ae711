"""Mesh-sharded MCMC chains.

The reference hardcodes chains=1 (examples/common/mcmc.py:58-65).  Here
chains are vmapped on-chip and sharded across the mesh's chain axis: the
vmap batch dimension of (init_params, keys) carries a NamedSharding, so each
device runs its resident chains and sampling is embarrassingly parallel
while cross-chain diagnostics (R-hat/ESS) reduce with XLA collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mcmc.sample import MCMCResult, run_nuts
from .mesh import CHAIN_AXIS


def run_nuts_sharded(logdensity_fn, init_params, key, mesh: Mesh,
                     num_warmup: int = 1000, num_samples: int = 1000,
                     max_depth: int = 10, target_accept: float = 0.8,
                     pooled_adaptation: bool = False,
                     dense_mass: bool = False) -> MCMCResult:
    """run_nuts with chains sharded over the mesh's chain axis.

    init_params: (num_chains, d); num_chains must be a multiple of the chain
    axis size.  ``pooled_adaptation=True`` shares step-size/mass adaptation
    across ALL chains — the cross-chain means become XLA collectives over
    the mesh (collective step-size adaptation).
    """
    axis = CHAIN_AXIS if CHAIN_AXIS in mesh.axis_names else mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(axis, None))
    init_params = jax.device_put(jnp.asarray(init_params), sharding)
    return run_nuts(logdensity_fn, init_params, key, num_warmup=num_warmup,
                    num_samples=num_samples, max_depth=max_depth,
                    target_accept=target_accept,
                    pooled_adaptation=pooled_adaptation,
                    dense_mass=dense_mass)
