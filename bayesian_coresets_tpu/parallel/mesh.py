"""Device-mesh construction helpers.

The reference has no distributed execution at all (SURVEY.md §2.5: its only
parallelism is bash-level job fan-out, examples/data/run.sh).  Here the
scaling axes are the dataset dimension N (data parallel), the projection
dimension S (tensor parallel for the (n,S) matmuls), and MCMC chains; all
map onto a ``jax.sharding.Mesh`` with XLA inserting the collectives.
Pipeline/expert parallelism have no analogue in this workload (SURVEY §2.5).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"    # shards dataset rows (N)
PROJ_AXIS = "proj"    # shards projection/sample dimension (S)
CHAIN_AXIS = "chains"  # shards MCMC chains


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a mesh; default = all devices on the data axis.

    make_mesh({"data": 4, "proj": 2}) -> 2D mesh over 8 devices.
    """
    if devices is None:
        devices = jax.devices()
    if axes is None:
        axes = {DATA_AXIS: len(devices)}
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, names)


def data_sharding(mesh: Mesh, *axes) -> NamedSharding:
    """NamedSharding with the given PartitionSpec axes (None = replicated)."""
    return NamedSharding(mesh, P(*axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
