"""Mesh-sharded coreset construction.

Data-parallel plan per SURVEY.md §2.5: shard the projection matrix
``V = A.T`` (n, S) across devices along n (optionally across S too); the
per-iteration score matmul, the residual reductions (``b = sum_i vecs_i``,
correlations), and the greedy argmax then lower to per-shard partials +
XLA-inserted collectives (psum / all-gather) — no hand-written NCCL
analogue needed.  The solver state machine is unchanged: the same jitted
``ops.snnls.build`` runs over sharded inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import snnls
from ..utils import config
from .mesh import DATA_AXIS, PROJ_AXIS


def _put(x, sharding: NamedSharding):
    """Place an array on the mesh; works in multi-controller processes too.

    ``jax.device_put`` requires a fully-addressable sharding; when the mesh
    spans processes (DCN, parallel/distributed.py) each controller instead
    contributes its addressable shards of the SPMD-identical host value via
    ``make_array_from_callback``."""
    if getattr(x, "sharding", None) == sharding:
        return x
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    return jax.make_array_from_callback(jnp.shape(x), sharding,
                                        lambda idx: x[idx])


def shard_consts(consts: snnls.SNNLSConsts, mesh: Mesh,
                 shard_proj: bool = False) -> snnls.SNNLSConsts:
    """Place solver constants on the mesh: V rows (data) sharded, the rest
    replicated (or V cols sharded too when shard_proj)."""
    proj = PROJ_AXIS if (shard_proj and PROJ_AXIS in mesh.axis_names) else None
    v_sharding = NamedSharding(mesh, P(DATA_AXIS, proj))
    col = NamedSharding(mesh, P(DATA_AXIS))
    vec_s = NamedSharding(mesh, P(proj))
    rep = NamedSharding(mesh, P())
    return snnls.SNNLSConsts(
        V=_put(consts.V, v_sharding),
        b=_put(consts.b, vec_s),
        norms=_put(consts.norms, col),
        bnorm=_put(consts.bnorm, rep),
        valid=_put(consts.valid, col),
        ps=_put(consts.ps, col),
        Vsel=_put(consts.Vsel, v_sharding),
    )


def shard_state(state: snnls.SNNLSState, mesh: Mesh,
                shard_proj: bool = False) -> snnls.SNNLSState:
    proj = PROJ_AXIS if (shard_proj and PROJ_AXIS in mesh.axis_names) else None
    col = NamedSharding(mesh, P(DATA_AXIS))
    vec_s = NamedSharding(mesh, P(proj))
    rep = NamedSharding(mesh, P())
    return snnls.SNNLSState(
        w=_put(state.w, col),
        xw=_put(state.xw, vec_s),
        cts=_put(state.cts, col),
        idcs=_put(state.idcs, rep),
        size=_put(state.size, rep),
        itr=_put(state.itr, rep),
        fail=_put(state.fail, rep),
        done=_put(state.done, rep),
        key=_put(state.key, rep),
    )


def build_sharded(A, b, itrs: int, mesh: Mesh, method: str = "giga",
                  valid=None, key=None, shard_proj: bool = False,
                  max_active: int = 0) -> snnls.SNNLSState:
    """Run a sharded snnls build; returns the final (sharded) state."""
    sampling = method if method in ("importance", "uniform") else None
    consts = snnls.make_consts(jnp.asarray(A), jnp.asarray(b), valid=valid,
                               sampling=sampling)
    consts = shard_consts(consts, mesh, shard_proj)
    state = snnls.init_state(consts, key, max_active=max_active)
    state = shard_state(state, mesh, shard_proj)
    # spmd=True: one-hot masked row access — V stays partitioned (without it
    # GSPMD all-gathers V to serve the data-dependent row gathers) and
    # per-iteration collectives are O(S), n-independent (tests/test_sharding_hlo.py)
    return snnls.build(consts, state, itrs, config.TOL, method=method,
                       spmd=True)


def build_sharded_quantized(Vq, norms, b, itrs: int, mesh: Mesh,
                            method: str = "giga", valid=None, key=None,
                            max_active: int = 1024) -> snnls.SNNLSState:
    """Sharded build over int8-RESIDENT constants (beyond-HBM x DP).

    Composes `make_consts_quantized` with row sharding: each chip holds
    1/|mesh| of the int8 copy, so a pod slice scales the single-chip
    beyond-HBM ceiling by the device count (e.g. 8 x v5e ~ N=160M at
    S=512).  Row gathers (reweight dequantization, support-tracked matvec
    refresh) lower to XLA collectives automatically.
    """
    sampling = method if method in ("importance", "uniform") else None
    consts = snnls.make_consts_quantized(Vq, norms, b, valid=valid,
                                         sampling=sampling)
    consts = shard_consts(consts, mesh, shard_proj=False)
    state = snnls.init_state(consts, key, max_active=max_active)
    state = shard_state(state, mesh, shard_proj=False)
    return snnls.build(consts, state, itrs, config.TOL, method=method,
                       matvec_k=max_active, spmd=True)
