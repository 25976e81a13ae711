"""Compiled-HLO assertions on the sharded build's communication volume.

The scaling claim behind the data-parallel design (SURVEY.md §2.5: per-shard
partials + psum-reduced residual statistics) is only real if the GSPMD
partitioner actually keeps V = A.T (n, S) partitioned.  A single
data-dependent gather along the sharded n axis silently makes XLA
ALL-GATHER the whole matrix onto every device — replicated memory, O(n*S)
communication, and a scaling story that is false while every numerical test
still passes.  These tests inspect the optimized HLO of the compiled
sharded build and fail if that ever happens again:

1. no collective's result touches an n-scale operand (V or an (n,) vector);
2. total collective bytes are IDENTICAL when n doubles (n-independence);
3. the detector itself is validated against the known-bad pattern
   (``spmd=False`` on sharded inputs reproduces the V all-gather).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_coresets_tpu.ops import snnls
from bayesian_coresets_tpu.parallel import make_mesh
from bayesian_coresets_tpu.parallel.coreset import shard_consts, shard_state
from bayesian_coresets_tpu.utils import config
from bayesian_coresets_tpu.utils.hlo import collective_stats


def _compiled_build_hlo(n, S, mesh, quantized=False, spmd=True, itrs=50):
    rng = np.random.default_rng(0)
    A = rng.normal(size=(S, n)).astype(np.float32)
    b = A.sum(axis=1)
    if quantized:
        V = A.T
        norms = np.sqrt((V**2).sum(axis=1)).astype(np.float32)
        Vq = np.clip(np.round(V / norms[:, None] * 127.0), -127, 127).astype(np.int8)
        consts = snnls.make_consts_quantized(jnp.asarray(Vq), jnp.asarray(norms),
                                             jnp.asarray(b))
        kw = dict(matvec_k=256)
    else:
        consts = snnls.make_consts(jnp.asarray(A), jnp.asarray(b))
        kw = {}
    consts = shard_consts(consts, mesh)
    state = snnls.init_state(consts, max_active=256)
    state = shard_state(state, mesh)
    fn = jax.jit(lambda c, s: snnls.build(c, s, itrs, config.TOL,
                                          method="giga", spmd=spmd, **kw))
    return fn.lower(consts, state).compile().as_text()


@pytest.mark.parametrize("quantized", [False, True],
                         ids=["f32", "int8_resident"])
def test_v_stays_partitioned_and_collectives_are_n_independent(
        cpu_devices, quantized):
    S, n1, n2 = 32, 2048, 4096
    mesh = make_mesh({"data": 8})
    ndev = 8

    stats1 = collective_stats(_compiled_build_hlo(n1, S, mesh, quantized))
    stats2 = collective_stats(_compiled_build_hlo(n2, S, mesh, quantized))

    # (1) no collective result at n scale: the largest legitimate collective
    # is an O(S) all-reduce (refresh matvec / row reduction) or the
    # O(devices) argmax exchange — far below even one shard of V or an (n,)
    # vector.  An all-gathered V would be n*S bytes; an (n,) gather n*4.
    cap = 4 * (S + ndev) * 4          # bytes; generous headroom over O(S)
    for op, nbytes, line in stats1 + stats2:
        assert nbytes <= cap, (
            f"collective touches an n-scale operand ({nbytes} bytes > cap "
            f"{cap}): GSPMD is replicating sharded data\n{line[:200]}")
        assert nbytes < n1 * 4, line[:200]

    # (2) communication volume must not change when n doubles
    sig1 = sorted((op, nbytes) for op, nbytes, _ in stats1)
    sig2 = sorted((op, nbytes) for op, nbytes, _ in stats2)
    assert sig1 == sig2, (
        f"per-iteration collective bytes depend on n:\n{sig1}\nvs\n{sig2}")

    # the loop does communicate (this is a real multi-device program)
    assert any(op == "all-reduce" for op, _, _ in stats1)


def test_detector_catches_replicated_v(cpu_devices):
    """The known-bad pattern (dynamic row gathers on sharded V, spmd=False)
    must trip the same assertions — otherwise the tests above prove nothing."""
    S, n = 32, 2048
    mesh = make_mesh({"data": 8})
    stats = collective_stats(_compiled_build_hlo(n, S, mesh, spmd=False))
    biggest = max(nbytes for _, nbytes, _ in stats)
    # the V all-gather reassembles the full (n, S) f32 matrix
    assert biggest >= n * S * 4, (
        "expected the spmd=False build to all-gather V; if XLA now "
        "partitions dynamic gathers natively, spmd mode may be retired")


def test_spmd_build_bit_matches_gather_build(rng, cpu_devices):
    """One-hot masked access selects the same rows: f32 results must be
    BIT-identical to the single-device gather-based build."""
    S, n = 32, 2048
    A = rng.normal(size=(S, n)).astype(np.float32)
    b = A.sum(axis=1)
    mesh = make_mesh({"data": 8})
    from bayesian_coresets_tpu.parallel import build_sharded
    st = build_sharded(A, b, 60, mesh)
    alg = snnls.GIGA(A, b)
    alg.build(60)
    np.testing.assert_array_equal(np.asarray(st.w), alg.weights())
