"""Multi-device tests on the 8-way virtual CPU mesh (conftest.py)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_coresets_tpu.ops import snnls as S
from bayesian_coresets_tpu.parallel import build_sharded, make_mesh, run_nuts_sharded

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import __graft_entry__  # noqa: E402


def test_mesh_shapes(cpu_devices):
    mesh = make_mesh({"data": 4, "proj": 2})
    assert mesh.shape == {"data": 4, "proj": 2}
    with pytest.raises(ValueError):
        make_mesh({"data": 16})


def test_sharded_build_matches_single_device(rng, cpu_devices):
    Sdim, n = 32, 256
    A = rng.normal(size=(Sdim, n)).astype(np.float32)
    b = A.sum(axis=1)
    mesh = make_mesh({"data": 8})
    st = build_sharded(A, b, 60, mesh)
    alg = S.GIGA(A, b)
    alg.build(60)
    np.testing.assert_allclose(np.asarray(st.w), alg.weights(), rtol=1e-4, atol=1e-5)


def test_sharded_build_2d_mesh(rng, cpu_devices):
    Sdim, n = 32, 256
    A = rng.normal(size=(Sdim, n)).astype(np.float32)
    b = A.sum(axis=1)
    mesh = make_mesh({"data": 4, "proj": 2})
    st = build_sharded(A, b, 40, mesh, shard_proj=True)
    alg = S.GIGA(A, b)
    alg.build(40)
    np.testing.assert_allclose(np.asarray(st.w), alg.weights(), rtol=1e-4, atol=1e-5)


def test_sharded_chains(cpu_devices):
    mesh = make_mesh({"chains": 8})
    logp = lambda th: -0.5 * jnp.sum(th**2)
    res = run_nuts_sharded(logp, jnp.zeros((8, 3)), jax.random.key(0), mesh,
                           num_warmup=100, num_samples=200)
    s = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(s.std(0), np.ones(3), atol=0.1)


def test_sharded_chains_dense_mass(cpu_devices):
    # dense (d, d) metric through the sharded-chain path: correlated target
    mesh = make_mesh({"chains": 8})
    prec = jnp.linalg.inv(jnp.asarray([[1.0, 0.9], [0.9, 1.0]]))
    logp = lambda th: -0.5 * th @ (prec @ th)
    res = run_nuts_sharded(logp, jnp.zeros((8, 2)), jax.random.key(1), mesh,
                           num_warmup=200, num_samples=200, dense_mass=True,
                           pooled_adaptation=True)
    assert res.inv_mass.shape == (8, 2, 2)
    s = np.asarray(res.samples).reshape(-1, 2)
    assert abs(np.cov(s.T)[0, 1] - 0.9) < 0.2


def test_weighted_run_mesh_matches_vmapped(cpu_devices):
    """mcmc.run(mesh=...) — the driver's --chain_mesh path — must sample the
    same distribution as the plain vmapped path: identical key, identical
    algorithm, only device placement differs."""
    from bayesian_coresets_tpu.mcmc import weighted
    from bayesian_coresets_tpu.models import logistic

    key = jax.random.key(0)
    x = jax.random.normal(key, (60, 2))
    y = jnp.sign(x[:, 0] - 0.3 * x[:, 1] + 0.2)
    z = jnp.concatenate([x * y[:, None], y[:, None]], axis=1)
    wts = jnp.ones(60)

    mesh = make_mesh({"chains": 8})
    s_mesh, _, res_mesh = weighted.run(logistic, z, wts, 150, jax.random.key(5),
                                       num_chains=8, pooled_adaptation=True,
                                       mesh=mesh)
    s_vmap, _, res_vmap = weighted.run(logistic, z, wts, 150, jax.random.key(5),
                                       num_chains=8, pooled_adaptation=True)
    # same key + same algorithm: moments agree tightly (placement may perturb
    # reduction order at ulp level, so exact bit-parity is not asserted)
    np.testing.assert_allclose(np.asarray(s_mesh).mean(0),
                               np.asarray(s_vmap).mean(0), atol=0.05)
    np.testing.assert_allclose(np.asarray(s_mesh).std(0),
                               np.asarray(s_vmap).std(0), rtol=0.15)
    # diagnostics still computable on the sharded result
    from bayesian_coresets_tpu import mcmc as M
    assert np.isfinite(np.asarray(M.split_rhat(res_mesh.samples))).all()
    assert np.isfinite(np.asarray(M.ess(res_mesh.samples))).all()


def test_graft_entry_compiles(cpu_devices):
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_dryrun_multichip(cpu_devices):
    __graft_entry__.dryrun_multichip(8)


def test_sharded_pooled_adaptation(cpu_devices):
    from bayesian_coresets_tpu.parallel import make_mesh, run_nuts_sharded
    mesh = make_mesh({"chains": 8})
    logp = lambda th: -0.5 * jnp.sum(th**2)
    res = run_nuts_sharded(logp, jnp.zeros((8, 3)), jax.random.key(0), mesh,
                           num_warmup=100, num_samples=200,
                           pooled_adaptation=True)
    s = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(s.std(0), np.ones(3), atol=0.12)
    assert np.unique(np.asarray(res.step_size)).size == 1


def test_sharded_quantized_build_matches_single_device(rng, cpu_devices):
    """Beyond-HBM int8-resident mode composes with row sharding: the DP
    build must bit-match the single-device quantized build."""
    from bayesian_coresets_tpu.parallel import build_sharded_quantized
    Sdim, n = 32, 2048   # row count a multiple of 1024 (quantized row tiles)
    A = rng.normal(size=(Sdim, n)).astype(np.float32)
    b = A.sum(axis=1)
    V = A.T
    norms = np.sqrt((V**2).sum(axis=1)).astype(np.float32)
    Vq = np.clip(np.round(V / norms[:, None] * 127.0), -127, 127).astype(np.int8)

    mesh = make_mesh({"data": 8})
    st = build_sharded_quantized(jnp.asarray(Vq), jnp.asarray(norms),
                                 jnp.asarray(b), 50, mesh, max_active=256)

    consts = S.make_consts_quantized(jnp.asarray(Vq), jnp.asarray(norms), jnp.asarray(b))
    alg = S.GIGA.from_consts(consts, max_active=256)
    alg.build(50)
    np.testing.assert_allclose(np.asarray(st.w), alg.weights(), rtol=1e-5, atol=1e-6)
    assert float(S.error(consts, st.w, support=256)) < float(jnp.sqrt(jnp.sum(jnp.asarray(b)**2)))


def test_sharded_orthopursuit_matches_single_device(rng, cpu_devices):
    """OMP under data sharding (newly enabled): the active-set system is
    gathered with one O(K*S) psum per iteration and the NNLS solve runs
    replicated — results must bit-match the single-device build."""
    Sdim, n = 32, 256
    A = rng.normal(size=(Sdim, n)).astype(np.float32)
    b = A.sum(axis=1)
    mesh = make_mesh({"data": 8})
    st = build_sharded(A, b, 25, mesh, method="orthopursuit", max_active=64)
    alg = S.OrthoPursuit(A, b, max_active=64)
    alg.build(25)
    w_sharded, w_single = np.asarray(st.w), alg.weights()
    # identical selected support; weights to f32 ulp (the 256-iteration FISTA
    # resolve amplifies fusion-order ulp differences between compilations)
    np.testing.assert_array_equal(w_sharded > 0, w_single > 0)
    np.testing.assert_allclose(w_sharded, w_single, rtol=2e-5, atol=1e-6)
    # proj sharding is refused (full-S rows needed for the gathered solve)
    with pytest.raises(ValueError):
        build_sharded(A, b, 5, make_mesh({"data": 4, "proj": 2}),
                      method="orthopursuit", shard_proj=True)


def test_sharded_sampling_solver_valid_distribution(rng, cpu_devices):
    """Sharded importance sampling uses a hierarchical categorical draw
    (exact distribution, different realization): check the solver invariants
    rather than bitwise parity — counts sum to itrs, weights follow the
    (cts/T)/ps map, and the residual matches a single-device build run on
    the sharded draw's own counts."""
    Sdim, n = 16, 256
    A = rng.normal(size=(Sdim, n)).astype(np.float32)
    b = A.sum(axis=1)
    mesh = make_mesh({"data": 8})
    itrs = 40
    st = build_sharded(A, b, itrs, mesh, method="importance",
                       key=jax.random.key(7))
    cts = np.asarray(st.cts)
    assert cts.sum() == itrs
    consts = S.make_consts(jnp.asarray(A), jnp.asarray(b), sampling="importance")
    ps = np.asarray(consts.ps)
    w_expect = np.where(ps > 0, (cts / itrs) / np.where(ps > 0, ps, 1.0), 0.0)
    np.testing.assert_allclose(np.asarray(st.w), w_expect, rtol=1e-5, atol=1e-7)


def test_sharded_int8_select_bit_matches_single_device(rng, cpu_devices):
    """select_dtype=int8 under data sharding: row padding lands on shard
    boundaries (lcm of the mesh and the 1024-row tile), S stays at the
    caller's value (padding S would change f32 reduction groupings and
    flip near-tie selections) — results bit-match the single-device
    int8-select build."""
    Sdim, n = 32, 3000                 # pads to 3072 rows
    A = rng.normal(size=(Sdim, n)).astype(np.float32)
    b = A.sum(axis=1)
    mesh = make_mesh({"data": 8})
    st = build_sharded(A, b, 40, mesh, select_dtype=jnp.int8)
    alg = S.GIGA(A, b, select_dtype=jnp.int8)
    alg.build(40)
    assert st.w.shape == (n,)
    np.testing.assert_array_equal(np.asarray(st.w), alg.weights())


def test_sharded_build_pads_uneven_n(rng, cpu_devices):
    """n not divisible by the mesh: zero-padded with valid=False, trimmed
    back — results must match the single-device build on the original n."""
    Sdim, n = 32, 250                  # 250 % 8 != 0
    A = rng.normal(size=(Sdim, n)).astype(np.float32)
    b = A.sum(axis=1)
    mesh = make_mesh({"data": 8})
    st = build_sharded(A, b, 40, mesh)
    assert st.w.shape == (n,)
    alg = S.GIGA(A, b)
    alg.build(40)
    np.testing.assert_array_equal(np.asarray(st.w), alg.weights())


def test_sparsevi_and_bpsvi_sharded_data_match_single_device(cpu_devices):
    """SparseVI/BPSVI cores are pure jits, so row-sharded data runs them
    data-parallel with XLA-inserted collectives — results must match the
    unsharded build exactly (greedy index selection) / numerically (weights)."""
    import bayesian_coresets_tpu as bct
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bayesian_coresets_tpu.coresets import gaussian_tangent_family
    from bayesian_coresets_tpu.models import gaussian

    d, N = 8, 512
    x = gaussian.gen_synthetic(jax.random.key(1), N, d)
    fam = gaussian_tangent_family(jnp.zeros(d), jnp.eye(d), jnp.eye(d), jnp.eye(d))
    mesh = make_mesh({"data": 8})
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))

    a = bct.SparseVICoreset(x, fam, opt_itrs=20, seed=0, capacity=16)
    a.build(10)
    b = bct.SparseVICoreset(xs, fam, opt_itrs=20, seed=0, capacity=16)
    b.build(10)
    np.testing.assert_array_equal(a.idcs, b.idcs)
    np.testing.assert_allclose(a.wts, b.wts, rtol=1e-5, atol=1e-6)

    # subsampled select/opt (the data-dependent gather GSPMD must partition,
    # tests/test_sharding_hlo.py): same keys -> same draws -> same results
    c = bct.SparseVICoreset(x, fam, n_subsample_select=128,
                            n_subsample_opt=128, opt_itrs=20, seed=0,
                            capacity=16)
    c.build(8)
    cs = bct.SparseVICoreset(xs, fam, n_subsample_select=128,
                             n_subsample_opt=128, opt_itrs=20, seed=0,
                             capacity=16)
    cs.build(8)
    np.testing.assert_array_equal(c.idcs, cs.idcs)
    np.testing.assert_allclose(c.wts, cs.wts, rtol=1e-5, atol=1e-6)

    basis = gaussian.posterior_basis(jnp.zeros(d), jnp.eye(d), jnp.eye(d))
    loglik = lambda pts, th: gaussian.log_likelihood(pts, th, jnp.eye(d), 0.0)
    gradll = lambda pts, th: gaussian.grad_x_log_likelihood(pts, th, jnp.eye(d))
    def sampler(k, n, w, p):
        if p.size == 0:
            w = jnp.zeros(1); p = jnp.zeros((1, d))
        return gaussian.sample_weighted_post_basis(k, basis, p, w, n)
    pa = bct.BatchPSVICoreset(x, bct.BlackBoxProjector(sampler, 40, loglik, gradll),
                              opt_itrs=30, seed=0)
    pa.build(6)
    pb = bct.BatchPSVICoreset(xs, bct.BlackBoxProjector(sampler, 40, loglik, gradll),
                              opt_itrs=30, seed=0)
    pb.build(6)
    np.testing.assert_allclose(pa.wts, pb.wts, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(pa.pts, pb.pts, rtol=1e-4, atol=1e-4)


def test_streamed_row_layout_edges(cpu_devices):
    """Row-layout math: buffer row i == data row i, contiguous per-device
    blocks, pad rows only past n, single-controller slice covers [0, n)."""
    from bayesian_coresets_tpu.parallel import make_mesh, streamed_row_layout

    for ndev, n in [(8, 3000), (8, 8192), (4, 1), (2, 1025), (1, 77)]:
        mesh = make_mesh({"data": ndev}, devices=jax.devices()[:ndev])
        rows_glob, rows_loc, pos, sl = streamed_row_layout(n, mesh)
        assert rows_glob % 1024 == 0 and rows_glob % ndev == 0
        assert rows_loc * ndev == rows_glob
        assert rows_glob >= n
        assert pos == list(range(ndev))          # single controller owns all
        assert sl == slice(0, n)


def test_streamed_consts_one_device_mesh(rng, cpu_devices):
    # regression: a 1-device data mesh leaves the row axis unsharded, so
    # shard.index[0] is slice(None) — the norms collection must not crash
    import jax.numpy as jnp
    from bayesian_coresets_tpu.ops import snnls
    from bayesian_coresets_tpu.parallel import (make_mesh,
                                                make_streamed_quantized_consts)

    n, d, S = 700, 4, 16
    X = rng.normal(size=(n, d)).astype(np.float32)
    W = jnp.asarray(rng.normal(size=(S, d)).astype(np.float32))
    mesh = make_mesh({"data": 1}, devices=jax.devices()[:1])
    consts = make_streamed_quantized_consts(
        X, lambda pts: jnp.tanh(pts @ W.T), 256, mesh, n)
    alg = snnls.GIGA.from_consts(consts, seed=0, max_active=32, mesh=mesh)
    alg.build(10)
    idx, vals = alg.active()
    assert (vals > 0).sum() > 0


def test_make_streamed_quantized_consts_direct(rng, cpu_devices):
    """The consts-level streamed constructor (the multi-controller API)
    produces the same quantized system + build results as the in-memory
    int8-resident constructor on the same projection."""
    import jax.numpy as jnp
    from bayesian_coresets_tpu.ops import snnls
    from bayesian_coresets_tpu.parallel import (make_mesh,
                                                make_streamed_quantized_consts)

    n, d, S = 1500, 5, 32
    X = rng.normal(size=(n, d)).astype(np.float32)
    W = jnp.asarray(rng.normal(size=(S, d)).astype(np.float32))
    project = lambda pts: jnp.tanh(pts @ W.T)
    mesh = make_mesh({"data": 4}, devices=jax.devices()[:4])
    # chunk larger than rows_loc AND a ragged tail both exercised across
    # these two chunk sizes (rows_loc = 512 here)
    for chunk in (100, 10_000):
        consts = make_streamed_quantized_consts(X, project, chunk, mesh, n)
        alg = snnls.GIGA.from_consts(consts, seed=0, max_active=64, mesh=mesh)
        alg.build(30)
        idx, vals = alg.active()

        vecs = np.asarray(project(jnp.asarray(X)))
        norms = np.sqrt((vecs**2).sum(axis=1))
        Vq = np.clip(np.round(vecs / np.where(norms > 0, norms, 1)[:, None]
                              * 127.0), -127, 127).astype(np.int8)
        got = np.asarray(consts.V)[:n, :S]
        diff = np.abs(got.astype(np.int32) - Vq.astype(np.int32))
        assert diff.max() <= 1 and (diff != 0).mean() < 1e-3
        ref = snnls.GIGA.from_consts(
            snnls.make_consts_quantized(
                jnp.asarray(np.asarray(consts.V)),
                jnp.asarray(np.asarray(consts.norms)),
                jnp.asarray(np.asarray(consts.b)),
                valid=jnp.asarray(np.asarray(consts.valid))),
            seed=0, max_active=64)
        ref.build(30)
        i2, v2 = ref.active()
        np.testing.assert_array_equal(idx, i2)
        np.testing.assert_allclose(vals, v2, rtol=1e-5, atol=1e-7)
