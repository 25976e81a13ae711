"""MCMC tests: moment recovery, weighted-vs-replicated parity, diagnostics.

The parity test resurrects the reference's disabled self-test comparing the
weighted sampler against integer-replicated data (reference
examples/common/mcmc.py:71-119, commented out there — implemented here).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_coresets_tpu.mcmc import (
    IntegratorState,
    ess,
    hmc_kernel,
    nuts_kernel,
    run_nuts,
    split_rhat,
    weighted_logdensity,
)
from bayesian_coresets_tpu.models import gaussian, logistic, poisson


@pytest.fixture(scope="module")
def gauss_res():
    cov = jnp.asarray([[2.0, 1.2], [1.2, 1.5]])
    prec = jnp.linalg.inv(cov)
    logp = lambda th: -0.5 * th @ prec @ th
    res = run_nuts(logp, jnp.zeros((4, 2)), jax.random.key(0),
                   num_warmup=500, num_samples=1000)
    return cov, res


class TestNUTS:
    def test_gaussian_moments(self, gauss_res):
        cov, res = gauss_res
        s = np.asarray(res.samples).reshape(-1, 2)
        np.testing.assert_allclose(s.mean(0), np.zeros(2), atol=0.15)
        np.testing.assert_allclose(np.cov(s, rowvar=False), np.asarray(cov),
                                   rtol=0.15, atol=0.1)

    def test_adaptation_hits_target(self, gauss_res):
        _, res = gauss_res
        acc = np.asarray(res.accept_prob)
        assert (acc > 0.6).all() and (acc <= 1.0).all()
        assert (np.asarray(res.num_divergent) == 0).all()

    def test_diagnostics(self, gauss_res):
        _, res = gauss_res
        rhat = np.asarray(split_rhat(res.samples))
        assert (rhat < 1.05).all()
        e = np.asarray(ess(res.samples))
        assert (e > 200).all()

    def test_deterministic_given_key(self):
        logp = lambda th: -0.5 * jnp.sum(th**2)
        r1 = run_nuts(logp, jnp.zeros((1, 3)), jax.random.key(7),
                      num_warmup=50, num_samples=50)
        r2 = run_nuts(logp, jnp.zeros((1, 3)), jax.random.key(7),
                      num_warmup=50, num_samples=50)
        np.testing.assert_array_equal(np.asarray(r1.samples), np.asarray(r2.samples))

    def test_max_depth_bounds_steps(self):
        # extremely small step forces deep trees; num_steps must stay < 2^depth
        logp = lambda th: -0.5 * jnp.sum(th**2)
        vg = jax.value_and_grad(logp)
        z = jnp.ones(2)
        lp, g = vg(z)
        state = IntegratorState(z, jnp.zeros(2), lp, g)
        _, info = jax.jit(lambda k: nuts_kernel(vg, k, state, 1e-4, jnp.ones(2),
                                                max_depth=6))(jax.random.key(0))
        assert int(info.num_steps) <= 2**6
        assert int(info.depth) <= 6


class TestWeightedParity:
    def setup_method(self):
        self.z = logistic.gen_synthetic(jax.random.key(1), 20, 3, theta_scale=1.0)
        self.w = jnp.asarray(np.random.default_rng(0).integers(0, 4, 20), jnp.float32)
        self.z_rep = jnp.asarray(np.repeat(np.asarray(self.z),
                                           np.asarray(self.w, int), axis=0))

    def test_logdensity_equal(self):
        ld_w = weighted_logdensity(logistic, self.z, self.w)
        ld_r = weighted_logdensity(logistic, self.z_rep, jnp.ones(self.z_rep.shape[0]))
        for t in jax.random.normal(jax.random.key(2), (5, 3)):
            a, b = float(ld_w(t)), float(ld_r(t))
            assert abs(a - b) < 1e-3 * abs(b) + 1e-3

    def test_posterior_moments_equal(self):
        ld_w = weighted_logdensity(logistic, self.z, self.w)
        ld_r = weighted_logdensity(logistic, self.z_rep, jnp.ones(self.z_rep.shape[0]))
        rw = run_nuts(ld_w, jnp.zeros((2, 3)), jax.random.key(5),
                      num_warmup=400, num_samples=800)
        rr = run_nuts(ld_r, jnp.zeros((2, 3)), jax.random.key(6),
                      num_warmup=400, num_samples=800)
        sw = np.asarray(rw.samples).reshape(-1, 3)
        sr = np.asarray(rr.samples).reshape(-1, 3)
        np.testing.assert_allclose(sw.mean(0), sr.mean(0), atol=0.1)
        np.testing.assert_allclose(np.cov(sw, rowvar=False),
                                   np.cov(sr, rowvar=False), atol=0.1)

    def test_zero_weights_drop_data(self):
        w0 = self.w.at[:10].set(0.0)
        ld = weighted_logdensity(logistic, self.z, w0)
        ld_sub = weighted_logdensity(logistic, self.z[10:], w0[10:])
        t = jnp.asarray([0.3, -0.2, 0.8])
        assert abs(float(ld(t)) - float(ld_sub(t))) < 1e-4


class TestHMC:
    def test_gaussian_moments(self):
        prec = jnp.asarray([[1.0, 0.0], [0.0, 4.0]])
        logp = lambda th: -0.5 * th @ prec @ th
        vg = jax.value_and_grad(logp)
        z = jnp.zeros(2)
        lp, g = vg(z)
        state = IntegratorState(z, jnp.zeros(2), lp, g)

        def step(carry, k):
            st, = carry
            st, info = hmc_kernel(vg, k, st, 0.2, jnp.ones(2), num_steps=16)
            return (st,), st.z

        keys = jax.random.split(jax.random.key(0), 4000)
        _, zs = jax.lax.scan(step, (state,), keys)
        zs = np.asarray(zs[500:])
        np.testing.assert_allclose(zs.mean(0), np.zeros(2), atol=0.1)
        np.testing.assert_allclose(np.cov(zs, rowvar=False),
                                   np.linalg.inv(prec), rtol=0.2, atol=0.05)


class TestPoissonPosterior:
    def test_nuts_matches_laplace_roughly(self):
        z = poisson.gen_synthetic(jax.random.key(3), 300)
        ld = weighted_logdensity(poisson, z, jnp.ones(300))
        res = run_nuts(ld, jnp.zeros((2, 2)), jax.random.key(4),
                       num_warmup=400, num_samples=600)
        s = np.asarray(res.samples).reshape(-1, 2)
        from bayesian_coresets_tpu.models.laplace import laplace_approx
        lap = laplace_approx(z, jnp.ones(300), jnp.zeros(2),
                             grad_fn=poisson.grad_th_log_joint,
                             hess_fn=poisson.hess_th_log_joint)
        np.testing.assert_allclose(s.mean(0), np.asarray(lap.mu), atol=0.1)


class TestPooledAdaptation:
    def test_pooled_moments_and_shared_step(self):
        cov = jnp.asarray([[2.0, 1.2], [1.2, 1.5]])
        prec = jnp.linalg.inv(cov)
        logp = lambda th: -0.5 * th @ prec @ th
        res = run_nuts(logp, jnp.zeros((4, 2)), jax.random.key(0),
                       num_warmup=500, num_samples=1000, pooled_adaptation=True)
        s = np.asarray(res.samples).reshape(-1, 2)
        np.testing.assert_allclose(np.cov(s, rowvar=False), np.asarray(cov),
                                   rtol=0.15, atol=0.1)
        # one shared step size and mass matrix across chains
        assert np.unique(np.asarray(res.step_size)).size == 1
        assert (np.asarray(res.inv_mass) ==
                np.asarray(res.inv_mass)[0]).all()
        assert (np.asarray(res.accept_prob) > 0.5).all()


class TestRunWrapper:
    def test_reference_conventions(self):
        from bayesian_coresets_tpu import mcmc as M
        z = logistic.gen_synthetic(jax.random.key(0), 50, 2, theta_scale=1.0)
        samples, t, res = M.run(logistic, z, jnp.ones(50), 100, jax.random.key(1),
                                num_chains=2)
        assert samples.shape == (200, 2)   # chains * n_samples, d
        assert t > 0
        assert np.isfinite(np.asarray(samples)).all()

    def test_poisson_theta_dim(self):
        from bayesian_coresets_tpu import mcmc as M
        z = poisson.gen_synthetic(jax.random.key(2), 60)
        samples, t, res = M.run(poisson, z, jnp.ones(60), 50, jax.random.key(3),
                                d=2)
        assert samples.shape == (50, 2)


def test_laplace_init_and_fallback():
    """Chains initialize from the Laplace fit when the model has grad/hess
    (concentrated posteriors freeze from all-zeros inits); models without
    Hessians fall back to zeros."""
    import types
    from bayesian_coresets_tpu.mcmc import weighted
    from bayesian_coresets_tpu.models import logistic

    Z = logistic.gen_synthetic(jax.random.key(0), 50, 4)
    w = jnp.full(50, 100.0)
    init = weighted.laplace_init(logistic, Z, w, 8, jax.random.key(1), 4)
    assert init.shape == (8, 4)
    assert not np.allclose(np.asarray(init), 0.0)       # near the mode, not 0
    assert np.asarray(init).std(axis=0).max() < 1.0     # overdispersed but local

    bare = types.SimpleNamespace(log_joint=logistic.log_joint)
    init0 = weighted.laplace_init(bare, Z, w, 3, jax.random.key(1), 4)
    np.testing.assert_array_equal(np.asarray(init0), np.zeros((3, 4)))


class TestPoisonedStateRobustness:
    """A state with non-finite cached gradient must never poison the sampler
    (observed on airportdelays: one poisoned chain collapsed the POOLED step
    size to ~1e-27 and froze all 8 chains at their inits)."""

    def test_step_size_search_falls_back_on_poisoned_state(self):
        from bayesian_coresets_tpu.mcmc.adapt import find_reasonable_step_size
        vg = jax.value_and_grad(lambda x: -0.5 * jnp.sum(x**2))
        z = jnp.zeros(4)
        logp, grad = vg(z)
        bad_grad = grad.at[0].set(jnp.inf)
        step = find_reasonable_step_size(vg, z, logp, bad_grad, jnp.ones(4),
                                         jax.random.key(0), init_step=0.37)
        assert abs(float(step) - 0.37) < 1e-6

    def test_nuts_never_caches_nonfinite_grad(self):
        from bayesian_coresets_tpu.mcmc.integrators import IntegratorState
        from bayesian_coresets_tpu.mcmc.nuts import nuts_kernel

        # finite logp everywhere, but the gradient overflows beyond |x0|>1.5
        @jax.custom_jvp
        def logd(x):
            return -0.5 * jnp.sum(x**2)

        @logd.defjvp
        def _jvp(primals, tangents):
            (x,), (t,) = primals, tangents
            g = -x * jnp.where(jnp.abs(x[0]) > 1.5, jnp.inf, 1.0)
            return logd(x), jnp.dot(g, t)

        vg = jax.value_and_grad(logd)
        z = jnp.zeros(3)
        logp, grad = vg(z)
        state = IntegratorState(z, jnp.zeros(3), logp, grad)

        @jax.jit
        def run(state, key):
            def body(i, carry):
                state, key, ok = carry
                key, k = jax.random.split(key)
                state, _ = nuts_kernel(vg, k, state, 0.6, jnp.ones(3), 6)
                ok = ok & jnp.all(jnp.isfinite(state.grad)) & jnp.isfinite(state.logp)
                return state, key, ok
            return jax.lax.fori_loop(0, 200, body, (state, key, jnp.array(True)))

        state, _, ok = run(state, jax.random.key(1))
        assert bool(ok), "a non-finite-gradient state was cached"


class TestDenseMass:
    """Dense (d, d) metric adaptation (Stan's dense_e; see integrators.py)."""

    def test_welford_covariance_matches_numpy(self):
        from bayesian_coresets_tpu.mcmc.adapt import (
            welford_init, welford_update, welford_update_batch,
            welford_variance)
        rng = np.random.default_rng(0)
        xs = rng.normal(size=(64, 3)).astype(np.float32)
        xs[:, 1] += 2.0 * xs[:, 0]

        wf = welford_init(3, dense=True)
        for x in xs:
            wf = welford_update(wf, jnp.asarray(x))
        est = np.asarray(welford_variance(wf))
        n = 64.0
        expect = (n / (n + 5.0)) * np.cov(xs.T) + 1e-3 * (5.0 / (n + 5.0)) * np.eye(3)
        np.testing.assert_allclose(est, expect, rtol=2e-4, atol=2e-5)

        # batched (Chan) merge must agree with the sequential accumulation
        wfb = welford_init(3, dense=True)
        for chunk in xs.reshape(8, 8, 3):
            wfb = welford_update_batch(wfb, jnp.asarray(chunk))
        np.testing.assert_allclose(np.asarray(welford_variance(wfb)), expect,
                                   rtol=2e-4, atol=2e-5)

    def test_correlated_gaussian_recovers_full_covariance(self):
        # rho=0.99 correlation between dims 0,1 — a diagonal metric cannot
        # equalize this geometry; the dense metric must recover the target
        # covariance including the independent dim's variance
        rho = 0.99
        cov = np.array([[1.0, rho, 0.0], [rho, 1.0, 0.0], [0.0, 0.0, 4.0]])
        prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)
        logp = lambda th: -0.5 * th @ (prec @ th)
        res = run_nuts(logp, jnp.zeros((2, 3)), jax.random.key(0),
                       num_warmup=600, num_samples=600, dense_mass=True)
        assert res.inv_mass.shape == (2, 3, 3)
        # deprecated alias still resolves to the same array
        assert res.inv_mass_diag is res.inv_mass
        s = np.asarray(res.samples).reshape(-1, 3)
        got = np.cov(s, rowvar=False)
        np.testing.assert_allclose(got, cov, rtol=0.2, atol=0.15)
        # the adapted metric itself captures the correlation
        im = np.asarray(res.inv_mass[0])
        assert im[0, 1] / np.sqrt(im[0, 0] * im[1, 1]) > 0.9
        assert (np.asarray(split_rhat(res.samples)) < 1.05).all()

    def test_pooled_dense(self):
        rho = 0.95
        cov = np.array([[1.0, rho], [rho, 1.0]])
        prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)
        logp = lambda th: -0.5 * th @ (prec @ th)
        res = run_nuts(logp, jnp.zeros((4, 2)), jax.random.key(3),
                       num_warmup=500, num_samples=400, dense_mass=True,
                       pooled_adaptation=True)
        assert res.inv_mass.shape == (4, 2, 2)
        s = np.asarray(res.samples).reshape(-1, 2)
        np.testing.assert_allclose(np.cov(s, rowvar=False), cov,
                                   rtol=0.2, atol=0.15)

    def test_hmc_kernel_dense_metric(self):
        cov = np.array([[1.0, 0.9], [0.9, 1.0]])
        prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)
        logp = lambda th: -0.5 * th @ (prec @ th)
        vg = jax.value_and_grad(logp)
        inv_mass = jnp.asarray(cov, jnp.float32)  # exact metric
        lp, g = vg(jnp.zeros(2))
        st = IntegratorState(jnp.zeros(2), jnp.zeros(2), lp, g)

        def step(st, k):
            st, info = hmc_kernel(vg, k, st, 0.5, inv_mass, num_steps=8)
            return st, (st.z, info.accept_prob)

        _, (zs, acc) = jax.lax.scan(step, st,
                                    jax.random.split(jax.random.key(0), 1500))
        zs = np.asarray(zs)[300:]
        # with the exact metric the kernel moves in whitened space: high
        # acceptance AND full exploration of the correlated direction
        assert float(np.mean(np.asarray(acc)[300:])) > 0.8
        np.testing.assert_allclose(np.cov(zs.T), cov, rtol=0.25, atol=0.15)

    def test_weighted_run_dense_mass(self):
        # end-to-end through mcmc.run on a weighted logistic posterior
        from bayesian_coresets_tpu.mcmc import weighted
        key = jax.random.key(0)
        x = jax.random.normal(key, (40, 2))
        y = jnp.sign(x[:, 0] + 0.5 * x[:, 1] + 0.1)
        z = jnp.concatenate([x * y[:, None], y[:, None]], axis=1)
        wts = jnp.ones(40)
        s_dense, _, res = weighted.run(logistic, z, wts, 300, jax.random.key(1),
                                       num_chains=2, dense_mass=True)
        s_diag, _, _ = weighted.run(logistic, z, wts, 300, jax.random.key(1),
                                    num_chains=2, dense_mass=False)
        # same posterior either way (dense is a sampler control, not a model
        # change): posterior means agree
        np.testing.assert_allclose(np.asarray(s_dense).mean(0),
                                   np.asarray(s_diag).mean(0), atol=0.25)
