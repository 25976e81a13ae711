"""Checkpoint/resume and profiling utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_coresets_tpu.ops import GIGA, SNNLSState
from bayesian_coresets_tpu.utils import checkpoint, profiling


class TestCheckpoint:
    def test_roundtrip_pytree(self, tmp_path):
        tree = {"a": jnp.arange(5), "b": (jnp.ones((2, 3)), jnp.int32(7))}
        p = str(tmp_path / "ck.npz")
        checkpoint.save(p, tree, meta={"note": "x"})
        out, meta = checkpoint.load(p, like=tree)
        np.testing.assert_array_equal(np.asarray(out["a"]), np.arange(5))
        np.testing.assert_array_equal(np.asarray(out["b"][0]), np.ones((2, 3)))
        assert meta["note"] == "x"

    def test_prng_key_roundtrip(self, tmp_path):
        key = jax.random.key(42)
        p = str(tmp_path / "key.npz")
        checkpoint.save(p, {"k": key})
        out, _ = checkpoint.load(p, like={"k": key})
        np.testing.assert_array_equal(
            np.asarray(jax.random.normal(out["k"], (3,))),
            np.asarray(jax.random.normal(key, (3,))))

    def test_structure_mismatch(self, tmp_path):
        p = str(tmp_path / "ck.npz")
        checkpoint.save(p, (jnp.zeros(2),))
        with pytest.raises(ValueError):
            checkpoint.load(p, like=(jnp.zeros(2), jnp.zeros(3)))

    def test_solver_resume_matches_uninterrupted(self, rng, tmp_path):
        A = rng.normal(size=(30, 120)).astype(np.float32)
        b = A.sum(axis=1)
        ref = GIGA(A, b)
        ref.build(40)

        a = GIGA(A, b)
        a.build(15)
        p = str(tmp_path / "solver.npz")
        a.save(p)
        fresh = GIGA(A, b)
        fresh.restore(p)
        fresh.build(25)
        np.testing.assert_allclose(fresh.weights(), ref.weights(),
                                   rtol=1e-5, atol=1e-6)

    def test_sparsevi_resume(self, rng, tmp_path):
        import bayesian_coresets_tpu as bct
        from bayesian_coresets_tpu.models import gaussian
        d, N, S = 5, 100, 30
        x = gaussian.gen_synthetic(jax.random.key(0), N, d)
        mu0, S0i, Si = jnp.zeros(d), jnp.eye(d), jnp.eye(d)
        loglik = lambda pts, th: gaussian.log_likelihood(pts, th, Si, 0.0)

        def sampler(k, n, w, p):
            if p.size == 0:
                w = jnp.zeros(1)
                p = jnp.zeros((1, d))
            return gaussian.sample_weighted_post(k, mu0, S0i, Si, p, w, n)

        svi = bct.SparseVICoreset(x, bct.BlackBoxProjector(sampler, S, loglik),
                                  opt_itrs=5)
        svi.build(4)
        p = str(tmp_path / "svi.npz")
        svi.save(p)
        svi2 = bct.SparseVICoreset(x, bct.BlackBoxProjector(sampler, S, loglik),
                                   opt_itrs=5)
        svi2.restore(p)
        assert svi2.size() == svi.size()
        np.testing.assert_array_equal(svi2.idcs, svi.idcs)
        svi2.build(4)   # resumes without error and grows
        assert svi2.size() >= svi.size()


class TestProfiling:
    def test_phase_timer(self):
        profiling.reset()
        with profiling.phase("p1"):
            sum(range(1000))
        with profiling.phase("p1"):
            pass
        rep = profiling.report()
        assert rep["p1"]["count"] == 2
        assert rep["p1"]["total_s"] >= 0
        profiling.reset()
        assert profiling.report() == {}


class TestAutoCheckpoint:
    def test_build_with_checkpointing_resumes(self, rng, tmp_path):
        from bayesian_coresets_tpu.ops import GIGA
        A = rng.normal(size=(30, 120)).astype(np.float32)
        b = A.sum(axis=1)
        ck = str(tmp_path / "auto.npz")

        ref = GIGA(A, b)
        ref.build(40)

        a = GIGA(A, b)
        a.build(40, checkpoint_path=ck, checkpoint_every=10)
        np.testing.assert_allclose(a.weights(), ref.weights(), rtol=1e-5, atol=1e-6)

        # simulate a crash after 40 iters: a fresh instance asked for the same
        # build restores from the checkpoint instead of redoing work
        fresh = GIGA(A, b)
        fresh.build(40, checkpoint_path=ck, checkpoint_every=10)
        np.testing.assert_allclose(fresh.weights(), ref.weights(), rtol=1e-5, atol=1e-6)
        assert int(fresh.state.itr) == 40


class TestHilbertCheckpoint:
    def test_solver_checkpoint_through_hilbert(self, rng, tmp_path):
        import jax, jax.numpy as jnp
        import bayesian_coresets_tpu as bct
        from bayesian_coresets_tpu.models import gaussian
        d, N, S = 5, 120, 40
        x = gaussian.gen_synthetic(jax.random.key(0), N, d)
        loglik = lambda pts, th: gaussian.log_likelihood(pts, th, jnp.eye(d), 0.0)
        sampler = lambda k, n, w, p: gaussian.sample_weighted_post(
            k, jnp.zeros(d), jnp.eye(d), jnp.eye(d), x, jnp.ones(N), n)
        hc = bct.HilbertCoreset(x, bct.BlackBoxProjector(sampler, S, loglik))
        hc.build(10)
        ck = str(tmp_path / "h.npz")
        hc.snnls.save(ck)
        hc2 = bct.HilbertCoreset(x, bct.BlackBoxProjector(sampler, S, loglik))
        hc2.snnls.restore(ck)
        hc2._sync()
        np.testing.assert_array_equal(hc2.idcs, hc.idcs)
        np.testing.assert_allclose(hc2.wts, hc.wts, rtol=1e-6)
