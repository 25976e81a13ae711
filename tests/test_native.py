"""Native C++ Lawson-Hanson NNLS: exactness vs scipy, API errors."""

import numpy as np
import pytest

from bayesian_coresets_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain available")


def test_matches_scipy_exactly(rng):
    from scipy.optimize import nnls as scipy_nnls
    for _ in range(10):
        m = int(rng.integers(4, 60))
        n = int(rng.integers(3, 50))
        A = rng.normal(size=(m, n))
        b = rng.normal(size=m)
        x, r = native.nnls(A, b)
        xs, rs = scipy_nnls(A, b)
        np.testing.assert_allclose(x, xs, atol=1e-8)
        assert abs(r - rs) < 1e-8
        assert (x >= 0).all()


def test_exact_on_identity(rng):
    A = np.eye(6)
    b = np.array([1.0, -2.0, 3.0, 0.0, -1.0, 2.0])
    x, r = native.nnls(A, b)
    np.testing.assert_allclose(x, np.maximum(b, 0), atol=1e-12)
    np.testing.assert_allclose(r, np.linalg.norm(np.minimum(b, 0)), atol=1e-12)


def test_shape_mismatch(rng):
    with pytest.raises(ValueError):
        native.nnls(np.zeros((3, 2)), np.zeros(4))


def test_matches_onchip_fista(rng):
    # the native exact solver is the oracle for the on-chip FISTA solver
    import jax.numpy as jnp
    from bayesian_coresets_tpu.ops import nnls_gram
    m, n = 30, 12
    A = rng.normal(size=(m, n))
    b = rng.normal(size=m)
    x_native, _ = native.nnls(A, b)
    G = (A.T @ A).astype(np.float32)
    c = (A.T @ b).astype(np.float32)
    x_fista = np.asarray(nnls_gram(jnp.asarray(G), jnp.asarray(c), num_iters=2000))
    np.testing.assert_allclose(x_fista, x_native, rtol=5e-3, atol=5e-3)
