"""Pallas fused-select kernel: exact agreement with the XLA path.

Runs in interpreter mode on the CPU test mesh (the kernel itself targets
TPU; tests validate semantics, the TPU timing note lives in the module
docstring of ops/pallas_kernels.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from bayesian_coresets_tpu.ops import snnls


@pytest.mark.parametrize("sd", ["int8", "bfloat16"])
def test_pallas_build_matches_xla(sd, rng):
    sd = getattr(jnp, sd)
    A = rng.normal(size=(40, 300)).astype(np.float32)
    b = A.sum(axis=1)
    consts = snnls.make_consts(A, b, select_dtype=sd)
    with pltpu.force_tpu_interpret_mode():
        sp = snnls.build(consts, snnls.init_state(consts), 50, 1e-6,
                         method="giga", use_pallas=True)
    sx = snnls.build(consts, snnls.init_state(consts), 50, 1e-6,
                     method="giga", use_pallas=False)
    np.testing.assert_allclose(np.asarray(sp.w), np.asarray(sx.w),
                               rtol=1e-5, atol=1e-6)


def test_pallas_respects_valid_mask(rng):
    A = rng.normal(size=(20, 100)).astype(np.float32)
    b = A.sum(axis=1)
    valid = np.ones(100, bool)
    valid[60:] = False
    consts = snnls.make_consts(A, b, valid=jnp.asarray(valid),
                               select_dtype=jnp.int8)
    with pltpu.force_tpu_interpret_mode():
        st = snnls.build(consts, snnls.init_state(consts), 60, 1e-6,
                         method="giga", use_pallas=True)
    w = np.asarray(st.w)
    assert (w[60:] == 0).all()
