"""Multi-process (multi-controller) data parallelism on CPU.

The reference is strictly single-process (SURVEY.md §2.5).  This test
launches TWO actual OS processes, each owning 2 virtual CPU devices, wires
them with ``jax.distributed.initialize`` through
``parallel/distributed.py``, and runs a psum-reduced data-parallel GIGA
build over the 4-device global mesh.  Both processes must produce the same
weights as a single-process run on a local 4-device mesh — the
multi-controller analogue of the in-process bit-parity tests in
test_parallel.py.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_build_matches_single_process(tmp_path, cpu_devices):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the worker sets its own 2-device flag
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", f"localhost:{port}",
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    w0 = np.load(tmp_path / "w_0.npy")
    w1 = np.load(tmp_path / "w_1.npy")
    # both controllers hold the same global result
    np.testing.assert_array_equal(w0, w1)
    assert (w0 > 0).sum() > 0

    # single-process reference: same problem, same mesh shape (4 devices)
    from bayesian_coresets_tpu.parallel import build_sharded, make_mesh
    rng = np.random.default_rng(0)
    A = rng.normal(size=(32, 4096)).astype(np.float32)
    b = A.sum(axis=1)
    mesh = make_mesh({"data": 4}, devices=cpu_devices[:4])
    st = build_sharded(A, b, 64, mesh, max_active=128)
    np.testing.assert_allclose(w0, np.asarray(st.w), rtol=1e-6, atol=1e-7)

    # ---- streamed int8-resident construction across the two processes ----
    # each worker passed only its streamed_row_layout rows and projected
    # them SPMD; both controllers must agree, and the result must match a
    # single-process run over the same 4-device layout (same per-device
    # shapes -> same compiled per-shard program)
    si0 = np.load(tmp_path / "stream_idx_0.npy")
    si1 = np.load(tmp_path / "stream_idx_1.npy")
    sw0 = np.load(tmp_path / "stream_w_0.npy")
    sw1 = np.load(tmp_path / "stream_w_1.npy")
    np.testing.assert_array_equal(si0, si1)
    np.testing.assert_array_equal(sw0, sw1)
    assert (sw0 > 0).sum() > 0

    import jax.numpy as jnp
    from bayesian_coresets_tpu.ops import snnls as S
    from bayesian_coresets_tpu.parallel import make_streamed_quantized_consts

    n2, d2 = 3000, 6
    rng2 = np.random.default_rng(1)
    full = rng2.normal(size=(n2, d2)).astype(np.float32)
    ths = jnp.asarray(rng2.normal(size=(16, d2)).astype(np.float32))
    project = lambda pts: jnp.tanh(pts @ ths.T)
    consts = make_streamed_quantized_consts(full, project, 512, mesh, n2)
    alg = S.GIGA.from_consts(consts, seed=0, max_active=64, mesh=mesh)
    alg.build(40)
    idx_ref, w_ref = alg.active()
    np.testing.assert_array_equal(si0, idx_ref)
    # the b partials cross the process boundary through one all-reduce
    # whose reduction order is not bit-specified vs the in-process psum;
    # that f32 ulp in b compounds over 40 GIGA reweights to ~1e-4 relative
    np.testing.assert_allclose(sw0, w_ref, rtol=5e-4, atol=1e-6)
