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
