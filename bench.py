"""Headline benchmark: coreset construction throughput at M=500 on one chip.

Workload (matches the reference's simple_lr/logistic flagship path,
SURVEY.md §3.1): N=100k logistic-regression datapoints, S=500 projection
samples, GIGA Hilbert coreset built to M=500.  The timed region is the
fully-fused jitted pipeline: log-likelihood projection (one (N,S) matmul
chain) + snnls constant precompute + 500 greedy GIGA iterations.

Baseline: the reference implementation (numpy/scipy, 1 CPU) on the SAME
machine and workload measured 2026-08-17:
  build-only 68.7s (7.28 points/s), projection+build 80.1s (6.24 points/s).
vs_baseline compares end-to-end (projection + build) throughput.

Methodology note (round 3): the chip here sits behind a network relay,
so each fetch costs a measured ~25-30 ms round trip a locally-attached
TPU would not pay.  Timed reps now enqueue 4 builds per fetch (in-order
device queue fences all of them) and subtract the measured null round
trip — this is why the value roughly doubled vs rounds 1-2 on an
UNCHANGED compiled program; the correction's inputs are recorded in the
JSON line (builds_per_rep, relay_null_ms_subtracted).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

N, D, S, M = 100_000, 10, 500, 500
REFERENCE_CPU_POINTS_PER_S = 6.24  # end-to-end (projection + build), see above


def main():
    import jax
    import jax.numpy as jnp

    from bayesian_coresets_tpu.coresets.projector import center_lls
    from bayesian_coresets_tpu.models import logistic
    from bayesian_coresets_tpu.ops import snnls

    Z = logistic.gen_synthetic(jax.random.key(0), N, D)

    @jax.jit
    def build(z, key):
        # fixed near-MAP Gaussian sampler (simple_lr-style tangent space)
        ths = 0.1 * jax.random.normal(key, (S, D), jnp.float32)
        vecs = center_lls(logistic.log_likelihood(z, ths))       # (N, S)
        # int8 selection copy: quarter score-matmul HBM traffic (rows
        # pre-normalized, MXU int8 path); weights, reweighting, and the
        # error check stay f32.  Residual quality matches/betters f32
        # selection (see tests/test_snnls.py::test_reduced_precision_select).
        consts = snnls.make_consts(vecs.T, jnp.sum(vecs, axis=0),
                                   select_dtype=jnp.int8)
        state = snnls.init_state(consts)
        state = snnls.build(consts, state, M, 1e-6, method="giga")
        return state.w

    # compile + warm up
    jax.device_get(build(Z, jax.random.key(1)))

    # The device sits behind a network relay here: every fetch costs a
    # ~25-30 ms round trip that a locally-attached TPU would not pay, and
    # jax.block_until_ready returns at ENQUEUE (it fences nothing).  So
    # each timed rep (a) enqueues B builds back-to-back — the device
    # executes in order, so fetching the LAST result fences all B — and
    # (b) subtracts the null round trip, measured on a trivial scalar.
    # Without this the relay adds ~26 ms (~40%) of pure network latency
    # to every rep and its jitter dominates the min/max band.
    null_op = jax.jit(lambda x: x + 1.0)
    x0 = jnp.float32(0.0)
    jax.device_get(null_op(x0))
    nulls = sorted(
        _timed(lambda: jax.device_get(null_op(x0))) for _ in range(11))
    null_t = nulls[len(nulls) // 2]

    # chip run-to-run variance on this workload is ~20% (PARITY_RESULTS.md
    # "Hot-loop" section), so a single-shot number cannot distinguish a real
    # 5% regression from noise: take k=5 repetitions, report the MEDIAN as
    # the headline and carry min/max so round-over-round comparisons are
    # interpretable at the ±2% level.
    B = 4
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        for j in range(B):                     # fresh keys: no caching
            w = build(Z, jax.random.key(2 + B * i + j))
        jax.device_get(w)                      # fences all B (in-order queue)
        times.append(max(time.perf_counter() - t0 - null_t, 1e-9) / B)
    times.sort()
    t = times[len(times) // 2]

    pts_per_s = M / t
    print(json.dumps({
        "metric": "coreset_points_per_sec_per_chip_M500",
        "value": round(pts_per_s, 2),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / REFERENCE_CPU_POINTS_PER_S, 2),
        "reps": len(times),
        "builds_per_rep": B,
        "relay_null_ms_subtracted": round(1e3 * null_t, 2),
        "points_per_s_min": round(M / times[-1], 2),
        "points_per_s_max": round(M / times[0], 2),
    }))


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
