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

    # chip run-to-run variance on this workload is ~20% (PARITY_RESULTS.md
    # "Hot-loop" section), so a single-shot number cannot distinguish a real
    # 5% regression from noise: take k=5 repetitions, report the MEDIAN as
    # the headline and carry min/max so round-over-round comparisons are
    # interpretable at the ±2% level.
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        w = build(Z, jax.random.key(2 + i))   # fresh key: no caching possible
        jax.device_get(w)                      # forces completion + transfer
        times.append(time.perf_counter() - t0)
    times.sort()
    t = times[len(times) // 2]

    pts_per_s = M / t
    print(json.dumps({
        "metric": "coreset_points_per_sec_per_chip_M500",
        "value": round(pts_per_s, 2),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / REFERENCE_CPU_POINTS_PER_S, 2),
        "reps": len(times),
        "points_per_s_min": round(M / times[-1], 2),
        "points_per_s_max": round(M / times[0], 2),
    }))


if __name__ == "__main__":
    main()
