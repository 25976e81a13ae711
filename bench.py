"""Headline benchmark: coreset construction throughput at M=500 on one chip,
plus a weighted-NUTS chain-parallel throughput line (BASELINE.json names
both axes of the metric).

Workload (matches the reference's simple_lr/logistic flagship path,
SURVEY.md §3.1): N=100k logistic-regression datapoints, S=500 projection
samples, GIGA Hilbert coreset built to M=500.  The timed region is the
fully-fused jitted pipeline: log-likelihood projection (one (N,S) matmul
chain) + snnls constant precompute + 500 greedy GIGA iterations.  The
weighted-NUTS line then samples the coreset posterior this build produced
(1024 vmapped chains — the measured throughput knee; the chip is
latency-bound below ~1k of these tiny chains) — the reference's coreset-MCMC stage
(examples/common/mcmc.py:58-68, examples/logistic_poisson_regression/
main.py:205-214).

Baselines, measured on THIS machine 2026-08-17/20:
- build: reference implementation (numpy/scipy, 1 CPU) on the same
  workload: build-only 68.7s (7.28 points/s), projection+build 80.1s
  (6.24 points/s).  vs_baseline compares end-to-end throughput.
- NUTS: pystan is not installed here, so the reference's Stan-C++
  chains=1 sampler cannot be timed; the stand-in baseline is THIS
  framework's own single-chain CPU NUTS on the same coreset posterior
  (49 samples/s, PARITY_RESULTS.md "NUTS throughput") — a generous
  stand-in (JAX CPU NUTS ≈ Stan's C++ speed; the reference hardcodes
  chains=1, examples/common/mcmc.py:58,65).

Methodology (relay-aware, round 3-4): the chip sits behind a network
relay; jax.block_until_ready returns at ENQUEUE, and each device fetch
costs a measured ~25-30 ms round trip a locally-attached TPU would not
pay.  Timed reps enqueue B builds per fetch (the in-order device queue
fences all of them) and subtract the measured null round trip.  Round 4
adds self-validation (VERDICT r3 weak #2):
- a SECOND arm at B=8: per-build time must match the B=4 arm within
  noise (a stale null estimate would skew the arms differently — the
  residual null error scales as 1/B);
- implied_select_gbps: the int8 selection copy is streamed once per
  iteration, so M*bytes(Vsel)/t must not exceed the chip's calibrated
  deliverable read rate (runs/select_bandwidth.json: 753 GB/s) — unless
  the copy is small enough to go cache/VMEM-resident, which the N=1M arm
  (512 MB copy, cannot be resident) rules in or out by re-measuring at a
  scale where only HBM streaming is possible.

Prints one JSON line per metric; the LAST line is the headline
{"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

N, D, S, M = 100_000, 10, 500, 500
REFERENCE_CPU_POINTS_PER_S = 6.24  # end-to-end (projection + build), see above
CPU_1CHAIN_NUTS_SAMPLES_PER_S = 49.0  # PARITY_RESULTS.md (pystan unavailable)
CALIBRATED_SELECT_GBPS = 753.1     # runs/select_bandwidth.json calib_reduce
NUTS_CHAINS, NUTS_DRAWS = 1024, 150   # 1024 = the measured throughput knee (scripts/probe_nuts_chains.py: 128ch 1.6k, 1024ch 11.4k, 4096ch 14.4k samples/s)


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def _bandwidth_verdict(implied_gbps, implied_1m_gbps):
    """Self-interpretation of the implied-streaming-rate audit."""
    cap = 1.05 * CALIBRATED_SELECT_GBPS
    if implied_gbps <= cap:
        return "ok: implied rate within the calibrated HBM ceiling"
    if implied_1m_gbps <= cap:
        return ("explained: the 51 MB N=100k select copy is (partially) "
                "on-chip-resident — the implied rate exceeds the HBM "
                "ceiling, while the N=1M arm (512 MB copy, cannot be "
                "resident) measures within it; the M=500 headline "
                "therefore does NOT extrapolate to beyond-cache N "
                "(points_per_s_N1M is that regime)")
    return ("SUSPECT: both arms exceed the calibrated ceiling — timing "
            "methodology error likely (check the null subtraction)")


def _null_roundtrip(jax, jnp):
    null_op = jax.jit(lambda x: x + 1.0)
    x0 = jnp.float32(0.0)
    jax.device_get(null_op(x0))
    nulls = sorted(
        _timed(lambda: jax.device_get(null_op(x0))) for _ in range(11))
    return nulls[len(nulls) // 2]


def _make_build(jax, jnp, n):
    from bayesian_coresets_tpu.coresets.projector import center_lls
    from bayesian_coresets_tpu.models import logistic
    from bayesian_coresets_tpu.ops import snnls

    @jax.jit
    def build(z, key):
        # fixed near-MAP Gaussian sampler (simple_lr-style tangent space)
        ths = 0.1 * jax.random.normal(key, (S, D), jnp.float32)
        vecs = center_lls(logistic.log_likelihood(z, ths))       # (n, S)
        # int8 selection copy: quarter score-matmul HBM traffic (rows
        # pre-normalized, MXU int8 path); weights, reweighting, and the
        # error check stay f32.  Residual quality matches/betters f32
        # selection (see tests/test_snnls.py::test_reduced_precision_select).
        consts = snnls.make_consts(vecs.T, jnp.sum(vecs, axis=0),
                                   select_dtype=jnp.int8)
        state = snnls.init_state(consts)
        state = snnls.build(consts, state, M, 1e-6, method="giga")
        return state.w

    return build


def _arm(jax, build, Z, null_t, B, reps, key0):
    """Median per-build seconds over ``reps`` fetches of B enqueued builds."""
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        for j in range(B):                     # fresh keys: no caching
            w = build(Z, jax.random.key(key0 + B * i + j))
        jax.device_get(w[0])                   # fences all B (in-order queue)
        times.append(max(time.perf_counter() - t0 - null_t, 1e-9) / B)
    times.sort()
    return times[len(times) // 2], times, w


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from bayesian_coresets_tpu.models import logistic

    Z = logistic.gen_synthetic(jax.random.key(0), N, D)
    build = _make_build(jax, jnp, N)
    w_warm = build(Z, jax.random.key(1))
    jax.device_get(w_warm[0])                  # compile + warm
    null_t = _null_roundtrip(jax, jnp)

    # chip run-to-run variance on this workload is ~20% (PARITY_RESULTS.md
    # "Hot-loop" section): take k=5 repetitions per arm, report the MEDIAN
    # of the B=4 arm as the headline (continuity with rounds 1-3) and the
    # B=8 arm as the null-subtraction consistency check.
    t4, times4, w_last = _arm(jax, build, Z, null_t, B=4, reps=5, key0=2)
    t8, times8, _ = _arm(jax, build, Z, null_t, B=8, reps=5, key0=100)
    arm_spread = abs(t8 - t4) / t4

    # implied selection-streaming bandwidth vs the calibrated ceiling
    np_rows, sp = -(-N // 1024) * 1024, -(-S // 128) * 128
    select_gb = M * np_rows * sp / 1e9
    implied_gbps = select_gb / t4

    # N=1M arm: the 512 MB int8 copy CANNOT be cache/VMEM-resident, so the
    # implied rate here is a pure HBM-streaming measurement at the scale
    # where the bandwidth calibration was done.
    N1 = 1_000_000
    Z1 = logistic.gen_synthetic(jax.random.key(3), N1, D)
    build1 = _make_build(jax, jnp, N1)
    w1 = build1(Z1, jax.random.key(4))
    jax.device_get(w1[0])
    t1m, _, _ = _arm(jax, build1, Z1, null_t, B=2, reps=3, key0=200)
    np1 = -(-N1 // 1024) * 1024
    implied_1m_gbps = (M * np1 * sp / 1e9) / t1m

    # ---- weighted-NUTS line: sample the coreset posterior just built ----
    from bayesian_coresets_tpu import mcmc as MC
    from bayesian_coresets_tpu.mcmc import weighted

    w_host = np.asarray(w_last)
    act = np.flatnonzero(w_host > 0)
    zc = jnp.asarray(np.asarray(Z)[act])
    wc = jnp.asarray(w_host[act])

    def run_nuts(key):
        return weighted.run(logistic, zc, wc, NUTS_DRAWS, key,
                            num_chains=NUTS_CHAINS, target_accept=0.8,
                            num_warmup=NUTS_DRAWS)

    _, _, res = run_nuts(jax.random.key(5))    # compile + adapt warm
    jax.device_get(res.samples[0, 0, 0])
    t0 = time.perf_counter()
    _, _, res = run_nuts(jax.random.key(6))
    jax.device_get(res.samples[0, 0, 0])
    t_nuts = time.perf_counter() - t0 - null_t
    nuts_sps = NUTS_CHAINS * NUTS_DRAWS / t_nuts
    min_ess_per_s = float(np.min(np.asarray(MC.ess(res.samples)))) / t_nuts
    max_rhat = float(np.max(np.asarray(MC.split_rhat(res.samples))))

    print(json.dumps({
        "metric": f"weighted_nuts_samples_per_sec_{NUTS_CHAINS}chains",
        "value": round(nuts_sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(nuts_sps / CPU_1CHAIN_NUTS_SAMPLES_PER_S, 2),
        "baseline": "this framework's 1-chain CPU NUTS, 49 samples/s "
                    "(pystan unavailable; reference hardcodes chains=1)",
        "chains": NUTS_CHAINS,
        "kept_draws_per_chain": NUTS_DRAWS,
        "min_ess_per_s": round(min_ess_per_s, 1),
        "max_split_rhat": round(max_rhat, 4),
        "coreset_size": int(act.size),
    }))

    pts_per_s = M / t4
    print(json.dumps({
        "metric": "coreset_points_per_sec_per_chip_M500",
        "value": round(pts_per_s, 2),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / REFERENCE_CPU_POINTS_PER_S, 2),
        "reps": len(times4),
        "builds_per_rep": 4,
        "relay_null_ms_subtracted": round(1e3 * null_t, 2),
        "points_per_s_min": round(M / times4[-1], 2),
        "points_per_s_max": round(M / times4[0], 2),
        # self-validation (VERDICT r3): B=8 arm + bandwidth audit
        "per_build_ms_B4": round(1e3 * t4, 2),
        "per_build_ms_B8": round(1e3 * t8, 2),
        "arm_consistency_pct": round(100 * arm_spread, 1),
        "implied_select_gbps": round(implied_gbps, 1),
        "implied_select_gbps_N1M": round(implied_1m_gbps, 1),
        "calibrated_select_gbps": CALIBRATED_SELECT_GBPS,
        "bandwidth_check": _bandwidth_verdict(implied_gbps, implied_1m_gbps),
        "points_per_s_N1M": round(M / t1m, 2),
    }))


if __name__ == "__main__":
    main()
