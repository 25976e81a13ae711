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
        # support slots: the periodic exact-matvec refresh gathers the
        # <=1024 tracked rows instead of streaming the full f32 (n, S) V
        # (at N=1M that dense pass cost 2 GB / 64 iterations)
        state = snnls.init_state(consts, max_active=1024)
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


def _n8m_resident_arm(jax, jnp, null_t):
    """int8-RESIDENT build at N=8M — the regime where the round-3 closure
    measured the select matmul at 756-758 GB/s end-to-end (>=8M rows, no
    f32 (n, S) ever materialized).  The M=500 build here must land near
    that rate; together with the N=1M attribution (per-iteration dispatch
    overhead, scripts/probe_n1m_build.py) it reconciles the beyond-cache
    regime against the chip's demonstrated streaming rate."""
    from bayesian_coresets_tpu.coresets.projector import center_lls
    from bayesian_coresets_tpu.coresets.hilbert import _write_chunk
    from bayesian_coresets_tpu.models import logistic
    from bayesian_coresets_tpu.ops import snnls
    from bayesian_coresets_tpu.parallel.streamed import quantize_chunk

    N8, CH = 8_000_000, 1_000_000
    rows = -(-N8 // 1024) * 1024
    Sp = -(-S // 128) * 128
    ths = 0.1 * jax.random.normal(jax.random.key(7), (S, D), jnp.float32)

    @jax.jit
    def project_chunk(z):
        q, nrm, bsum = quantize_chunk(
            center_lls(logistic.log_likelihood(z, ths)), jnp.int32(CH))
        return jnp.pad(q, ((0, 0), (0, Sp - q.shape[1]))), nrm, bsum

    buf = jnp.zeros((rows, Sp), jnp.int8)
    b = jnp.zeros((S,), jnp.float32)
    norm_chunks = []
    t0 = time.perf_counter()
    for c in range(N8 // CH):
        z = logistic.gen_synthetic(jax.random.key(100 + c), CH, D)
        q, nrm, bsum = project_chunk(z)
        buf, b = _write_chunk(buf, q, jnp.int32(c * CH), b, bsum)
        norm_chunks.append(nrm)
    norms = jnp.pad(jnp.concatenate(norm_chunks), (0, rows - N8),
                    constant_values=1.0)
    valid = jnp.arange(rows) < N8
    consts = snnls.make_consts_quantized(
        buf, norms, jnp.pad(b, (0, Sp - S)), valid=valid)
    jax.device_get(consts.bnorm)
    t_construct = time.perf_counter() - t0

    def build(key):
        state = snnls.init_state(consts, key, max_active=1024)
        return snnls.build(consts, state, M, 1e-6, method="giga",
                           matvec_k=1024)

    st = build(jax.random.key(8))
    jax.device_get(st.w[0])                           # compile + warm
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        st = build(jax.random.key(9 + i))
        jax.device_get(st.w[0])
        times.append(max(time.perf_counter() - t0 - null_t, 1e-9))
    t = sorted(times)[1]
    gbps = M * rows * Sp / 1e9 / t
    return {
        "metric": "coreset_points_per_sec_N8M_int8_resident",
        "value": round(M / t, 2),
        "unit": "points/s",
        "per_iter_ms": round(1e3 * t / M, 3),
        "implied_select_gbps": round(gbps, 1),
        "calibrated_select_gbps": CALIBRATED_SELECT_GBPS,
        "pct_of_calibrated": round(100 * gbps / CALIBRATED_SELECT_GBPS, 1),
        "construction_s": round(t_construct, 2),
        "note": "streamed int8-resident constructor (no f32 (n,S) ever "
                "materialized); this is the regime the 753 GB/s ceiling "
                "was calibrated in — per-iteration dispatch overhead is "
                "amortized (5+ ms/iter vs ~0.1 ms overhead), unlike N=1M",
    }


def _sparsevi_arm(jax, jnp, null_t):
    """SparseVI at the reference-canonical gaussian config (N=1000, d=200,
    S=100, opt_itrs=50, M=30) — the exact workload the 46.4 s reference-CPU
    baseline was measured on (PARITY_RESULTS.md 'SparseVI build
    throughput'; reference coreset/sparsevi.py:16-76, SURVEY §3.2 calls
    this THE dominant compute pattern)."""
    import numpy as np
    import bayesian_coresets_tpu as bc
    from bayesian_coresets_tpu.coresets.sparsevi import svi_build
    from bayesian_coresets_tpu.models import gaussian

    REF_CPU_S = 46.4
    Ns, d, Ss, Ms, opt_itrs = 1000, 200, 100, 30, 50
    x = gaussian.gen_synthetic(jax.random.key(1), Ns, d)
    mu0, Sig0inv, Siginv = jnp.zeros(d), jnp.eye(d), jnp.eye(d)
    basis = jax.jit(gaussian.posterior_basis)(mu0, Sig0inv, Siginv)

    def sampler(k, n, wts, pts):
        if pts.size == 0:                 # projector-construction probe
            wts, pts = jnp.zeros(1), jnp.zeros((1, d))
        return gaussian.sample_weighted_post_basis(
            k, basis, jnp.asarray(pts), jnp.asarray(wts), n)

    loglik = lambda pts, th: gaussian.log_likelihood(pts, th, Siginv, 0.0)
    prj = bc.BlackBoxProjector(sampler, Ss, loglik)
    sched = lambda i: 1.0 / (1.0 + i)
    cap = 32
    w0, i0 = jnp.zeros(cap), jnp.full(cap, -1, jnp.int32)

    def one(key):
        return svi_build(x, w0, i0, jnp.int32(0), key, jnp.int32(Ms),
                         family=prj.family, n_sub_sel=None, n_sub_opt=None,
                         opt_itrs=opt_itrs, step_sched=sched)

    r = one(jax.random.key(2))
    jax.device_get(r[0][0])                           # compile + warm
    # one M=30 build is ~10 ms against a ~30 ms relay null: enqueue B
    # builds per fetch so the residual null error scales as 1/B
    B = 8
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        for j in range(B):
            r = one(jax.random.key(3 + B * i + j))
        jax.device_get(r[0][0])
        times.append((time.perf_counter() - t0 - null_t) / B)
    t = sorted(times)[1]
    steps = Ms * (1 + opt_itrs)      # select + opt_itrs contexts per iter
    step_flops = 2 * Ss * d * d * 2 + 2 * (Ns + cap) * d * Ss
    return {
        "metric": "sparsevi_points_per_sec_canonical",
        "value": round(Ms / t, 1),
        "unit": "points/s",
        "vs_baseline": round(REF_CPU_S / t, 1),
        "baseline": "reference numpy SparseVI on this machine, 46.4 s to "
                    "M=30 at the same config (PARITY_RESULTS.md)",
        "build_s": round(t, 3),
        "us_per_adam_step": round(1e6 * t / steps, 1),
        "implied_gflops": round(steps * step_flops / t / 1e9, 1),
        "bound": "latency-bound: each build iteration is (1+opt_itrs)=51 "
                 "SEQUENTIAL context-refit+project Adam steps (~57 MFLOP "
                 "each, measured ~7-10 us/step ~ 6 TFLOP/s — a few % of "
                 "the MXU roof, so per-step time is kernel-launch "
                 "granularity, not compute); the N=100k/n_sub=1024 arm "
                 "(scripts/bench_svi_tpu.py) runs 100x the data at only "
                 "~2x per-step cost, confirming the bound",
    }


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

    # ---- N=8M int8-resident arm + SparseVI canonical arm ----
    print(json.dumps(_n8m_resident_arm(jax, jnp, null_t)))
    print(json.dumps(_sparsevi_arm(jax, jnp, null_t)))

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
    # median of 3 timed reps: a ~13 s single-shot rep carries several
    # percent of relay/chip run-to-run variance (measured 10.4-12.1k
    # samples/s across rounds on identical code)
    nuts_times = []
    for i in range(3):
        t0 = time.perf_counter()
        _, _, res = run_nuts(jax.random.key(6 + i))
        jax.device_get(res.samples[0, 0, 0])
        nuts_times.append(time.perf_counter() - t0 - null_t)
    t_nuts = sorted(nuts_times)[1]
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
        "n1m_attribution": (
            "scripts/probe_n1m_build.py: bare select matmul+argmax floor at "
            "N=1M is 0.70 ms/iter (728 GB/s — the matmul itself runs ~3% "
            "under the >=8M-rows calibration at this size); the full solver "
            "adds ~0.10 ms/iter of per-iteration dispatch for its ~25 small "
            "bookkeeping ops (row gather, O(S) reweight, monotone latch) — "
            "amortized away at N=8M (see the int8-resident arm)"),
    }))


if __name__ == "__main__":
    main()
