"""SparseVI / BatchPSVI TPU throughput measurement (VERDICT r4 item 1).

Measures the titular algorithm family on the axon TPU chip with the
relay-aware methodology bench.py uses (enqueue B builds per fetch, fence
with a scalar device_get, subtract the measured null round trip):

1. SparseVI at the reference-canonical gaussian config (N=1000, d=200,
   S=100, opt_itrs=50, M=30) — the exact workload PARITY_RESULTS.md's
   46.4 s reference-CPU baseline was measured on — black-box AND exact
   projector arms.
2. SparseVI at a scaled config (N=100k, n_subsample=1024): per-iteration
   cost vs the canonical config shows whether the inner Adam scan is
   latency- or compute-bound (if latency-bound, 100x the per-step flops
   should cost far less than 100x the time).
3. BatchPSVI at the PARITY_RESULTS scale (N=100k, d=20, S=200, sz=100,
   n_sub=20k, 500 joint Adam steps).

Each arm also prints a flop estimate per inner Adam step and the implied
FLOP/s, locating the measurement against the chip's compute roof — the
"stated bound" VERDICT asks for.

Run: python scripts/bench_svi_tpu.py          (axon TPU; ~4 min incl compiles)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def _null_roundtrip():
    null_op = jax.jit(lambda x: x + 1.0)
    x0 = jnp.float32(0.0)
    jax.device_get(null_op(x0))
    nulls = sorted(_timed(lambda: jax.device_get(null_op(x0)))
                   for _ in range(11))
    return nulls[len(nulls) // 2]


def main():
    import numpy as np
    import bayesian_coresets_tpu as bc
    from bayesian_coresets_tpu.coresets import gaussian_tangent_family
    from bayesian_coresets_tpu.coresets.sparsevi import svi_build
    from bayesian_coresets_tpu.coresets.bpsvi import (bpsvi_build,
                                                      uniform_init_idcs)
    from bayesian_coresets_tpu.models import gaussian

    null_t = _null_roundtrip()
    out = {"relay_null_ms": round(1e3 * null_t, 2)}

    def run_svi(tag, N, d, S, M, n_sub, opt_itrs, blackbox, reps=3):
        x = gaussian.gen_synthetic(jax.random.key(1), N, d)
        mu0, Sig0inv = jnp.zeros(d), jnp.eye(d)
        Siginv, LSigInv = jnp.eye(d), jnp.eye(d)
        fam = gaussian_tangent_family(mu0, Sig0inv, Siginv, LSigInv)
        if blackbox:
            basis = jax.jit(gaussian.posterior_basis)(mu0, Sig0inv, Siginv)

            def sampler(k, n, wts, pts):
                if pts.size == 0:         # projector-construction probe
                    wts, pts = jnp.zeros(1), jnp.zeros((1, d))
                return gaussian.sample_weighted_post_basis(
                    k, basis, jnp.asarray(pts), jnp.asarray(wts), n)

            loglik = lambda pts, th: gaussian.log_likelihood(pts, th, Siginv, 0.0)
            prj = bc.BlackBoxProjector(sampler, S, loglik)
            family = prj.family
        else:
            family = fam
        sched = lambda i: 1.0 / (1.0 + i)
        cap = 1 << int(np.ceil(np.log2(max(M, 8))))
        w0 = jnp.zeros(cap)
        i0 = jnp.full(cap, -1, jnp.int32)

        def one(key):
            return svi_build(x, w0, i0, jnp.int32(0), key, jnp.int32(M),
                             family=family, n_sub_sel=n_sub, n_sub_opt=n_sub,
                             opt_itrs=opt_itrs, step_sched=sched)

        r = one(jax.random.key(2))
        jax.device_get(r[0][0])                       # compile + warm
        # a single build here is ~10-150 ms against a ~30 ms relay null:
        # enqueue B builds per fetch (in-order device queue fences all)
        # so the residual null error scales as 1/B
        B = 8
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            for j in range(B):
                r = one(jax.random.key(3 + B * i + j))
            jax.device_get(r[0][0])
            times.append((time.perf_counter() - t0 - null_t) / B)
        t = sorted(times)[len(times) // 2]
        n_eff = n_sub if n_sub is not None else N
        # flops per inner Adam step: context refit (S,d)@(d,d) sampling
        # matmuls + (n_eff + cap, d)@(d, S) projections (x2 for the 2-matmul
        # ll form), dominated terms only
        refit_flops = 2 * S * d * d * 2
        proj_flops = 2 * (n_eff + cap) * d * S
        step_flops = refit_flops + proj_flops
        steps = M * (1 + opt_itrs)                    # select + opt contexts
        out[tag] = {
            "build_s": round(t, 4),
            "points_per_s": round(M / t, 1),
            "ms_per_build_iter": round(1e3 * t / M, 3),
            "us_per_adam_step": round(1e6 * t / steps, 1),
            "flops_per_adam_step": step_flops,
            "implied_gflops": round(steps * step_flops / t / 1e9, 1),
        }
        return t

    # 1) canonical gaussian config (reference CPU: 46.4 s to M=30)
    REF_CPU_S = 46.4
    t_bb = run_svi("svi_canonical_blackbox", N=1000, d=200, S=100, M=30,
                   n_sub=None, opt_itrs=50, blackbox=True)
    run_svi("svi_canonical_exact", N=1000, d=200, S=100, M=30,
            n_sub=None, opt_itrs=50, blackbox=False)
    out["svi_canonical_blackbox"]["vs_reference_cpu"] = round(REF_CPU_S / t_bb, 1)
    out["svi_canonical_blackbox"]["reference_cpu_s"] = REF_CPU_S

    # 2) scaled config: 100x the rows, subsampled inner steps
    run_svi("svi_scaled_N100k_sub1024", N=100_000, d=200, S=100, M=30,
            n_sub=1024, opt_itrs=50, blackbox=True)

    # 3) BatchPSVI at the PARITY_RESULTS scale
    N, d, S, sz, n_sub, steps = 100_000, 20, 200, 100, 20_000, 500
    x = gaussian.gen_synthetic(jax.random.key(1), N, d)
    mu0, Sig0inv, Siginv = jnp.zeros(d), jnp.eye(d), jnp.eye(d)
    basis = jax.jit(gaussian.posterior_basis)(mu0, Sig0inv, Siginv)

    def sampler(k, n, wts, pts):
        if pts.size == 0:                 # projector-construction probe
            wts, pts = jnp.zeros(1), jnp.zeros((1, d))
        return gaussian.sample_weighted_post_basis(
            k, basis, jnp.asarray(pts), jnp.asarray(wts), n)

    loglik = lambda pts, th: gaussian.log_likelihood(pts, th, Siginv, 0.0)
    gradll = lambda pts, th: gaussian.grad_x_log_likelihood(pts, th, Siginv)
    prj = bc.BlackBoxProjector(sampler, S, loglik, gradll)
    sched = lambda i: 1.0 / (1.0 + i)
    init = uniform_init_idcs(N, sz, jax.random.key(9))

    def one_bp(key):
        return bpsvi_build(x, init, key, family=prj.family, n_sub_opt=n_sub,
                           opt_itrs=steps, step_sched=sched)

    w, p = one_bp(jax.random.key(2))
    jax.device_get(p[0, 0])
    B = 8
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        for j in range(B):
            w, p = one_bp(jax.random.key(3 + B * i + j))
        jax.device_get(p[0, 0])
        times.append((time.perf_counter() - t0 - null_t) / B)
    t = sorted(times)[1]
    # per joint Adam step: (n_sub+sz, d)@(d, S) projections + the
    # (sz, S, d) grad-projection einsum + refit matmuls
    step_flops = 2 * (n_sub + sz) * d * S + 2 * sz * S * d + 2 * S * d * d * 2
    out["bpsvi_N100k_sz100"] = {
        "build_s": round(t, 4),
        "ms_per_joint_adam_step": round(1e3 * t / steps, 3),
        "flops_per_step": step_flops,
        "implied_gflops": round(steps * step_flops / t / 1e9, 1),
    }

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
