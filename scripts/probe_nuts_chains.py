"""Probe: weighted-NUTS samples/s vs chain count on the real chip.

Each chain's state is tiny (d=10, coreset of a few hundred rows), so the
chip batches thousands of vmapped chains at near-constant wall time.
This probe times the bench workload at several chain counts (args, default
128 256 512 1024) to pick the bench headline setting.

MEASURED (v5e, 2026-08-20): 128ch 1 640, 256ch 3 663, 512ch 4 579,
1024ch 11 447, 2048ch 13 215, 4096ch 14 445 samples/s (min-ESS/s scales
alongside; max split-R-hat ~1.01 throughout).  1024 is the knee: the chip
is latency-bound below ~1k chains, and past the knee wall time grows
nearly linearly for <30% more throughput.

Run ON the axon TPU (no forced CPU).  Relay-aware timing: fence with
device_get, subtract the measured null round trip.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N, D, S, M = 100_000, 10, 500, 500
DRAWS = 150


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp

    from bayesian_coresets_tpu import mcmc as MC
    from bayesian_coresets_tpu.coresets.projector import center_lls
    from bayesian_coresets_tpu.models import logistic
    from bayesian_coresets_tpu.mcmc import weighted
    from bayesian_coresets_tpu.ops import snnls

    Z = logistic.gen_synthetic(jax.random.key(0), N, D)

    @jax.jit
    def build(z, key):
        ths = 0.1 * jax.random.normal(key, (S, D), jnp.float32)
        vecs = center_lls(logistic.log_likelihood(z, ths))
        consts = snnls.make_consts(vecs.T, jnp.sum(vecs, axis=0),
                                   select_dtype=jnp.int8)
        state = snnls.init_state(consts)
        state = snnls.build(consts, state, M, 1e-6, method="giga")
        return state.w

    w = build(Z, jax.random.key(2))
    w_host = np.asarray(jax.device_get(w))
    act = np.flatnonzero(w_host > 0)
    zc = jnp.asarray(np.asarray(Z)[act])
    wc = jnp.asarray(w_host[act])
    print(f"coreset size {act.size}", flush=True)

    null_op = jax.jit(lambda x: x + 1.0)
    jax.device_get(null_op(jnp.float32(0)))
    nulls = sorted(_timed(lambda: jax.device_get(null_op(jnp.float32(0.0))))
                   for _ in range(9))
    null_t = nulls[len(nulls) // 2]
    print(f"null {1e3*null_t:.1f} ms", flush=True)

    counts = [int(c) for c in sys.argv[1:]] or [128, 256, 512, 1024]
    for chains in counts:
        def run_nuts(key, c=chains):
            return weighted.run(logistic, zc, wc, DRAWS, key,
                                num_chains=c, target_accept=0.8,
                                num_warmup=DRAWS)

        _, _, res = run_nuts(jax.random.key(5))       # compile + warm
        jax.device_get(res.samples[0, 0, 0])
        ts = []
        for rep in range(3):
            t0 = time.perf_counter()
            _, _, res = run_nuts(jax.random.key(6 + rep))
            jax.device_get(res.samples[0, 0, 0])
            ts.append(time.perf_counter() - t0 - null_t)
        t = sorted(ts)[1]
        sps = chains * DRAWS / t
        ess = float(np.min(np.asarray(MC.ess(res.samples))))
        rhat = float(np.max(np.asarray(MC.split_rhat(res.samples))))
        print(json.dumps({"chains": chains, "t_s": round(t, 3),
                          "samples_per_s": round(sps, 1),
                          "min_ess_per_s": round(ess / t, 1),
                          "max_split_rhat": round(rhat, 4)}), flush=True)


if __name__ == "__main__":
    main()
