"""Multi-device scaling-efficiency harness.

Measures (a) sharded GIGA coreset construction points/s and (b) sharded
weighted-NUTS samples/s across mesh sizes 1, 2, 4, ... up to the available
device count, reporting parallel efficiency vs the 1-device run — the
BASELINE.md target is >=80% efficiency to N>=2 hosts on a v5e pod slice.

On a single-chip or virtual-CPU environment the absolute efficiencies are
not meaningful (shared memory bandwidth / one physical socket); the harness
is the measurement protocol for real multi-chip slices.

Run: python scripts/bench_scaling.py [--devices 8 --virtual]
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="virtual CPU device count (0 = use real devices)")
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--proj_dim", type=int, default=256)
    ap.add_argument("--m", type=int, default=200)
    ap.add_argument("--chains", type=int, default=8)
    ap.add_argument("--samples", type=int, default=200)
    args = ap.parse_args()

    if args.devices:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count={args.devices}").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bayesian_coresets_tpu.coresets.projector import center_lls
    from bayesian_coresets_tpu.models import logistic
    from bayesian_coresets_tpu.ops import snnls
    from bayesian_coresets_tpu.parallel import build_sharded, make_mesh, run_nuts_sharded

    ndev = len(jax.devices())
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= ndev]

    Z = logistic.gen_synthetic(jax.random.key(0), args.n, 10)
    ths = 0.1 * jax.random.normal(jax.random.key(1), (args.proj_dim, 10), jnp.float32)
    vecs = center_lls(logistic.log_likelihood(Z, ths))
    A = vecs.T
    b = jnp.sum(vecs, axis=0)

    results = {"build": {}, "nuts": {}}
    for s in sizes:
        mesh = make_mesh({"data": s}, devices=jax.devices()[:s])
        st = build_sharded(A, b, args.m, mesh)        # compile + run
        jax.block_until_ready(st.w)
        t0 = time.perf_counter()
        st = build_sharded(A, b, args.m, mesh)
        jax.block_until_ready(st.w)
        dt = time.perf_counter() - t0
        results["build"][s] = args.m / dt

    w = st.w
    logd = lambda th: logistic.log_joint(Z, th[None, :], jnp.ones(args.n))[0]
    for s in sizes:
        mesh = make_mesh({"chains": s}, devices=jax.devices()[:s])
        chains = args.chains * s
        init = jnp.zeros((chains, 10))
        r = run_nuts_sharded(logd, init, jax.random.key(2), mesh,
                             num_warmup=50, num_samples=args.samples)
        jax.block_until_ready(r.samples)
        t0 = time.perf_counter()
        r = run_nuts_sharded(logd, init, jax.random.key(3), mesh,
                             num_warmup=50, num_samples=args.samples)
        jax.block_until_ready(r.samples)
        dt = time.perf_counter() - t0
        results["nuts"][s] = chains * args.samples / dt

    out = {}
    for kind in ("build", "nuts"):
        base = results[kind][sizes[0]]
        out[kind] = {
            str(s): {"throughput": round(v, 1),
                     "efficiency": round(v / (base * s / sizes[0]), 3)}
            for s, v in results[kind].items()
        }
    print(json.dumps({"devices": ndev, "unit": {"build": "points/s",
                                                "nuts": "samples/s"}, **out},
                     indent=2))


if __name__ == "__main__":
    main()
