"""Multi-device scaling harness: weak-scaling measurement + ICI cost model.

Two parts, both written into one self-interpreting JSON artifact:

1. **Weak-scaling measurement** over mesh sizes 1, 2, 4, ...: per-device
   work is held CONSTANT (build: dataset rows per device; NUTS: chains per
   device), so ideal scaling keeps build wall time flat and grows NUTS
   throughput linearly.  On the virtual CPU mesh the hardware ceiling is
   itself min(host_cores, devices)/devices — the artifact records that
   ceiling and the efficiency relative to it, so the numbers cannot be
   misread as a hardware-scaling failure (this machine has 2 cores serving
   8 virtual devices: a 'raw efficiency' of 0.25 at 8 devices IS the
   ceiling).

2. **ICI cost model** for a real v5e pod slice: per-iteration collective
   bytes are read from the COMPILED HLO of the sharded build (utils/hlo.py;
   the same accounting tests/test_sharding_hlo.py asserts is O(S) and
   n-independent), per-iteration compute from the select-matmul HBM traffic
   at the measured fraction of peak (PARITY_RESULTS.md hot-loop table).
   Ring all-reduce cost: 2B(k-1)/(k*link_bw) + 2(k-1)*hop_latency per
   collective phase.  The predicted weak-scaling efficiency at v5e-8 is the
   compute fraction t_comp / (t_comp + t_comm).

Run: python scripts/bench_scaling.py --devices 8 --out SCALING_r03.json
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
    ap.add_argument("--n_per_device", type=int, default=50_000,
                    help="dataset rows PER DEVICE (weak scaling)")
    ap.add_argument("--proj_dim", type=int, default=256)
    ap.add_argument("--m", type=int, default=200)
    ap.add_argument("--chains_per_device", type=int, default=4)
    ap.add_argument("--samples", type=int, default=200)
    ap.add_argument("--out", type=str, default="")
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
    from bayesian_coresets_tpu.parallel import (build_sharded, make_mesh,
                                                run_nuts_sharded)
    from bayesian_coresets_tpu.parallel.coreset import shard_consts, shard_state
    from bayesian_coresets_tpu.utils import config
    from bayesian_coresets_tpu.utils.hlo import collective_stats

    ndev = len(jax.devices())
    host_cores = os.cpu_count() or 1
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= ndev]
    D = 10

    results = {"build": {}, "nuts": {}}
    for s in sizes:
        n = args.n_per_device * s                     # weak scaling: n grows
        Z = logistic.gen_synthetic(jax.random.key(0), n, D)
        ths = 0.1 * jax.random.normal(jax.random.key(1), (args.proj_dim, D),
                                      jnp.float32)
        vecs = center_lls(logistic.log_likelihood(Z, ths))
        A, b = vecs.T, jnp.sum(vecs, axis=0)
        mesh = make_mesh({"data": s}, devices=jax.devices()[:s])
        st = build_sharded(A, b, args.m, mesh)        # compile + warm
        jax.block_until_ready(st.w)
        t0 = time.perf_counter()
        st = build_sharded(A, b, args.m, mesh)
        jax.block_until_ready(st.w)
        results["build"][s] = args.m / (time.perf_counter() - t0)

    n1 = args.n_per_device
    Z1 = logistic.gen_synthetic(jax.random.key(0), n1, D)
    logd = lambda th: logistic.log_joint(Z1, th[None, :], jnp.ones(n1))[0]
    for s in sizes:
        mesh = make_mesh({"chains": s}, devices=jax.devices()[:s])
        chains = args.chains_per_device * s           # weak scaling: chains grow
        init = jnp.zeros((chains, D))
        r = run_nuts_sharded(logd, init, jax.random.key(2), mesh,
                             num_warmup=50, num_samples=args.samples)
        jax.block_until_ready(r.samples)
        t0 = time.perf_counter()
        r = run_nuts_sharded(logd, init, jax.random.key(3), mesh,
                             num_warmup=50, num_samples=args.samples)
        jax.block_until_ready(r.samples)
        results["nuts"][s] = chains * args.samples / (time.perf_counter() - t0)

    # ---- compiled-work accounting (host-independent) -----------------------
    # Per-device FLOPs / bytes of the COMPILED sharded build at each mesh
    # size, with per-device rows held constant: the partitioning-overhead
    # measure that wall time on an oversubscribed virtual-CPU host cannot
    # give (every psum is a thread rendezvous; with 8 device threads on
    # 2 cores the scheduler, not the program, sets the wall).  Ideal = 1.0;
    # round 3's one-hot formulation measured ~1.5x here.
    from bayesian_coresets_tpu.parallel.coreset import _build_fn

    def _per_device_cost(s):
        n = args.n_per_device * s
        rngc = np.random.default_rng(0)
        Ac = rngc.normal(size=(args.proj_dim, n)).astype(np.float32)
        bc = Ac.sum(axis=1)
        meshc = make_mesh({"data": s}, devices=jax.devices()[:s])
        cc = shard_consts(snnls.make_consts(jnp.asarray(Ac), jnp.asarray(bc)),
                          meshc)
        sc = shard_state(snnls.init_state(cc), meshc)
        fnc = _build_fn(meshc, "giga", shard_proj=False, matvec_k=1024)
        ca = fnc.lower(cc, sc, jnp.int32(args.m),
                       jnp.float32(config.TOL)).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))

    def _per_device_nuts_cost(s):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from bayesian_coresets_tpu.mcmc import run_nuts
        meshc = make_mesh({"chains": s}, devices=jax.devices()[:s])
        chains = args.chains_per_device * s
        init = jax.device_put(jnp.zeros((chains, D)),
                              NamedSharding(meshc, P("chains", None)))
        fnc = jax.jit(lambda ip, k: run_nuts(logd, ip, k, num_warmup=50,
                                             num_samples=args.samples))
        ca = fnc.lower(init, jax.random.key(2)).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))

    def _per_device_stream_cost(s):
        """One SPMD streamed-construction step (HilbertCoreset mesh= +
        stream_chunk_size=: every device projects + quantizes its own
        rows); per-device work must stay constant as the mesh grows.
        Shared lowering helper: the HLO test analyzes the same program."""
        from bayesian_coresets_tpu.parallel.streamed import (
            lower_stream_step_for_analysis)

        meshc = make_mesh({"data": s}, devices=jax.devices()[:s])
        ca = lower_stream_step_for_analysis(
            meshc, csize=1024, S=args.proj_dim, d=D).cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))

    # SparseVI / BatchPSVI sharded builds run GSPMD-auto-partitioned (not
    # shard_map) — exactly the regime where r3's 1.5x inflation hid; the
    # HLO tests cap collective BYTES, this caps per-device WORK
    # (tests/test_sharding_hlo.py::test_svi_bpsvi_sharded_work_is_flat is
    # the regression guard for the same property).
    from jax.sharding import NamedSharding, PartitionSpec as P
    import bayesian_coresets_tpu  # noqa: F401 (register tangent families)
    from bayesian_coresets_tpu.coresets import gaussian_tangent_family
    from bayesian_coresets_tpu.coresets.sparsevi import svi_build
    from bayesian_coresets_tpu.coresets.bpsvi import (bpsvi_build,
                                                      uniform_init_idcs)
    from bayesian_coresets_tpu.models import gaussian

    SVI_D, SVI_NPD, SVI_CAP, SVI_OPT_ITRS, SVI_ITRS = 16, 8192, 16, 10, 4
    fam = gaussian_tangent_family(jnp.zeros(SVI_D), jnp.eye(SVI_D),
                                  jnp.eye(SVI_D), jnp.eye(SVI_D))
    sched = lambda i: 1.0 / (1.0 + i)

    def _svi_family_cost(kind, n_sub):
        def costf(s):
            meshc = make_mesh({"data": s}, devices=jax.devices()[:s])
            x = gaussian.gen_synthetic(jax.random.key(1), SVI_NPD * s, SVI_D)
            xs = jax.device_put(x, NamedSharding(meshc, P("data", None)))
            if kind == "svi":
                low = svi_build.lower(
                    xs, jnp.zeros(SVI_CAP), jnp.full(SVI_CAP, -1, jnp.int32),
                    jnp.int32(0), jax.random.key(0), jnp.int32(SVI_ITRS),
                    family=fam, n_sub_sel=n_sub, n_sub_opt=n_sub,
                    opt_itrs=SVI_OPT_ITRS, step_sched=sched)
            else:
                init = uniform_init_idcs(SVI_NPD * s, SVI_CAP,
                                         jax.random.key(2))
                low = bpsvi_build.lower(
                    xs, init, jax.random.key(0), family=fam,
                    n_sub_opt=n_sub, opt_itrs=SVI_OPT_ITRS, step_sched=sched)
            ca = low.compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            return (float(ca.get("flops", 0.0)),
                    float(ca.get("bytes accessed", 0.0)))
        return costf

    def _refit_cost():
        """The replicated part of every svi/bpsvi gradient step: context
        refit (closed-form weighted posterior here) + coreset-slot
        projection — O(cap*d^2 + d^3), independent of n, run identically
        on every device."""
        def f(key, w, pts):
            ctx = fam.make_ctx(key, w, pts)
            return fam.project(ctx, pts)
        ca = jax.jit(f).lower(jax.random.key(0), jnp.zeros(SVI_CAP),
                              jnp.zeros((SVI_CAP, SVI_D))).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return (float(ca.get("flops", 0.0)),
                float(ca.get("bytes accessed", 0.0)))

    import numpy as np
    compiled_work = {}
    for kind, costf in (("build", _per_device_cost),
                        ("nuts", _per_device_nuts_cost),
                        ("stream_projection_step", _per_device_stream_cost),
                        ("svi_full", _svi_family_cost("svi", None)),
                        ("svi_subsampled", _svi_family_cost("svi", 256)),
                        ("bpsvi_full", _svi_family_cost("bpsvi", None)),
                        ("bpsvi_subsampled", _svi_family_cost("bpsvi", 256))):
        f1, by1 = costf(1)
        compiled_work[kind] = {}
        for s in sizes:
            fs, bys = costf(s) if s > 1 else (f1, by1)
            compiled_work[kind][str(s)] = {
                "flops_per_device": fs,
                "bytes_per_device": bys,
                "work_ratio_vs_1dev": round(max(fs / f1, bys / by1), 4),
            }

    # replicated-refit separation: contexts per build iteration = 1 select
    # refit + opt_itrs optimizer refits (svi) resp. opt_itrs (bpsvi); its
    # share of per-device work shrinks as 1/n_per_device
    refit_f, refit_b = _refit_cost()
    svi_total_1dev = compiled_work["svi_full"]["1"]["flops_per_device"]
    ctxs = SVI_ITRS * (1 + SVI_OPT_ITRS)
    refit_total = refit_f * ctxs
    refit_share = refit_total / max(svi_total_1dev, 1.0)
    scalable = max(svi_total_1dev - refit_total, 1.0)      # ~linear in n
    n_1pct = SVI_NPD * (99.0 * refit_total) / scalable
    compiled_work["svi_refit_separation"] = {
        "refit_flops_per_context": refit_f,
        "refit_bytes_per_context": refit_b,
        "contexts_per_svi_build_iter": 1 + SVI_OPT_ITRS,
        "refit_share_of_per_device_flops_at_n_per_device": {
            str(SVI_NPD): round(refit_share, 5)},
        "n_per_device_where_refit_below_1pct": int(n_1pct),
        "note": ("the context refit (closed-form weighted posterior + "
                 "coreset-slot projection) is REPLICATED on every device; "
                 "it is O(cap*d^2+d^3) per rebuild, so its per-device share "
                 "falls as 1/n_per_device — above "
                 "n_per_device_where_refit_below_1pct rows/device it is "
                 "noise; black-box families pay a Laplace Newton refit "
                 "instead (larger constant, same n-independence)"),
    }

    # weak-scaling efficiencies: build time should stay FLAT (points/s
    # constant), nuts throughput should grow linearly with devices
    measured = {}
    for kind, ideal in (("build", lambda base, s: base),
                        ("nuts", lambda base, s: base * s)):
        base = results[kind][sizes[0]]
        measured[kind] = {}
        for s, v in results[kind].items():
            ceiling = min(host_cores, s) / s if args.devices else 1.0
            eff = v / ideal(base, s)
            # total work per second relative to 1 device: on a FIXED-silicon
            # virtual mesh (XLA CPU shares one thread pool across virtual
            # devices, so the 1-device baseline already uses every core) the
            # ideal is 1.0 — the shortfall is pure partitioning overhead
            work_ratio = (v * s / base) if kind == "build" else (v / (base * s)) * s
            measured[kind][str(s)] = {
                "throughput": round(v, 1),
                "efficiency": round(eff, 3),
                "virtual_mesh_ceiling": round(ceiling, 3),
                "efficiency_vs_ceiling": round(min(eff / ceiling, 9.99), 3),
                "total_work_ratio_vs_1dev": round(work_ratio, 3),
            }

    # ---- ICI cost model (v5e pod slice prediction) -------------------------
    # collective bytes per build iteration, read from the compiled HLO at the
    # flagship single-chip workload shape (PARITY_RESULTS hot-loop: N=1M
    # rows/device, S=512, int8 select)
    K_MODEL = 8                      # modeled slice size (v5e-8)
    N_DEV, S_MODEL = 1_000_000, 512
    import numpy as np
    rng = np.random.default_rng(0)
    Am = rng.normal(size=(64, 4096)).astype(np.float32)   # small proxy shape
    bm = Am.sum(axis=1)
    mesh = make_mesh({"data": min(8, ndev)},
                     devices=jax.devices()[:min(8, ndev)])
    consts = shard_consts(snnls.make_consts(jnp.asarray(Am), jnp.asarray(bm)),
                          mesh)
    state = shard_state(snnls.init_state(consts, max_active=256), mesh)
    from bayesian_coresets_tpu.parallel.coreset import _build_fn
    fn = _build_fn(mesh, "giga", shard_proj=False, matvec_k=1024)
    stats = collective_stats(
        fn.lower(consts, state, jnp.int32(50),
                 jnp.float32(config.TOL)).compile().as_text())
    # scale S-dependent collective payloads from the proxy S=64 to S_MODEL;
    # the HLO-asserted invariant is that nothing scales with n
    coll_bytes = sum(by * (S_MODEL / 64 if by >= 64 * 4 else 1.0)
                     for _, by, _ in stats)
    n_phases = len(stats)            # each collective = one latency-bound phase

    HBM_GBPS = 819.0                 # v5e HBM bandwidth
    ACHIEVED = 0.75                  # low end of the measured 75-91% of peak
    ICI_LINK_GBPS = 45.0             # v5e one-way per-link ICI bandwidth
    HOP_LAT_US = 1.0                 # per-hop latency, conservative
    t_comp_us = (N_DEV * S_MODEL * 1) / (HBM_GBPS * ACHIEVED * 1e3)  # int8 read
    ring = 2 * (K_MODEL - 1)
    t_comm_us = (n_phases * ring * HOP_LAT_US
                 + (2 * coll_bytes * (K_MODEL - 1) / K_MODEL)
                 / (ICI_LINK_GBPS * 1e3))
    predicted_eff = t_comp_us / (t_comp_us + t_comm_us)

    artifact = {
        "protocol": {
            "mode": "weak scaling: per-device work constant "
                    "(build: n_per_device rows; nuts: chains_per_device "
                    "chains); ideal = flat build time, linear nuts throughput",
            "n_per_device": args.n_per_device,
            "proj_dim": args.proj_dim,
            "build_iters": args.m,
            "chains_per_device": args.chains_per_device,
            "nuts_samples": args.samples,
        },
        "environment": {
            "devices": ndev,
            "virtual_cpu_mesh": bool(args.devices),
            "host_cores": host_cores,
            "caveat": (
                "virtual mesh: all devices share ONE host's cores and memory "
                "bandwidth (XLA CPU runs every virtual device on one shared "
                "thread pool, so even the 1-device baseline saturates the "
                "host).  The hardware ceiling on weak-scaling efficiency is "
                f"therefore ~1/devices here (host_cores={host_cores}); "
                "wall-clock total_work_ratio_vs_1dev ALSO absorbs the "
                "thread-rendezvous cost of every collective (8 device "
                "threads on 2 cores), so the partitioning-overhead measure "
                "is compiled_work (per-device FLOPs/bytes of the compiled "
                "program, ideal 1.0).  Absolute efficiency on this mesh "
                "says NOTHING about pod-slice scaling — the hardware "
                "prediction is cost_model."
                if args.devices else "real devices"),
        },
        "unit": {"build": "points/s", "nuts": "samples/s"},
        "measured": measured,
        "compiled_work": {
            "what": "per-device FLOPs / bytes-accessed of the COMPILED "
                    "sharded programs (weak scaling: rows/device resp. "
                    "chains/device constant), from XLA cost_analysis — "
                    "host-scheduling-independent; ideal work_ratio_vs_1dev "
                    "= 1.0 (r3's one-hot build formulation measured ~1.5x; "
                    "NUTS while-loop bodies are counted once, which is the "
                    "right per-device-work comparison for identical "
                    "trip-count programs; stream_projection_step = one SPMD "
                    "streamed-construction step, every device projecting + "
                    "quantizing its own rows — flat per-device work means "
                    "the beyond-HBM capacity ceiling AND the projection "
                    "phase both scale with the device count; "
                    "svi_*/bpsvi_* = the GSPMD-auto-partitioned "
                    "SparseVI/BatchPSVI builds over row-sharded data, full "
                    "and subsampled, with the replicated context-refit "
                    "work quantified in svi_refit_separation)",
            "per_size": compiled_work,
        },
        "cost_model": {
            "target": "v5e-8 weak-scaling efficiency, flagship build "
                      "(N=1e6 rows/device, S=512, int8 select)",
            "collective_bytes_per_iteration": int(coll_bytes),
            "collective_phases_per_iteration": n_phases,
            "collective_source": "compiled HLO of the sharded build "
                                 "(utils/hlo.py; n-independence asserted by "
                                 "tests/test_sharding_hlo.py)",
            "assumptions": {
                "hbm_gbps": HBM_GBPS, "achieved_fraction": ACHIEVED,
                "ici_link_gbps_oneway": ICI_LINK_GBPS,
                "hop_latency_us": HOP_LAT_US,
                "ring_allreduce": "2B(k-1)/(k*bw) + 2(k-1)*lat per phase",
            },
            "t_compute_us_per_iteration": round(t_comp_us, 1),
            "t_comm_us_per_iteration": round(t_comm_us, 1),
            "predicted_efficiency_v5e8": round(predicted_eff, 3),
            "meets_80pct_target": bool(predicted_eff >= 0.8),
        },
    }
    out = json.dumps(artifact, indent=2)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
