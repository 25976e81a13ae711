"""Attribute the N=1M beyond-cache build gap (VERDICT r4 item 2).

Times the bench.py N=1M arm (f32 V + int8 selection copy, GIGA M=500)
before/after the round-5 hot-loop changes (support-gather refresh,
scale-carried single-index weight commit), against the select-matmul
floor, with the relay-aware fence methodology.

Run on the axon TPU: python scripts/probe_n1m_build.py [--n 1000000]
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--m", type=int, default=500)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--builds_per_rep", type=int, default=2)
    ap.add_argument("--slots", type=int, default=1024)
    args = ap.parse_args()

    from bayesian_coresets_tpu.coresets.projector import center_lls
    from bayesian_coresets_tpu.models import logistic
    from bayesian_coresets_tpu.ops import snnls

    N, D, S, M = args.n, 10, 500, args.m

    null_op = jax.jit(lambda x: x + 1.0)
    jax.device_get(null_op(jnp.float32(0.0)))
    nulls = sorted(_timed(lambda: jax.device_get(null_op(jnp.float32(0.0))))
                   for _ in range(11))
    null_t = nulls[len(nulls) // 2]

    Z = logistic.gen_synthetic(jax.random.key(3), N, D)

    @jax.jit
    def make_consts(z, key):
        ths = 0.1 * jax.random.normal(key, (S, D), jnp.float32)
        vecs = center_lls(logistic.log_likelihood(z, ths))
        return snnls.make_consts(vecs.T, jnp.sum(vecs, axis=0),
                                 select_dtype=jnp.int8)

    consts = make_consts(Z, jax.random.key(4))
    jax.device_get(consts.bnorm)

    def build(key, max_active):
        state = snnls.init_state(consts, key, max_active=max_active)
        return snnls.build(consts, state, M, 1e-6, method="giga",
                           matvec_k=max(max_active, 1024))

    out = {"n": N, "m": M, "relay_null_ms": round(1e3 * null_t, 2)}
    for tag, ma in (("slots_%d" % args.slots, args.slots), ("no_slots", 0)):
        st = build(jax.random.key(5), ma)
        jax.device_get(st.w[0])                       # compile + warm
        times = []
        for i in range(args.reps):
            t0 = time.perf_counter()
            for j in range(args.builds_per_rep):
                st = build(jax.random.key(10 + i * 8 + j), ma)
            jax.device_get(st.w[0])
            times.append(max(time.perf_counter() - t0 - null_t, 1e-9)
                         / args.builds_per_rep)
        t = sorted(times)[len(times) // 2]
        np_rows, sp = -(-N // 1024) * 1024, -(-S // 128) * 128
        out[tag] = {
            "ms_per_iter": round(1e3 * t / M, 4),
            "points_per_s": round(M / t, 1),
            "implied_select_gbps": round(M * np_rows * sp / 1e9 / t, 1),
        }
        print(json.dumps({tag: out[tag]}))

    # select-matmul floor: the same int8 score matmul + argmax in a bare
    # fori_loop whose dirs depend on the carry (no hoisting possible)
    Vsel = consts.Vsel
    npad, Spad = Vsel.shape

    @jax.jit
    def floor_loop(v, T):
        def body(i, carry):
            fprev, acc = carry
            d = jnp.zeros((Spad, 2), jnp.float32)
            d = d.at[(fprev + i) % Spad, 0].set(1.0).at[i % Spad, 1].set(0.5)
            q = jnp.clip(jnp.round(d * 127.0), -127, 127).astype(jnp.int8)
            dots = jax.lax.dot_general(v, q, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)
            sc = dots[:, 0].astype(jnp.float32) - dots[:, 1]
            f = jnp.argmax(sc).astype(jnp.int32)
            return f, acc + sc[f]
        return jax.lax.fori_loop(0, T, body, (jnp.int32(0), jnp.float32(0)))[1]

    T = 128
    jax.device_get(floor_loop(Vsel, 8))
    times = []
    for _ in range(args.reps):
        times.append(_timed(lambda: jax.device_get(floor_loop(Vsel, T))) - null_t)
    tf = sorted(times)[len(times) // 2] / T
    out["select_floor"] = {
        "ms_per_iter": round(1e3 * tf, 4),
        "implied_select_gbps": round(npad * Spad / 1e9 / tf, 1),
    }
    print(json.dumps({"select_floor": out["select_floor"]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
