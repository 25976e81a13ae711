"""Profile the int8 select matmul across tile geometries (round-2 VERDICT #8).

PARITY_RESULTS' hot-loop table records the N=1M int8 select streaming at
75-91% of the 819 GB/s v5e HBM peak — a band wide enough to hide ~20% of
real headroom.  The open question: is the band GEOMETRY (row-tile
multiple, S lane padding, RHS width — fixable by repadding) or CHIP
variance (run-to-run, document and move on)?

Design that separates the two:
  * every geometry is timed with R in-process repetitions seconds apart,
    so the per-geometry min-max spread IS the chip variance at that
    moment;
  * all geometries run back-to-back in ONE process, so cross-geometry
    differences larger than the within-geometry spread are attributable
    to geometry;
  * a matmul-free calibration kernel (full int8 reduction over the same
    buffer) measures what this chip's HBM delivers TODAY, giving a
    same-session denominator that the 819 GB/s paper number cannot.

Methodology (PARITY_RESULTS "Hot-loop": loops with a forced scalar
fetch): each timed rep scans T select iterations whose direction matrix
varies per step (XLA cannot hoist the V read; V does not fit in VMEM so
each iteration must stream it from HBM), and blocks on a scalar
accumulator.  Bytes counted: the V read only (n*S); the (n,k) int32
score intermediate adds <4% write traffic at k=2 and is the same for
every geometry.

Hot path under test: ops/snnls.py::_select_dots (reference analogue:
bayesiancoresets/snnls/giga.py:20-38, SURVEY.md §3.1).

Usage: python scripts/bench_select_bandwidth.py [--quick]
Writes runs/select_bandwidth.json and prints a markdown table.
"""

import argparse
import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp

HBM_PEAK_GBS = 819.0  # v5e spec sheet

T = 128  # select iterations per timed rep (relay round-trip amortizes)
R = 5    # timed reps per geometry


@partial(jax.jit, static_argnames=("n", "s", "k"))
def _gen_inputs(key, n, s, k):
    # ONE fused program: eager randint over the axon relay materializes a
    # 4x int32 intermediate (30 GiB at n=16M — instant OOM); fused, XLA
    # streams the bit generation straight into the int8 output.
    kv, kq = jax.random.split(key)
    Vq = jax.random.bits(kv, (n, s), dtype=jnp.uint8).astype(jnp.int8)
    qs = jax.random.randint(kq, (T, s, k), -127, 128, dtype=jnp.int8)
    return Vq, qs


def _make_inputs(key, n, s, k):
    Vq, qs = _gen_inputs(key, n, s, k)
    jax.block_until_ready((Vq, qs))
    return Vq, qs


def _select_loop(epilogue):
    """T int8 select matmuls; per-step RHS prevents hoisting the V read."""

    @jax.jit
    def run(Vq, qs):
        def body(acc, q):
            dots = jax.lax.dot_general(
                Vq, q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            if epilogue == "argmax":
                # per-column argmax, summed: consumes EVERY rhs column so
                # XLA cannot narrow dot(A,B)[:,0] to a thinner dot, which
                # would invalidate the k-width comparison
                r = jnp.sum(jnp.argmax(dots, axis=0)).astype(jnp.int32)
            else:  # full-reduce epilogue: no row-selection shortcut possible
                r = jnp.sum(dots, dtype=jnp.int32)
            return acc + r, None

        acc, _ = jax.lax.scan(body, jnp.int32(0), qs)
        return acc

    return run


@jax.jit
def _reduce_loop(Vq, seeds):
    """Matmul-free HBM calibration: T full int8 reductions of V."""

    def body(acc, seed):
        # per-iteration XOR before the reduce: sum(Vq ^ s) has no closed
        # form in sum(Vq), so XLA cannot hoist the V read out of the scan
        # (a plain seed*Vq[0,0] perturbation left sum(Vq) loop-invariant
        # and the "reduction" measured 34 TB/s of hoisted nothing)
        r = jnp.sum(jnp.bitwise_xor(Vq, seed.astype(jnp.int8)),
                    dtype=jnp.int32)
        return acc + r, None

    acc, _ = jax.lax.scan(body, jnp.int32(0), seeds)
    return acc


_NULL_T = 0.0  # measured relay round-trip latency, set in main()


@jax.jit
def _null_op(x):
    return x + 1


def _time_reps(fn, *args):
    # jax.device_get (scalar TRANSFER) is the only completion fence that
    # holds over the axon relay: block_until_ready returns at enqueue time
    # there, which times dispatch only (~60 us) and reports petabyte/s
    # nonsense.  The measured null round-trip is subtracted from each rep.
    jax.device_get(fn(*args))  # compile + warm
    ts = []
    for _ in range(R):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        ts.append(max(time.perf_counter() - t0 - _NULL_T, 1e-9))
    ts.sort()
    return ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="skip the >=4 GB geometries")
    ap.add_argument("--calib-only", action="store_true",
                    help="re-run only the HBM calibration row, merging "
                         "into an existing runs/select_bandwidth.json")
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    # (name, n, S, k, epilogue).  rowpad1024 is the PRODUCTION geometry
    # (make_consts pads rows to 1024, S to 128); the others isolate one
    # departure each.
    geoms = [
        ("rowpad1024_512_k2", 1_000_448, 512, 2, "argmax"),   # production
        ("baseline_1M_512_k2", 1_000_000, 512, 2, "argmax"),  # n % 1024 != 0
        ("ragged_rows_512_k2", 999_999, 512, 2, "argmax"),    # odd n
        ("unpadded_S500_k2", 1_000_000, 500, 2, "argmax"),    # S % 128 != 0
        ("k8_1M_512", 1_000_000, 512, 8, "argmax"),
        ("sum_epilogue_1M_512_k2", 1_000_000, 512, 2, "sum"),
    ]
    if not args.quick:
        geoms += [
            ("large_8M_512_k2", 8_000_000, 512, 2, "argmax"),
            ("large_14M_512_k2", 14_680_064, 512, 2, "argmax"),  # 7 GiB
        ]

    rows = []
    key = jax.random.key(0)
    os.makedirs("runs", exist_ok=True)
    if args.calib_only:
        geoms = []
        if os.path.exists("runs/select_bandwidth.json"):
            with open("runs/select_bandwidth.json") as f:
                rows = [r for r in json.load(f)["rows"]
                        if r["name"] != "calib_reduce_1M_512"]

    # relay round-trip latency: a scalar compute + fetch, nothing else
    global _NULL_T
    x = jax.device_put(jnp.float32(1.0))
    jax.device_get(_null_op(x))
    nulls = []
    for _ in range(11):
        t0 = time.perf_counter()
        jax.device_get(_null_op(x))
        nulls.append(time.perf_counter() - t0)
    nulls.sort()
    _NULL_T = nulls[len(nulls) // 2]
    print(f"# null round-trip: {1e3 * _NULL_T:.2f} ms "
          f"(min {1e3 * nulls[0]:.2f}, max {1e3 * nulls[-1]:.2f})",
          flush=True)

    def _flush():
        out = {
            "device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}",
            "protocol": {
                "iters_per_rep": T, "reps": R,
                "completion_fence": "jax.device_get (scalar transfer)",
                "null_roundtrip_ms_subtracted": round(1e3 * _NULL_T, 2),
                "bytes_counted": "V read only (n*S int8)",
                "note": ("within-geometry min-max spread = same-process "
                         "chip variance; cross-geometry deltas beyond that "
                         "spread = geometry effects"),
            },
            "hbm_peak_gbps_spec": HBM_PEAK_GBS,
            "rows": rows,
        }
        with open("runs/select_bandwidth.json", "w") as f:
            json.dump(out, f, indent=1)

    # HBM calibration on the baseline buffer
    Vq, qs = _make_inputs(key, 1_000_000, 512, 2)
    seeds = jnp.arange(T, dtype=jnp.int32)
    ts = _time_reps(_reduce_loop, Vq, seeds)
    gb = 1_000_000 * 512 * T / 1e9
    rows.append({
        "name": "calib_reduce_1M_512", "n": 1_000_000, "S": 512, "k": 0,
        "epilogue": "reduce",
        "gbps_med": round(gb / ts[len(ts) // 2], 1),
        "gbps_min": round(gb / ts[-1], 1), "gbps_max": round(gb / ts[0], 1),
    })
    print(f"calib_reduce_1M_512: {rows[-1]}", flush=True)
    Vq.delete(); qs.delete()
    _flush()

    for name, n, s, k, epi in geoms:
        Vq, qs = _make_inputs(key, n, s, k)
        ts = _time_reps(_select_loop(epi), Vq, qs)
        gb = n * s * T / 1e9
        med = gb / ts[len(ts) // 2]
        rows.append({
            "name": name, "n": n, "S": s, "k": k, "epilogue": epi,
            "gbps_med": round(med, 1),
            "gbps_min": round(gb / ts[-1], 1),
            "gbps_max": round(gb / ts[0], 1),
            "pct_peak_med": round(100 * med / HBM_PEAK_GBS, 1),
        })
        Vq.delete(); qs.delete()
        print(f"{name}: {rows[-1]}", flush=True)
        _flush()

    print("\n| geometry | n | S | k | GB/s med (min-max) | % peak |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        pk = r.get("pct_peak_med", round(100 * r["gbps_med"] / HBM_PEAK_GBS, 1))
        print(f"| {r['name']} | {r['n']} | {r['S']} | {r['k']} | "
              f"{r['gbps_med']} ({r['gbps_min']}-{r['gbps_max']}) | {pk}% |")


if __name__ == "__main__":
    main()
