"""Probe: can an int4 selection copy halve select-matmul HBM traffic?

The int8 select streams at ~100% of this chip's achievable HBM rate
(runs/select_bandwidth.json), so the only remaining headroom is fewer
bytes.  This probe times the (n, S) @ (S, 2) score matmul with
  (a) int8 Vsel (current production path),
  (b) int4 Vsel via native XLA int4 dot (if the TPU backend accepts it),
  (c) int4 packed two-per-int8, unpacked in-kernel before an int8 dot
      (tests whether XLA keeps the unpack fused or materializes it).
Methodology matches scripts/bench_select_bandwidth.py: T-iteration scan
with per-step varying directions (V cannot be hoisted), scalar fetch
fence, null round trip subtracted.

Usage: python scripts/probe_int4_select.py
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

N, S, T, REPS = 1 << 20, 512, 32, 3


def timed_fetch(fn, *args):
    t0 = time.perf_counter()
    out = jax.device_get(fn(*args))
    return time.perf_counter() - t0, out


def main():
    print("devices:", jax.devices())

    @jax.jit
    def make_int8(key):
        v = jax.random.normal(key, (N, S), jnp.float32)
        vn = v / jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))
        return jnp.clip(jnp.round(vn * 127.0), -127, 127).astype(jnp.int8)

    @jax.jit
    def make_int4(key):
        v = jax.random.normal(key, (N, S), jnp.float32)
        vn = v / jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))
        # normalized entries ~ N(0, 1/S): scale by 7/(4/sqrt(S)) to use the range
        scale = 7.0 * jnp.sqrt(jnp.float32(S)) / 4.0
        return jnp.clip(jnp.round(vn * scale), -7, 7).astype(jnp.int4)

    @jax.jit
    def make_packed(key):
        v = jax.random.normal(key, (N, S), jnp.float32)
        vn = v / jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))
        scale = 7.0 * jnp.sqrt(jnp.float32(S)) / 4.0
        q = jnp.clip(jnp.round(vn * scale), -7, 7).astype(jnp.int8)  # (N,S)
        lo = q[:, 0::2] & 0x0F
        hi = q[:, 1::2] & 0x0F
        return (lo | (hi << 4)).astype(jnp.int8)  # (N, S/2)

    def scan_int8(V):
        def body(acc, k):
            d = jax.random.randint(k, (S, 2), -127, 127, jnp.int8)
            dots = lax.dot_general(V, d, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
            return acc + dots[0, 0] + dots[N - 1, 1], None

        acc, _ = lax.scan(body, jnp.int32(0), jax.random.split(jax.random.key(9), T))
        return acc

    def scan_int4(V):
        def body(acc, k):
            d = jax.random.randint(k, (S, 2), -7, 7, jnp.int8).astype(jnp.int4)
            dots = lax.dot_general(V, d, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
            return acc + dots[0, 0] + dots[N - 1, 1], None

        acc, _ = lax.scan(body, jnp.int32(0), jax.random.split(jax.random.key(9), T))
        return acc

    def scan_packed(P):
        def body(acc, k):
            d = jax.random.randint(k, (S, 2), -7, 7, jnp.int8)
            lo = ((P << 4).astype(jnp.int8) >> 4).astype(jnp.int8)   # sign-extend
            hi = (P >> 4).astype(jnp.int8)
            dots = (lax.dot_general(lo, d[0::2], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                    + lax.dot_general(hi, d[1::2], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32))
            return acc + dots[0, 0] + dots[N - 1, 1], None

        acc, _ = lax.scan(body, jnp.int32(0), jax.random.split(jax.random.key(9), T))
        return acc

    null = jax.jit(lambda x: x + 1)
    jax.device_get(null(jnp.int32(0)))
    nulls = sorted(timed_fetch(null, jnp.int32(i))[0] for i in range(7))
    null_t = nulls[len(nulls) // 2]
    print(f"null rtt: {null_t*1e3:.1f} ms")

    for name, make, scan, bytes_per_it in [
        ("int8", make_int8, scan_int8, N * S),
        ("int4-native", make_int4, scan_int4, N * S // 2),
        ("int4-packed", make_packed, scan_packed, N * S // 2),
    ]:
        try:
            V = make(jax.random.key(0))
            V.block_until_ready()
            f = jax.jit(scan)
            t, _ = timed_fetch(f, V)  # compile + run
            ts = sorted(timed_fetch(f, V)[0] - null_t for _ in range(REPS))
            per_it = ts[len(ts) // 2] / T
            gbs = bytes_per_it / per_it / 1e9
            # "useful-bytes": algorithmic bytes (packed size) / time — NOT
            # hardware throughput (XLA materializes unpacked intermediates
            # for the packed routes, ~3x this traffic); ms/iter is primary
            print(f"{name:12s}: {per_it*1e3:7.3f} ms/iter  "
                  f"{gbs:7.1f} useful-bytes GB/s ({', '.join(f'{x/T*1e3:.3f}' for x in ts)})")
        except Exception as e:
            print(f"{name:12s}: FAILED {type(e).__name__}: {str(e)[:300]}")
        finally:
            V = None


if __name__ == "__main__":
    main()
