#!/usr/bin/env python
"""Build-sort spike (VERDICT r4 #10): is a custom Pallas radix sort worth
building for the u64 / extended-Morton key widths?  Measure the XLA
variadic sort at 1M for the three key shapes the build uses:

  u32 key + 1 payload          (DefaultMorton 32-bit — the default build)
  (hi, lo) u32 keys + payload  (u64 Morton / ExtendedMorton fallback)
  u32 key + 3 payloads         (the regroup sort-slice shape)

The adopt bar is a >= 1 ms win at 1M; the whole default-build sort is
~1.8 ms, so the ceiling is visible directly from these numbers.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

K = 10
N = 1 << 20


def timed(fn, *args):
    @jax.jit
    def chained(*a):
        def body(i, carry):
            x, acc = carry
            dep = fn(x, *a[1:])
            return (x ^ dep.astype(x.dtype), acc + dep.astype(jnp.float32))
        _, acc = jax.lax.fori_loop(
            0, K, body, (a[0], jnp.float32(0)))
        return acc
    float(chained(*args))
    best = float("inf")
    for t in range(3):
        a2 = (args[0] + np.uint32(t),) + args[1:]
        t0 = time.time()
        float(chained(*a2))
        best = min(best, (time.time() - t0) / K)
    return 1000.0 * best


def main():
    rng = np.random.default_rng(0)
    k1 = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint32))
    k2 = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint32))
    v = jnp.asarray(np.arange(N, dtype=np.int32))

    def s1(k, v):
        ks, vs = jax.lax.sort((k, v), num_keys=1)
        return vs[0] + vs[-1]
    print(f"sort 1M u32 + 1 payload:  {timed(s1, k1, v):8.2f} ms")

    def s2(k, k2_, v):
        hs, ls, vs = jax.lax.sort((k, k2_, v), num_keys=2)
        return vs[0] + vs[-1]
    print(f"sort 1M (hi,lo) + 1 payload: {timed(s2, k1, k2, v):8.2f} ms")

    def s3(k, a, b, c):
        ks, x, y, z = jax.lax.sort((k, a, b, c), num_keys=1)
        return x[0] + y[0] + z[-1]
    print(f"sort 1M u32 + 3 payloads: {timed(s3, k1, v, v + 1, v + 2):8.2f}"
          " ms")


if __name__ == "__main__":
    main()
