#!/usr/bin/env python
"""Micro-rates of the XLA primitives a moment-decode emit path would need
(round-5 design probe): if the count kernel also captured per-column
i-moments, contacts for colmax<=2 pairs could be decoded in XLA with no
emit kernel at all — IF row gathers / lane-axis cumsums / dense argmax
passes are cheap at the relevant sizes.  Prints one line per primitive.

All timings chain K iterations inside one jit with data deps and fetch a
dependent scalar (the repo's honest-timing protocol).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

K = 10


def timed(fn, *args):
    @jax.jit
    def chained(*a):
        def body(i, carry):
            x, acc = carry
            dep = fn(x, *a[1:])
            return (x + (1e-9 * dep).astype(x.dtype), acc + dep)
        _, acc = jax.lax.fori_loop(0, K, body,
                                   (a[0], jnp.float32(0)))
        return acc
    float(chained(*args))
    best = float("inf")
    for t in range(3):
        a2 = (args[0] + t,) + args[1:]
        t0 = time.time()
        float(chained(*a2))
        best = min(best, (time.time() - t0) / K)
    return 1000.0 * best


def main():
    rng = np.random.default_rng(0)
    NROWS = 3_000_000          # padded count-kernel grid rows at ray scale
    NLIVE = 131_072            # live (hit-bearing) pairs
    big = jnp.asarray(rng.integers(0, 3, (NROWS, 128), dtype=np.int32))
    idx = jnp.asarray(
        np.sort(rng.integers(0, NROWS, NLIVE)).astype(np.int32))
    live = jnp.asarray(rng.integers(0, 3, (NLIVE, 128), dtype=np.int32))

    # 1. row gather: NLIVE (1, 128) rows out of (NROWS, 128)
    def g_rows(i, src):
        return src[i].sum(dtype=jnp.int32).astype(jnp.float32)
    ms = timed(g_rows, idx, big)
    print(f"row-gather {NLIVE}x128 of {NROWS}x128: {ms:8.2f} ms")

    # 1b. three overlapping row gathers (cc/is/iq planes)
    def g_rows3(i, src):
        s = src[i].sum(dtype=jnp.int32)
        s += src[jnp.minimum(i + 1, NROWS - 1)].sum(dtype=jnp.int32)
        s += src[jnp.minimum(i + 2, NROWS - 1)].sum(dtype=jnp.int32)
        return s.astype(jnp.float32)
    ms = timed(g_rows3, idx, big)
    print(f"3x row-gather {NLIVE}x128: {ms:8.2f} ms")

    # 2. lane-axis cumsum on the live rows
    def lane_cumsum(x):
        return jnp.cumsum(x, axis=1).sum(dtype=jnp.int32).astype(
            jnp.float32)
    ms = timed(lane_cumsum, live)
    print(f"lane cumsum {NLIVE}x128: {ms:8.2f} ms")

    # 3. dense per-row argmax + value-at-argmax over the FULL padded grid
    def dense_argmax(x):
        j = jnp.argmax(x, axis=1)
        v = jnp.take_along_axis(x, j[:, None], axis=1)[:, 0]
        return (j.sum(dtype=jnp.int32) + v.sum(dtype=jnp.int32)
                ).astype(jnp.float32)
    ms = timed(dense_argmax, big)
    print(f"dense argmax+take {NROWS}x128: {ms:8.2f} ms")

    # 4. scatter of 256k updates into a 512k buffer
    upd = jnp.asarray(rng.integers(0, 1 << 20, 262_144, dtype=np.int32))
    dst = jnp.asarray(
        np.sort(rng.integers(0, 1 << 19, 262_144)).astype(np.int32))

    def scat(u, d):
        out = jnp.zeros((1 << 19,), jnp.int32).at[d].set(u, mode="drop")
        return out.sum(dtype=jnp.int32).astype(jnp.float32)
    ms = timed(scat, upd, dst)
    print(f"scatter 262k -> 512k: {ms:8.2f} ms")

    # 5. flat cumsum over the padded slot counts (offsets pass)
    flat = jnp.asarray(rng.integers(0, 3, NROWS, dtype=np.int32))

    def fcs(x):
        return jnp.cumsum(x)[-1].astype(jnp.float32)
    ms = timed(fcs, flat)
    print(f"flat cumsum {NROWS}: {ms:8.2f} ms")

    # 6. dense elementwise decode pass over the full grid (reads 2 planes,
    # writes nothing big): models the "decode in place then scatter" shape
    big2 = jnp.asarray(rng.integers(0, 127, (NROWS, 128), dtype=np.int32))

    def dense_decode(x, y):
        cc = x
        i1 = jnp.where(cc == 2, y // 2, y)
        return (i1.sum(dtype=jnp.int32)).astype(jnp.float32)
    ms = timed(dense_decode, big, big2)
    print(f"dense 2-plane decode {NROWS}x128: {ms:8.2f} ms")

    # 7. live-lane selection on the gathered rows: top_k vs iterated
    # argmax (the decode path needs the first K live lanes per row)
    lanes = jnp.arange(128, dtype=jnp.int32)[None, :]

    def topk8(x):
        v, idx = jax.lax.top_k(x * 1000 - lanes, 8)
        return (idx.sum(dtype=jnp.int32) + v[:, 0].sum(dtype=jnp.int32)
                ).astype(jnp.float32)
    ms = timed(topk8, live)
    print(f"top_k(8) {NLIVE}x128: {ms:8.2f} ms")

    def iter_argmax(x, K=8):
        cur = x > 0
        acc = jnp.zeros((), jnp.int32)
        for _ in range(K):
            lk = jnp.argmax(cur, axis=1).astype(jnp.int32)
            acc = acc + lk.sum(dtype=jnp.int32)
            cur = cur & (lanes != lk[:, None])
        return acc.astype(jnp.float32)
    ms = timed(iter_argmax, live)
    print(f"iter-argmax(8) {NLIVE}x128: {ms:8.2f} ms")

    # 8. take_along_axis of K selected lanes per row
    sel = jnp.asarray(rng.integers(0, 128, (NLIVE, 8), dtype=np.int32))

    def take8(x, s):
        return jnp.take_along_axis(x, s, axis=1).sum(
            dtype=jnp.int32).astype(jnp.float32)
    ms = timed(take8, live, sel)
    print(f"take_along_axis {NLIVE}x8 of x128: {ms:8.2f} ms")


if __name__ == "__main__":
    main()
