#!/usr/bin/env python
"""Sweep TileTraversal knobs on the 100k-rays-vs-262k-BVs config.

Unlike self-contact, finer ray bands are FREE in phase 1: _ray_tile_hits
computes per-ray tile hits anyway and only ORs them into (G / bands)-ray
bands, so bands=8/16 prune dead rays in the count kernel at no extra
phase-1 cost (self-contact pays ~NB/4 x in the bits kernel, where NB=8
measured a net loss).

Per config: assert exact hit parity vs the first config, then time the
traversal chained inside one jit (scalar fetch; block_until_ready does
not block through the tunnel).

Usage: sweep_rays.py [log2N] [nrays] [configs...]
  each config is R,W2,NB,CW; default list sweeps bands at (8,4,*,8).
"""

import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import implicitbvh_tpu as ib
from implicitbvh_tpu.traverse import TileTraversal
from implicitbvh_tpu.traverse.ray_tiles import traverse_rays_tiles_fixed

K = 5


def timed(fn, *args):
    @jax.jit
    def chained(*a):
        def body(i, carry):
            a0, acc = carry
            dep = fn(a0, *a[1:])
            a0n = jax.tree_util.tree_map(
                lambda x: x + (1e-12 * dep).astype(x.dtype), a0)
            return (a0n, acc + dep)
        _, acc = jax.lax.fori_loop(0, K, body, (a[0], jnp.float32(0)))
        return acc
    float(chained(*args))  # warm/compile
    best = float("inf")
    for t in range(3):
        f = jnp.float32(1.0 + 1e-7 * (t + 1))
        args2 = (jax.tree_util.tree_map(lambda x: x * f, args[0]),) + \
            args[1:]
        t0 = time.time()
        float(chained(*args2))
        best = min(best, (time.time() - t0) / K)
    return 1000.0 * best


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 18)
    nrays = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    if len(sys.argv) > 3:
        configs = [tuple(int(x) for x in s.split(",")) for s in sys.argv[3:]]
    else:
        configs = [(8, 4, 4, 8), (8, 4, 8, 8), (8, 4, 16, 8), (8, 8, 16, 8)]
    configs = [c + (8,) * (5 - len(c)) for c in configs]   # default row_cap

    rng = np.random.default_rng(0)
    scale = float(n) ** (1.0 / 3.0)
    c = (rng.random((n, 3)) * scale).astype(np.float32)
    e1 = (rng.random((n, 3)) - 0.5).astype(np.float32) * 0.4
    e2 = (rng.random((n, 3)) - 0.5).astype(np.float32) * 0.4

    def tup(a):
        return tuple(jnp.asarray(a[:, k]) for k in range(3))
    p1, p2, p3 = tup(c), tup(c + e1), tup(c + e2)
    bvh = ib.build(ib.bsphere_from_triangles(p1, p2, p3), ib.BBox)

    rng2 = np.random.default_rng(1)
    p = jnp.asarray((rng2.random((3, nrays)) * scale).astype(np.float32))
    d = jnp.asarray((rng2.random((3, nrays)) - 0.5).astype(np.float32))

    cap = max(1 << math.ceil(math.log2(max(4 * nrays, 4096))), 4096)

    expected = None
    for (R, W2, NB, CW, RC) in configs:
        alg = TileTraversal(row_cap=RC, pair_cap=32, run_r=R, emit_w=W2,
                            bands=NB, count_w=CW)
        total, contacts, ov, nc = traverse_rays_tiles_fixed(
            bvh, p, d, cap, alg=alg)
        tot = int(total)
        assert int(ov) == 0, \
            f"overflow bits {int(ov)} at {(R, W2, NB, CW, RC)}"
        hits = set(map(tuple, np.asarray(contacts[:tot]).tolist()))
        assert len(hits) == tot, "duplicate hits"
        if expected is None:
            expected = hits
        assert hits == expected, f"hit mismatch at {(R, W2, NB, CW, RC)}"

        def s_rays(q, d2, alg=alg):
            total, contacts, ov, _nc = traverse_rays_tiles_fixed(
                bvh, q, d2, cap, alg=alg)
            return (total.astype(jnp.float32) +
                    ov.astype(jnp.float32) * 1e9 +
                    contacts.sum(dtype=jnp.int32).astype(jnp.float32)
                    * 1e-9)

        ms = timed(s_rays, p, d)
        print(f"R={R:3d} W2={W2:2d} NB={NB:3d} CW={CW:3d} RC={RC:2d}  "
              f"rays {ms:8.2f} ms  ({tot} hits, num_checks {int(nc):,})",
              flush=True)


if __name__ == "__main__":
    main()
