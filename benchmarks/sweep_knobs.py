#!/usr/bin/env python
"""Sweep TileTraversal knobs on the fused 1M rebuild+self-contact program.

One process, one scene; per config: sanity-assert unique contact totals
(overflow + dedup), then time the fused program only (chained K inside one
jit, scalar fetch — block_until_ready does not block through the tunnel).

Usage: sweep_knobs.py [log2N] [configs...]
  each config is R,W2,NB,CW (comma-separated); default sweep list below.
"""

import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import implicitbvh_tpu as ib
from implicitbvh_tpu.traverse import TileTraversal, traverse_tiles_fixed
from implicitbvh_tpu.traverse.tiles import _pair_capacity_for

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
        args2 = (jax.tree_util.tree_map(lambda x: x * f, args[0]),) + args[1:]
        t0 = time.time()
        float(chained(*args2))
        best = min(best, (time.time() - t0) / K)
    return 1000.0 * best


def main():
    n_tri = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    if len(sys.argv) > 2:
        configs = [tuple(int(x) for x in s.split(",")) for s in sys.argv[2:]]
    else:
        configs = [(8, 4, 4, 8), (16, 4, 4, 8), (8, 8, 4, 8),
                   (8, 4, 8, 8), (8, 4, 16, 8), (8, 4, 4, 16)]

    rng = np.random.default_rng(0)
    scale = float(n_tri) ** (1.0 / 3.0)
    c = (rng.random((n_tri, 3)) * scale).astype(np.float32)
    e1 = (rng.random((n_tri, 3)) - 0.5).astype(np.float32) * 0.4
    e2 = (rng.random((n_tri, 3)) - 0.5).astype(np.float32) * 0.4

    def tup(a):
        return tuple(jnp.asarray(a[:, k]) for k in range(3))
    p1, p2, p3 = tup(c), tup(c + e1), tup(c + e2)

    G = 128
    T = -(-n_tri // G)
    pair_capacity = _pair_capacity_for(T)
    capacity = max(1 << math.ceil(math.log2(n_tri)) - 3, 4096)

    expected_total = None
    for (R, W2, NB, CW) in configs:
        alg = TileTraversal(row_cap=4, pair_cap=32, run_r=R, emit_w=W2,
                            bands=NB, count_w=CW)

        def s_full(q1, q2, q3, alg=alg):
            s = ib.bsphere_from_triangles(q1, q2, q3)
            bvh = ib.build(s, ib.BBox)
            total, contacts, overflow, _nc = traverse_tiles_fixed(
                bvh, capacity, alg=alg, pair_capacity=pair_capacity)
            return (total.astype(jnp.float32) +
                    1e-9 * contacts.sum(dtype=jnp.int32).astype(jnp.float32))

        # correctness sanity before timing
        s = ib.bsphere_from_triangles(p1, p2, p3)
        bvh = ib.build(s, ib.BBox)
        total, contacts, ov, _nc = traverse_tiles_fixed(
            bvh, capacity, alg=alg, pair_capacity=pair_capacity)
        assert int(ov) == 0, f"R={R},W2={W2},NB={NB},CW={CW}: overflow {int(ov)}"
        cl = np.asarray(contacts[:int(total)])
        uniq = len(set(map(tuple, cl.tolist())))
        assert uniq == int(total), \
            f"R={R},W2={W2},NB={NB},CW={CW}: dup contacts {uniq}/{int(total)}"
        if expected_total is None:
            expected_total = int(total)
        assert int(total) == expected_total, \
            f"R={R},W2={W2},NB={NB},CW={CW}: total {int(total)} != {expected_total}"

        ms = timed(s_full, p1, p2, p3)
        print(f"R={R:3d} W2={W2:2d} NB={NB:3d} CW={CW:3d}  full {ms:8.2f} ms"
              f"  ({expected_total} contacts)", flush=True)


if __name__ == "__main__":
    main()
