#!/usr/bin/env python
"""Runnable benchmarks for the BASELINE.json configs.

Mirrors the reference's benchmark scripts (/root/reference/benchmark/*.jl):
each config prints a timing line; pass a config number (1-5) or nothing for
all.  Timings force device->host fetches (block_until_ready does not block
through the TPU tunnel).

  1. README 5-sphere demo: build + traverse, exact contact parity
  2. ~70k-triangle mesh (bunny-sized): BSphere leaves -> BBox nodes,
     self-contact
  3. ray tracing: 1k then 100k rays vs a 250k-triangle-sized scene
  4. BVH-vs-BVH pair traversal with built_level cutoff
  5. 1M moving particles: per-step rebuild + contact detection (fused)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import implicitbvh_tpu as ib
from implicitbvh_tpu.traverse import (TileTraversal, traverse_tiles_fixed,
                                      traverse_tiles_pair_fixed,
                                      traverse_lvt_pair_fixed)
from implicitbvh_tpu.raytrace import traverse_rays_fixed

ON_CPU = jax.default_backend() == "cpu"


def timed_fetch(fn, *args, K=3):
    """Min wall time per call, forcing completion via scalar fetch."""
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())  # warm + drain
    best = float("inf")
    for _ in range(K):
        t0 = time.time()
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].sum())
        best = min(best, time.time() - t0)
    return best, out


def tri_soup(n, seed=0, edge=0.4):
    rng = np.random.default_rng(seed)
    scale = float(n) ** (1.0 / 3.0)
    c = (rng.random((n, 3)) * scale).astype(np.float32)
    e1 = (rng.random((n, 3)) - 0.5).astype(np.float32) * edge
    e2 = (rng.random((n, 3)) - 0.5).astype(np.float32) * edge
    return jnp.asarray(c), jnp.asarray(c + e1), jnp.asarray(c + e2)


def config1():
    xs = np.array([[0, 0, 0], [0, 0, 1], [0, 0, 2], [0, 0, 3], [0, 0, 4]],
                  np.float32)
    rs = np.array([0.5, 0.6, 0.5, 0.4, 0.6], np.float32)
    bvh = ib.build(ib.BSphere(jnp.asarray(xs), jnp.asarray(rs)), ib.BBox)
    t = ib.traverse(bvh)
    ok = t.contacts_list() == [(1, 2), (2, 3), (4, 5)]
    print(f"config1 README demo: contacts {t.contacts_list()} parity={ok}")


def config2():
    n = 1 << 16  # ~70k
    p1, p2, p3 = tri_soup(n)

    @jax.jit
    def step(p1, p2, p3):
        bvh = ib.build(ib.bsphere_from_triangles(p1, p2, p3), ib.BBox)
        total, contacts, _, _nc = traverse_tiles_fixed(
            bvh, 1 << 18, alg=TileTraversal(row_cap=8, pair_cap=64))
        # returning the checksum keeps extraction from being DCE'd
        return total, contacts.sum(dtype=jnp.int32)

    dt, (total, _) = timed_fetch(step, p1, p2, p3)
    print(f"config2 {n}-tri self-contact: {1000*dt:.2f} ms, "
          f"{int(total)} contacts")


def config3():
    from implicitbvh_tpu.traverse.ray_tiles import traverse_rays_tiles_fixed

    n = 1 << 14 if ON_CPU else 1 << 18
    p1, p2, p3 = tri_soup(n)
    bvh = ib.build(ib.bsphere_from_triangles(p1, p2, p3), ib.BBox)
    rng = np.random.default_rng(1)
    for nrays in (1000, 100_000):
        scale = float(n) ** (1.0 / 3.0)
        p = jnp.asarray((rng.random((3, nrays)) * scale).astype(np.float32))
        d = jnp.asarray((rng.random((3, nrays)) - 0.5).astype(np.float32))

        cap = 1 << 18 if nrays > 10_000 else 1 << 14

        @jax.jit
        def rays_tiles(p, d):
            total, contacts, ov, _nc = traverse_rays_tiles_fixed(bvh, p, d,
                                                            capacity=cap)
            return total, ov, contacts.sum(dtype=jnp.int32)

        dt, (total, ov, _) = timed_fetch(rays_tiles, p, d)
        warn = "  WARNING: overflow" if bool(ov) else ""
        print(f"config3 {nrays} rays vs {n} BVs (tile path): "
              f"{1000*dt:.2f} ms, {int(total)} hits{warn}")

    # walk-engine reference point at 1k rays (the pre-tile default)
    nrays = 1000
    p = jnp.asarray((rng.random((3, nrays)) * scale).astype(np.float32))
    d = jnp.asarray((rng.random((3, nrays)) - 0.5).astype(np.float32))

    @jax.jit
    def rays_walk(p, d):
        total, contacts = traverse_rays_fixed(bvh, p, d, capacity=1 << 20)
        return total, contacts.sum(dtype=jnp.int32)

    dt, (total, _) = timed_fetch(rays_walk, p, d)
    print(f"config3 {nrays} rays vs {n} BVs (LVT walk): {1000*dt:.2f} ms, "
          f"{int(total)} hits")


def config4():
    n1, n2 = 1 << 15, 1 << 14
    a1, a2, a3 = tri_soup(n1, 2)
    b1, b2, b3 = tri_soup(n2, 3)

    @jax.jit
    def pair(a1, a2, a3, b1, b2, b3):
        bvh1 = ib.build(ib.bsphere_from_triangles(a1, a2, a3), ib.BBox)
        bvh2 = ib.build(ib.bsphere_from_triangles(b1, b2, b3), ib.BBox)
        total, contacts, _, _nc = traverse_tiles_pair_fixed(bvh1, bvh2, 1 << 17)
        return total, contacts.sum(dtype=jnp.int32)

    dt, (total, _) = timed_fetch(pair, a1, a2, a3, b1, b2, b3)
    print(f"config4 pair {n1}x{n2} (tile path): {1000*dt:.2f} ms, "
          f"{int(total)} contacts")

    @jax.jit
    def pair_lvt(a1, a2, a3, b1, b2, b3):
        bvh1 = ib.build(ib.bsphere_from_triangles(a1, a2, a3), ib.BBox,
                        built_level=2)
        bvh2 = ib.build(ib.bsphere_from_triangles(b1, b2, b3), ib.BBox)
        total, contacts = traverse_lvt_pair_fixed(bvh1, bvh2,
                                                  capacity=1 << 18,
                                                  start_level1=2)
        return total, contacts.sum(dtype=jnp.int32)

    dt, (total, _) = timed_fetch(pair_lvt, a1, a2, a3, b1, b2, b3)
    print(f"config4 pair {n1}x{n2} (LVT walk, built_level=2): "
          f"{1000*dt:.2f} ms, {int(total)} contacts")


def config5():
    n = 1 << 14 if ON_CPU else 1 << 20
    rng = np.random.default_rng(4)
    scale = float(n) ** (1.0 / 3.0)
    x = jnp.asarray((rng.random((n, 3)) * scale).astype(np.float32))
    r = jnp.asarray((rng.random(n) * 0.2 + 0.05).astype(np.float32))
    v = jnp.asarray((rng.random((n, 3)) - 0.5).astype(np.float32) * 0.01)

    @jax.jit
    def step(x, r):
        bvh = ib.build(ib.BSphere(x, r), ib.BBox)
        total, contacts, overflow, _nc = traverse_tiles_fixed(
            bvh, 1 << 18, alg=TileTraversal(pair_cap=32))
        checksum = contacts.sum(dtype=jnp.int32)
        return x + v, total, overflow, checksum  # checksum defeats DCE

    (x2, total, overflow, _) = step(x, r)
    float(total)
    t0 = time.time()
    for _ in range(3):
        x2, total, overflow, checksum = step(x2, r)
    float(total), float(checksum)
    dt = (time.time() - t0) / 3
    suffix = "  WARNING: capacity overflow, counts truncated" \
        if bool(overflow) else ""
    print(f"config5 {n} moving particles, per-step rebuild+contact: "
          f"{1000*dt:.2f} ms, {int(total)} contacts{suffix}")


def config6():
    """Per-algorithm self-contact comparison on one scene (VERDICT #5):
    the dense-tile engine vs the stackless LVT walk vs BFS frontiers."""
    from implicitbvh_tpu.traverse.lvt import traverse_lvt_single_fixed
    from implicitbvh_tpu.traverse.bfs import bfs_single_fixed

    n = 1 << 13 if ON_CPU else 1 << 16
    p1, p2, p3 = tri_soup(n)
    bvh = ib.build(ib.bsphere_from_triangles(p1, p2, p3), ib.BBox)

    @jax.jit
    def t_tiles(p1, p2, p3):
        b = ib.build(ib.bsphere_from_triangles(p1, p2, p3), ib.BBox)
        total, contacts, _, _nc = traverse_tiles_fixed(
            b, 1 << 16, alg=TileTraversal(row_cap=8, pair_cap=64))
        return total, contacts.sum(dtype=jnp.int32)

    @jax.jit
    def t_lvt(p1, p2, p3):
        b = ib.build(ib.bsphere_from_triangles(p1, p2, p3), ib.BBox)
        total, contacts = traverse_lvt_single_fixed(b, 1 << 16)
        return total, contacts.sum(dtype=jnp.int32)

    @jax.jit
    def t_bfs(p1, p2, p3):
        b = ib.build(ib.bsphere_from_triangles(p1, p2, p3), ib.BBox)
        sl = max(b.tree.levels // 2, b.built_level)
        total, contacts, _, ov = bfs_single_fixed(b, sl, 1 << 21)
        return total, ov, contacts.sum(dtype=jnp.int32)

    dt, (total, _) = timed_fetch(t_tiles, p1, p2, p3)
    print(f"config6 {n} self-contact [tiles]: {1000*dt:.2f} ms, "
          f"{int(total)} contacts")
    dt, (total, _) = timed_fetch(t_lvt, p1, p2, p3)
    print(f"config6 {n} self-contact [LVT walk]: {1000*dt:.2f} ms, "
          f"{int(total)} contacts")
    dt, (total, ov, _) = timed_fetch(t_bfs, p1, p2, p3)
    warn = "  WARNING: overflow" if bool(ov) else ""
    print(f"config6 {n} self-contact [BFS]: {1000*dt:.2f} ms, "
          f"{int(total)} contacts{warn}")


if __name__ == "__main__":
    configs = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5,
               6: config6}
    picks = [int(a) for a in sys.argv[1:]] or sorted(configs)
    for k in picks:
        configs[k]()
