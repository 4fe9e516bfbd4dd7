#!/usr/bin/env python
"""On-chip parity check for the two-phase ray tile path on a SMALL scene.

Run this BEFORE any config3-scale ray benchmark after kernel changes: a
faulting kernel wedges the TPU tunnel for a long time (CLAUDE.md), and the
small scene (32 leaf tiles, 512 rays) compiles and validates in seconds.

Compares the two-phase run path's contact set against the stackless walk
(cross-engine ground truth, ref src/raytrace/raytrace.jl semantics).
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

import implicitbvh_tpu as ib
from implicitbvh_tpu.traverse import TileTraversal
from implicitbvh_tpu.traverse.ray_tiles import traverse_rays_tiles_fixed
from implicitbvh_tpu.raytrace import traverse_rays_fixed


def main():
    n = 32 * 128            # 32 leaf tiles
    nrays = 512
    rng = np.random.default_rng(7)
    scale = float(n) ** (1.0 / 3.0)
    c = (rng.random((n, 3)) * scale).astype(np.float32)
    e1 = (rng.random((n, 3)) - 0.5).astype(np.float32) * 0.4
    e2 = (rng.random((n, 3)) - 0.5).astype(np.float32) * 0.4
    p1, p2, p3 = (jnp.asarray(c), jnp.asarray(c + e1), jnp.asarray(c + e2))
    bvh = ib.build(ib.bsphere_from_triangles(
        tuple(p1[:, k] for k in range(3)),
        tuple(p2[:, k] for k in range(3)),
        tuple(p3[:, k] for k in range(3))), ib.BBox)
    p = jnp.asarray((rng.random((3, nrays)) * scale).astype(np.float32))
    d = jnp.asarray((rng.random((3, nrays)) - 0.5).astype(np.float32))

    for R in (8, 16):
        alg = TileTraversal(row_cap=8, pair_cap=32, run_r=R)
        total, contacts, ov, nc = jax.jit(
            lambda p, d, alg=alg: traverse_rays_tiles_fixed(
                bvh, p, d, capacity=1 << 13, alg=alg))(p, d)
        total = int(total)
        assert int(ov) == 0, f"overflow bits {int(ov)}"
        tiles_set = set(map(tuple, np.asarray(contacts[:total]).tolist()))
        print(f"R={R}: two-phase {total} hits, checks={int(nc)}",
              flush=True)

        wt, wc = jax.jit(lambda p, d: traverse_rays_fixed(
            bvh, p, d, capacity=1 << 14))(p, d)
        walk_set = set(map(tuple, np.asarray(wc[:int(wt)]).tolist()))
        assert tiles_set == walk_set, (
            f"R={R}: mismatch {len(tiles_set)} vs {len(walk_set)}; "
            f"only-tiles {sorted(tiles_set - walk_set)[:5]} "
            f"only-walk {sorted(walk_set - tiles_set)[:5]}")
        print(f"R={R}: PASS ({total} hits match the walk)", flush=True)


if __name__ == "__main__":
    main()
