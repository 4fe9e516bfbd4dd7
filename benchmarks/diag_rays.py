#!/usr/bin/env python
"""Print ray-pipeline pair statistics at 100k x 262k (no timing): how many
hit-bearing (ray-tile, leaf-tile) pairs the emit kernel must process, the
emit step count, and the per-pair contact-count histogram — the emit
kernel pays ~0.6 us per pair regardless of cnt, so pairs ~ hits means the
two-phase emit degenerates to per-contact cost for rays.

Usage: diag_rays.py [log2N] [nrays]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

import implicitbvh_tpu as ib
from implicitbvh_tpu.traverse import TileTraversal
from implicitbvh_tpu.traverse.tiles import (_run_chunk_cap, _step_caps,
                                            _tiled_fields)
from implicitbvh_tpu.traverse.ray_tiles import (
    RAY_CANDS_PER_RAY_TILE, _phase1_ray_runs)
from implicitbvh_tpu.ops.tile_contact import tile_run_counts
from implicitbvh_tpu.raytrace import _prep_rays
from implicitbvh_tpu.traverse.ray_tiles import _ray_tile_fields, _sort_rays


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 18)
    nrays = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    alg = TileTraversal(row_cap=8)
    G, W, R, NB = alg.tile, alg.count_w, alg.run_r, alg.bands

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
    pr = jnp.asarray((rng2.random((3, nrays)) * scale).astype(np.float32))
    dr = jnp.asarray((rng2.random((3, nrays)) - 0.5).astype(np.float32))

    fields, sphere, tile_lo, tile_up, _, _, T = _tiled_fields(bvh, G)
    RT = -(-nrays // G)
    pair_capacity = max(
        ((RT * RAY_CANDS_PER_RAY_TILE + 8191) // 8192) * 8192, 8192)
    S_cap, CHUNK = _step_caps(pair_capacity // W + RT)
    ch_cap = _run_chunk_cap(W, R, NB)
    if CHUNK > ch_cap:
        CHUNK = ch_cap
        S_cap = -(-S_cap // CHUNK) * CHUNK
    pad_run = (-(-T // R) * R) // R
    mask_kind = "ray_sphere" if sphere else "ray_box"

    @jax.jit
    def stats(q, d2):
        p, d = _prep_rays(q, d2, bvh.leaves.volume.dtype)
        perm = _sort_rays(p, d)
        rfields, _RT = _ray_tile_fields(p, d, perm, G)
        a_idx, run_idx, bm_grp, nsteps, _nc = _phase1_ray_runs(
            rfields, tile_lo, tile_up, W, S_cap, R, pad_run, NB)
        cnt_parts = []
        for start in range(0, S_cap, CHUNK):
            ns_c = jnp.clip(nsteps - start, 0, CHUNK)

            def run_chunk(start=start, ns_c=ns_c):
                return tile_run_counts(
                    a_idx[start:start + CHUNK],
                    run_idx[start * W:(start + CHUNK) * W],
                    tuple(w[start * W:(start + CHUNK) * W]
                          for w in bm_grp),
                    ns_c.reshape(1).astype(jnp.int32), rfields, fields,
                    mask_kind=mask_kind, G=G, W=W, R=R, NB=NB,
                    dedup=False, interpret=False)

            cnt_parts.append(jax.lax.cond(
                ns_c > 0, run_chunk,
                lambda: jnp.zeros((CHUNK * W * R,), jnp.int32)))
        counts = jnp.concatenate(cnt_parts)
        live = counts > 0
        pairs = jnp.sum(live.astype(jnp.int32))
        hits = jnp.sum(counts)
        hist = jnp.stack([
            jnp.sum((counts == 1).astype(jnp.int32)),
            jnp.sum(((counts >= 2) & (counts <= 3)).astype(jnp.int32)),
            jnp.sum(((counts >= 4) & (counts <= 8)).astype(jnp.int32)),
            jnp.sum((counts > 8).astype(jnp.int32))])
        rc = counts.reshape(-1, R)
        live_runs = jnp.sum((rc.max(axis=1) > 0).astype(jnp.int32))
        return nsteps, pairs, hits, hist, live_runs

    nsteps, pairs, hits, hist, live_runs = stats(pr, dr)
    print(f"count steps {int(nsteps)}, hit pairs {int(pairs)}, "
          f"hits {int(hits)}, live runs {int(live_runs)}")
    h = [int(x) for x in np.asarray(hist)]
    print(f"cnt hist: 1: {h[0]}  2-3: {h[1]}  4-8: {h[2]}  >8: {h[3]}")
    W2 = alg.emit_w
    print(f"emit steps ~ {int(pairs) // W2} at W2={W2}")


if __name__ == "__main__":
    main()
