#!/usr/bin/env python
"""Emit-stage statistics for the 1M self-contact pipeline (no timing):
per-pair contact-count (cnt) histogram over the hit-bearing tile pairs and
the per-column multiplicity (colmax) histogram — if cnt is low-skewed like
the ray pipeline (59% cnt==1 there) the moment fast paths already cover
most pairs, and if colmax <= 2 dominates a column-moment path could cover
the rest (VERDICT r4 #3).

Usage: diag_1m.py [log2N]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

import implicitbvh_tpu as ib
from implicitbvh_tpu.traverse import TileTraversal
from implicitbvh_tpu.traverse.tiles import (
    _pair_capacity_for, _phase1_tile_runs, _run_chunk_cap, _step_caps,
    _tiled_fields)
from implicitbvh_tpu.ops.tile_contact import tile_run_counts


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
    alg = TileTraversal(row_cap=4, pair_cap=32)
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

    fields, sphere, tile_lo, tile_up, sub_lo, sub_up, T = \
        _tiled_fields(bvh, G, NB)
    pair_capacity = _pair_capacity_for(T)
    S_cap, CHUNK = _step_caps(pair_capacity // W + T)
    ch_cap = _run_chunk_cap(W, R, NB)
    if CHUNK > ch_cap:
        CHUNK = ch_cap
        S_cap = -(-S_cap // CHUNK) * CHUNK
    pad_run = (-(-T // R) * R) // R
    mask_kind = "sphere" if sphere else "box"

    @jax.jit
    def stats():
        a_idx, run_idx, bm_grp, nsteps, _nc, _ov = _phase1_tile_runs(
            tile_lo, tile_up, sub_lo, sub_up, G, pair_capacity, W, S_cap,
            R, pad_run, NB)
        cnt_parts, cmx_parts = [], []
        for start in range(0, S_cap, CHUNK):
            ns_c = jnp.clip(nsteps - start, 0, CHUNK)

            def run_chunk(start=start, ns_c=ns_c):
                raw = tile_run_counts(
                    a_idx[start:start + CHUNK],
                    run_idx[start * W:(start + CHUNK) * W],
                    tuple(w[start * W:(start + CHUNK) * W]
                          for w in bm_grp),
                    ns_c.reshape(1).astype(jnp.int32), fields,
                    mask_kind=mask_kind, G=G, W=W, R=R, NB=NB,
                    dedup=True, reduce=False,
                    interpret=jax.default_backend() == "cpu")
                # raw: (CHUNK, W*R, 128) per-column counts
                return (raw.sum(axis=2, dtype=jnp.int32).reshape(-1),
                        raw.max(axis=2).reshape(-1))

            cnt_c, cmx_c = jax.lax.cond(
                ns_c > 0, run_chunk,
                lambda: (jnp.zeros((CHUNK * W * R,), jnp.int32),
                         jnp.zeros((CHUNK * W * R,), jnp.int32)))
            cnt_parts.append(cnt_c)
            cmx_parts.append(cmx_c)
        counts = jnp.concatenate(cnt_parts)
        colmax = jnp.concatenate(cmx_parts)
        live = counts > 0
        pairs = jnp.sum(live.astype(jnp.int32))
        hits = jnp.sum(counts)

        def hist(x, edges):
            return jnp.stack([jnp.sum((live & cond).astype(jnp.int32))
                              for cond in edges(x)])

        cnt_h = hist(counts, lambda c: [
            c == 1, c == 2, c == 3, (c >= 4) & (c <= 8),
            (c >= 9) & (c <= 32), c > 32])
        cmx_h = hist(colmax, lambda m: [
            m <= 1, m == 2, m == 3, m > 3])
        # pairs the existing fast paths cover vs a colmax<=2 moment path
        fast12 = jnp.sum((live & (counts <= 2)).astype(jnp.int32))
        colok = jnp.sum((live & (counts > 2) & (colmax <= 2))
                        .astype(jnp.int32))
        # contact mass by class (emit time scales with pairs, but slot
        # pressure with hits)
        hits12 = jnp.sum(jnp.where(live & (counts <= 2), counts, 0))
        hits_colok = jnp.sum(
            jnp.where(live & (counts > 2) & (colmax <= 2), counts, 0))
        return pairs, hits, cnt_h, cmx_h, fast12, colok, hits12, hits_colok

    pairs, hits, cnt_h, cmx_h, fast12, colok, hits12, hits_colok = stats()
    print(f"hit pairs {int(pairs)}, hits {int(hits)}")
    h = [int(x) for x in np.asarray(cnt_h)]
    print(f"cnt hist: 1:{h[0]} 2:{h[1]} 3:{h[2]} 4-8:{h[3]} "
          f"9-32:{h[4]} >32:{h[5]}")
    m = [int(x) for x in np.asarray(cmx_h)]
    print(f"colmax hist (live pairs): <=1:{m[0]} 2:{m[1]} 3:{m[2]} >3:{m[3]}")
    print(f"fast cnt<=2 pairs {int(fast12)} (hits {int(hits12)}); "
          f"cnt>2 & colmax<=2 pairs {int(colok)} (hits {int(hits_colok)})")


if __name__ == "__main__":
    main()
