#!/usr/bin/env python
"""Profile the 100k-rays-vs-262k-BVs tile pipeline stage by stage on TPU.

Same protocol as profile_1m.py: stages are cumulative prefixes of
traverse_rays_tiles_fixed's two-phase pipeline, chained K times inside
one jit with data dependencies, timed by a dependent scalar fetch
(block_until_ready does not block through the tunnel).  The first stage
absorbs the ~5 ms dispatch/fetch floor; deltas are the honest per-stage
costs.

Usage: profile_rays.py [log2N] [nrays] [R] [W2] [NB] [CW] [DK]

DK > 0 (default 8, the ray-engine default) profiles the moment-decode
pipeline: the count kernel captures column moments and low-count pairs
bypass the emit kernel through the pure-XLA decode (a ``decode`` stage
appears between ``regroup`` and ``emit``).
"""

import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import implicitbvh_tpu as ib

INTERP = None  # resolved from the backend in main()
from implicitbvh_tpu.traverse import TileTraversal
from implicitbvh_tpu.traverse.tiles import (
    _finish_contacts, _merge_streams, _regroup_emit_runs, _run_chunk_cap,
    _step_caps, _tiled_fields)
from implicitbvh_tpu.traverse.ray_tiles import (
    RAY_CANDS_PER_RAY_TILE, _phase1_ray_runs, _ray_tile_fields, _sort_rays,
    traverse_rays_tiles_fixed)
from implicitbvh_tpu.ops.tile_contact import tile_group_emit, tile_run_counts
from implicitbvh_tpu.raytrace import _prep_rays

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
    float(chained(*args))  # warm
    best = float("inf")
    for t in range(3):
        f = jnp.float32(1.0 + 1e-7 * (t + 1))
        args2 = (jax.tree_util.tree_map(lambda x: x * f, args[0]),) + args[1:]
        t0 = time.time()
        float(chained(*args2))
        best = min(best, (time.time() - t0) / K)
    return 1000.0 * best


def main():
    global INTERP
    INTERP = jax.default_backend() == "cpu"
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 18)
    nrays = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    W2 = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    NB = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    CW = int(sys.argv[6]) if len(sys.argv) > 6 else 8
    DK = int(sys.argv[7]) if len(sys.argv) > 7 else 8
    alg = TileTraversal(row_cap=8, pair_cap=32, run_r=R, emit_w=W2,
                        bands=NB, count_w=CW, decode_k=DK)
    G = alg.tile
    W = CW

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

    capacity = max(1 << math.ceil(math.log2(max(2 * nrays, 4096))), 4096)

    # static sizing (mirrors traverse_rays_tiles_fixed)
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

    # sanity before timing (skipped for wrong-by-design attribution runs)
    from implicitbvh_tpu.ops.tile_contact import ABLATE
    wrong = {"nomask", "emit_nomask", "emit_noslow", "emit_nofast",
             "emit_noappend"} & ABLATE
    if wrong:
        print(f"# WARNING: attribution run ({sorted(wrong)}) — contacts "
              "wrong by design, sanity skipped", flush=True)
    else:
        total, contacts, ov, nc = traverse_rays_tiles_fixed(
            bvh, pr, dr, capacity, alg=alg)
        assert int(ov) == 0, f"overflow bits {int(ov)}"
        hits = set(map(tuple, np.asarray(contacts[:int(total)]).tolist()))
        assert len(hits) == int(total), "duplicate hits"
        print(f"# sanity: {int(total)} unique hits, no overflow, "
              f"num_checks {int(nc):,}", flush=True)

    def _prep(q, d2):
        p, d = _prep_rays(q, d2, bvh.leaves.volume.dtype)
        perm = _sort_rays(p, d)
        rfields, _RT = _ray_tile_fields(p, d, perm, G)
        return rfields, perm

    def s_sort(q, d2):
        rfields, perm = _prep(q, d2)
        return rfields[0].sum() + perm.sum().astype(jnp.float32)

    def _p1(q, d2):
        rfields, perm = _prep(q, d2)
        a_idx, run_idx, bm_grp, nsteps, num_checks = _phase1_ray_runs(
            rfields, tile_lo, tile_up, W, S_cap, R, pad_run, NB)
        return rfields, perm, a_idx, run_idx, bm_grp, nsteps

    def s_phase1(q, d2):
        rfields, perm, a_idx, run_idx, bm_grp, nsteps = _p1(q, d2)
        return (a_idx.sum().astype(jnp.float32) + run_idx[0] +
                bm_grp[0][0] + nsteps.astype(jnp.float32))

    def _counts(q, d2):
        rfields, perm, a_idx, run_idx, bm_grp, nsteps = _p1(q, d2)
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
                    dedup=False, interpret=INTERP,
                    with_colmax=not DK, moments=bool(DK))

            dead = ((jnp.zeros((CHUNK * W * R,), jnp.int32),
                     jnp.zeros((CHUNK * W * R,), jnp.int32),
                     jnp.zeros((CHUNK * W * R, 128), jnp.int32))
                    if DK else
                    (jnp.zeros((CHUNK * W * R,), jnp.int32),
                     jnp.zeros((CHUNK * W * R,), jnp.int32)))
            cnt_parts.append(jax.lax.cond(ns_c > 0, run_chunk,
                                          lambda d=dead: d))
        barred = jax.lax.optimization_barrier(
            tuple(jnp.concatenate([p[k] for p in cnt_parts])
                  for k in range(2)) +
            (tuple(p[2] for p in cnt_parts) if DK else ()))
        counts, colmax = barred[0], barred[1]
        words = barred[2:] if DK else None
        return (rfields, perm, a_idx, run_idx, bm_grp, nsteps, counts,
                colmax, words)

    def s_kernel(q, d2):
        out = _counts(q, d2)
        counts, colmax = out[6], out[7]
        return (counts.sum() + colmax[0]).astype(jnp.float32)

    S2_cap, CHUNK2 = _step_caps(RT + capacity // W2)
    # match traverse_rays_tiles_fixed's sizing (ray_tiles.py): capacity//4
    E2_cap = max(4096, capacity // 4)
    D_cap = min(max(8192, capacity // 2), E2_cap * R, 1 << 17) if DK else 0

    def s_rsort(q, d2):
        # regroup-front probe: the (SW,)-wide packing + compaction sort
        # only (the regroup's first half); delta vs `kernel` isolates it
        # from the R-wide expansion + decode split + leader grouping
        (rfields, perm, a_idx, run_idx, bm_grp, nsteps, counts, colmax,
         words) = _counts(q, d2)
        SW = run_idx.shape[0]
        Win = SW // a_idx.shape[0]
        rc = counts.reshape(SW, R)
        run_live = rc.max(axis=1) > 0
        rcc = jnp.minimum(rc, 255)
        bsel = jnp.asarray([1 << (8 * i) for i in range(4)], jnp.int32)
        cw = [(rcc[:, 4 * q2:4 * q2 + 4] * bsel[None, :]).sum(
            axis=1, dtype=jnp.int32) for q2 in range(R // 4)]
        okb = (colmax.reshape(SW, R) <= 2).astype(jnp.int32)
        okw = [(okb * (1 << jnp.arange(R, dtype=jnp.int32))[None, :]).sum(
            axis=1, dtype=jnp.int32)]
        slot = jnp.arange(SW, dtype=jnp.int32)
        key_u = jax.lax.bitcast_convert_type(
            jnp.where(run_live, slot, -1), jnp.uint32)
        tr = (jnp.repeat(a_idx, Win) << 16) | (run_idx & 0xFFFF)
        sorted_ops = jax.lax.sort(
            (key_u, tr, *bm_grp, *cw, *okw), num_keys=1)
        return sum(o[0].astype(jnp.float32) for o in sorted_ops)

    def _regroup(q, d2):
        (rfields, perm, a_idx, run_idx, bm_grp, nsteps, counts, colmax,
         words) = _counts(q, d2)
        regrouped = _regroup_emit_runs(
            a_idx, run_idx, bm_grp, counts, W2, S2_cap, E2_cap, T, R, NB,
            colmax=colmax, decode_k=DK, D_cap=D_cap)
        a_idx2, b_idx2, nsteps2 = regrouped[0], regrouped[1], regrouped[2]
        dec = regrouped[4] if DK else None
        return rfields, perm, a_idx2, b_idx2, nsteps2, words, dec

    def s_regroup(q, d2):
        rfields, perm, a_idx2, b_idx2, nsteps2, words, dec = _regroup(q, d2)
        dep = (a_idx2.sum().astype(jnp.float32) + b_idx2[0] +
               nsteps2.astype(jnp.float32))
        if DK:
            dep = dep + dec[3].astype(jnp.float32) + \
                dec[0].sum().astype(jnp.float32) * 1e-9
        return dep

    def _decode(q, d2):
        rfields, perm, a_idx2, b_idx2, nsteps2, words, dec = _regroup(q, d2)
        from implicitbvh_tpu.traverse.tiles import _moment_decode
        part0 = _moment_decode(words, *dec, G, DK, capacity)
        return rfields, perm, a_idx2, b_idx2, nsteps2, part0

    def s_decode(q, d2):
        out = _decode(q, d2)
        gi, gj, tot = out[-1]
        return gi.sum() + gj.sum() + tot.astype(jnp.float32)

    def _emit(q, d2):
        if DK:
            rfields, perm, a_idx2, b_idx2, nsteps2, part0 = _decode(q, d2)
            parts = [part0]
        else:
            rfields, perm, a_idx2, b_idx2, nsteps2, _w, _d = \
                _regroup(q, d2)
            parts = []
        for start in range(0, S2_cap, CHUNK2):
            ns_c = jnp.clip(nsteps2 - start, 0, CHUNK2)

            def emit_chunk(start=start, ns_c=ns_c):
                return tile_group_emit(
                    a_idx2[start:start + CHUNK2],
                    b_idx2[start * W2:(start + CHUNK2) * W2],
                    ns_c.reshape(1).astype(jnp.int32), rfields, fields,
                    mask_kind=mask_kind, G=G, W=W2,
                    ROW_CAP=alg.row_cap, CAP_PAIR=alg.pair_cap,
                    dedup=False, CAP=capacity, interpret=INTERP)

            gi_c, gj_c, tot_c, flags_c = jax.lax.cond(
                ns_c > 0, emit_chunk,
                lambda: (jnp.zeros((capacity,), jnp.float32),
                         jnp.zeros((capacity,), jnp.float32),
                         jnp.zeros((), jnp.int32),
                         jnp.zeros((), jnp.int32)))
            parts.append((gi_c, gj_c, tot_c))
        parts = jax.lax.optimization_barrier(parts)
        return perm, parts

    def s_emit(q, d2):
        perm, parts = _emit(q, d2)
        return sum(p[0].sum() + p[1].sum() +
                   p[2].astype(jnp.float32) for p in parts)

    def s_emitc(q, d2):
        # concat-only probe: forces the chunk stream buffers to
        # materialize (concat) without the merge's sort
        perm, parts = _emit(q, d2)
        gis = jnp.concatenate([p[0] for p in parts])
        gjs = jnp.concatenate([p[1] for p in parts])
        return (gis.sum() + gjs.sum() +
                sum(p[2].astype(jnp.float32) for p in parts))

    def _merge(q, d2):
        perm, parts = _emit(q, d2)
        gi_pos, gj_pos, total = _merge_streams(parts, capacity)
        return perm, gi_pos, gj_pos, total

    def s_merge(q, d2):
        perm, gi_pos, gj_pos, total = _merge(q, d2)
        return gi_pos.sum() + gj_pos.sum() + total.astype(jnp.float32)

    def s_finish(q, d2):
        perm, gi_pos, gj_pos, total = _merge(q, d2)
        iray_map = perm.astype(jnp.int32) + 1
        pad = RT * G - nrays
        if pad:
            iray_map = jnp.concatenate(
                [iray_map, jnp.zeros((pad,), jnp.int32)])
        total, contacts = _finish_contacts(
            gj_pos, gi_pos, total, bvh.leaves.index, None, capacity,
            leaf_index_b=iray_map, sort_pairs=False)
        return (total.astype(jnp.float32) +
                contacts.sum(dtype=jnp.int32).astype(jnp.float32) * 1e-9)

    def s_full(q, d2):
        total, contacts, ov, _nc = traverse_rays_tiles_fixed(
            bvh, q, d2, capacity, alg=alg)
        return (total.astype(jnp.float32) + ov.astype(jnp.float32) * 1e9 +
                contacts.sum(dtype=jnp.int32).astype(jnp.float32) * 1e-9)

    stages = [("sort", s_sort), ("phase1", s_phase1), ("kernel", s_kernel),
              ("rsort", s_rsort), ("regroup", s_regroup)] + \
        ([("decode", s_decode)] if DK else []) + \
        [("emit", s_emit), ("emitc", s_emitc),
         ("merge", s_merge), ("finish", s_finish), ("full", s_full)]
    import os
    sel = os.environ.get("STAGES")
    if sel:
        keep = set(sel.split(","))
        stages = [s for s in stages if s[0] in keep]
    prev = 0.0
    for name, fn in stages:
        ms = timed(fn, pr, dr)
        print(f"{name:10s} cumulative {ms:9.2f} ms   delta "
              f"{ms - prev:9.2f} ms", flush=True)
        prev = ms


if __name__ == "__main__":
    main()

