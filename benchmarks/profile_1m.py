#!/usr/bin/env python
"""Profile the 1M rebuild+self-contact pipeline stage by stage on the TPU.

Each stage is timed by chaining K iterations with data dependencies inside
one jit and fetching a dependent scalar (block_until_ready does not block
through the tunnel).  Stages are cumulative prefixes of the pipeline, so
stage_i_ms - stage_{i-1}_ms isolates each component.
"""

import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import implicitbvh_tpu as ib
from implicitbvh_tpu.traverse import TileTraversal, traverse_tiles_fixed
from implicitbvh_tpu.traverse.tiles import (
    _pair_capacity_for, _phase1_tile_runs, _regroup_emit_runs,
    _run_chunk_cap, _step_caps, _tiled_fields)
from implicitbvh_tpu.ops.tile_contact import tile_run_counts

K = 5
INTERP = None  # resolved from the backend in main()


def timed(fn, *args):
    """min-of-3 of (one jitted call chained K times) via scalar fetch."""
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
    n_tri = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
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
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    W2 = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    NB = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    CW = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    DK = int(sys.argv[6]) if len(sys.argv) > 6 else 0
    alg = TileTraversal(row_cap=4, pair_cap=32, run_r=R, emit_w=W2,
                        bands=NB, count_w=CW, decode_k=DK)

    def s_volumes(q1, q2, q3):
        s = ib.bsphere_from_triangles(q1, q2, q3)
        return s.xs[0].sum() + s.r.sum()

    def s_build(q1, q2, q3):
        # leaf-only dep: the tile pipeline never reads internal nodes, so
        # XLA DCEs the aggregation in the fused program — this stage
        # matches what `full` actually pays (encode + variadic sort)
        s = ib.bsphere_from_triangles(q1, q2, q3)
        bvh = ib.build(s, ib.BBox)
        return bvh.leaves.volume.xs[0].sum() + bvh.leaves.volume.r[0]

    def s_build_nodes(q1, q2, q3):
        s = ib.bsphere_from_triangles(q1, q2, q3)
        bvh = ib.build(s, ib.BBox)
        return bvh.nodes.los[0].sum() + bvh.leaves.volume.xs[0][0]

    W = CW
    T_tiles = -(-n_tri // G)
    S_cap, CHUNK = _step_caps(pair_capacity // W + T_tiles)
    ch_cap = _run_chunk_cap(W, R, NB)
    if CHUNK > ch_cap:
        CHUNK = ch_cap
        S_cap = -(-S_cap // CHUNK) * CHUNK
    pad_run = (-(-T_tiles // R) * R) // R

    def _front(q1, q2, q3):
        s = ib.bsphere_from_triangles(q1, q2, q3)
        bvh = ib.build(s, ib.BBox)
        fields, sphere, tile_lo, tile_up, sub_lo, sub_up, T_ = \
            _tiled_fields(bvh, G, NB)
        a_idx, run_idx, bm_grp, nsteps, num_checks, p1_over = \
            _phase1_tile_runs(tile_lo, tile_up, sub_lo, sub_up, G,
                              pair_capacity, W, S_cap, R, pad_run, NB)
        return bvh, fields, a_idx, run_idx, bm_grp, nsteps

    def s_phase1(q1, q2, q3):
        bvh, fields, a_idx, run_idx, bm_grp, nsteps = _front(q1, q2, q3)
        return (a_idx.sum().astype(jnp.float32) + run_idx[0] +
                bm_grp[0][0] + nsteps.astype(jnp.float32))

    def s_kernel(q1, q2, q3):
        bvh, fields, a_idx, run_idx, bm_grp, nsteps = _front(q1, q2, q3)
        dep = jnp.float32(0)
        for start in range(0, S_cap, CHUNK):
            ns_c = jnp.clip(nsteps - start, 0, CHUNK)

            def run_chunk(start=start, ns_c=ns_c):
                out = tile_run_counts(
                    a_idx[start:start + CHUNK],
                    run_idx[start * W:(start + CHUNK) * W],
                    tuple(w[start * W:(start + CHUNK) * W] for w in bm_grp),
                    ns_c.reshape(1).astype(jnp.int32), fields,
                    mask_kind="sphere", G=G, W=W, R=R, NB=NB, dedup=True,
                    interpret=INTERP, moments=bool(DK))
                return out[0] if DK else out

            cnts = jax.lax.cond(
                ns_c > 0, run_chunk,
                lambda: jnp.zeros((CHUNK * W * R,), jnp.int32))
            dep += cnts.sum().astype(jnp.float32)
        return dep

    def _counts(q1, q2, q3):
        bvh, fields, a_idx, run_idx, bm_grp, nsteps = _front(q1, q2, q3)
        cnt_parts = []
        for start in range(0, S_cap, CHUNK):
            ns_c = jnp.clip(nsteps - start, 0, CHUNK)

            def run_chunk(start=start, ns_c=ns_c):
                return tile_run_counts(
                    a_idx[start:start + CHUNK],
                    run_idx[start * W:(start + CHUNK) * W],
                    tuple(w[start * W:(start + CHUNK) * W] for w in bm_grp),
                    ns_c.reshape(1).astype(jnp.int32), fields,
                    mask_kind="sphere", G=G, W=W, R=R, NB=NB, dedup=True,
                    interpret=INTERP, with_colmax=not DK, moments=bool(DK))

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
        return bvh, fields, a_idx, run_idx, bm_grp, counts, colmax, words

    S2_cap, CHUNK2 = _step_caps(T_tiles + capacity // (8 * W2))
    E2_cap = max(4096, capacity // 8)
    D_cap = min(max(8192, capacity // 8), E2_cap * R, 1 << 17) if DK else 0

    def _regroup(q1, q2, q3):
        bvh, fields, a_idx, run_idx, bm_grp, counts, colmax, words = \
            _counts(q1, q2, q3)
        regrouped = _regroup_emit_runs(
            a_idx, run_idx, bm_grp, counts, W2, S2_cap, E2_cap,
            T_tiles, R, NB, colmax=colmax, decode_k=DK, D_cap=D_cap)
        a2, b2, ns2 = regrouped[0], regrouped[1], regrouped[2]
        dec = regrouped[4] if DK else None
        return bvh, fields, a2, b2, ns2, words, dec

    def s_regroup(q1, q2, q3):
        bvh, fields, a2, b2, ns2, words, dec = _regroup(q1, q2, q3)
        dep = (a2.sum().astype(jnp.float32) + b2[0] +
               ns2.astype(jnp.float32))
        if DK:
            dep = dep + dec[3].astype(jnp.float32) + \
                dec[0].sum().astype(jnp.float32) * 1e-9
        return dep

    def s_decode(q1, q2, q3):
        from implicitbvh_tpu.traverse.tiles import _moment_decode
        bvh, fields, a2, b2, ns2, words, dec = _regroup(q1, q2, q3)
        gi, gj, tot = _moment_decode(words, *dec, G, DK, capacity)
        return gi.sum() + gj.sum() + tot.astype(jnp.float32)

    def s_emit(q1, q2, q3):
        from implicitbvh_tpu.ops.tile_contact import tile_group_emit
        bvh, fields, a2, b2, ns2, words, dec = _regroup(q1, q2, q3)
        dep = jnp.float32(0)
        if DK:
            from implicitbvh_tpu.traverse.tiles import _moment_decode
            gi0, gj0, tot0 = _moment_decode(words, *dec, G, DK, capacity)
            dep += tot0.astype(jnp.float32) + gi0[0] + gj0[0]
        for start in range(0, S2_cap, CHUNK2):
            ns_c = jnp.clip(ns2 - start, 0, CHUNK2)
            gi_c, gj_c, tot_c, flags_c = tile_group_emit(
                a2[start:start + CHUNK2],
                b2[start * W2:(start + CHUNK2) * W2],
                ns_c.reshape(1).astype(jnp.int32), fields,
                mask_kind="sphere", G=G, W=W2, ROW_CAP=alg.row_cap,
                CAP_PAIR=alg.pair_cap, dedup=True, CAP=capacity,
                interpret=INTERP)
            dep += tot_c.astype(jnp.float32) + gi_c[0] + gj_c[0]
        return dep

    def s_full(q1, q2, q3):
        s = ib.bsphere_from_triangles(q1, q2, q3)
        bvh = ib.build(s, ib.BBox)
        total, contacts, overflow, _nc = traverse_tiles_fixed(
            bvh, capacity, alg=alg, pair_capacity=pair_capacity)
        return (total.astype(jnp.float32) +
                1e-9 * contacts.sum(dtype=jnp.int32).astype(jnp.float32))

    # correctness sanity before timing: totals must match the LVT walk
    # count and nothing may overflow (a TPU-only phase-1 cap overflow once
    # inflated counts 5x while every checksum-only timing looked fine)
    from implicitbvh_tpu.ops.tile_contact import ABLATE
    wrong = {"nomask", "emit_nomask", "emit_noslow", "emit_nofast",
             "emit_noappend"} & ABLATE
    if wrong:
        print(f"# WARNING: attribution run ({sorted(wrong)}) — results "
              "wrong by design, sanity skipped; only the targeted stage "
              "timing is meaningful", flush=True)
    else:
        s = ib.bsphere_from_triangles(p1, p2, p3)
        bvh = ib.build(s, ib.BBox)
        total, contacts, ov, _nc = traverse_tiles_fixed(
            bvh, capacity, alg=alg, pair_capacity=pair_capacity)
        assert int(ov) == 0, f"overflow bits {int(ov)}"
        import numpy as _np
        cl = _np.asarray(contacts[:int(total)])
        assert len(set(map(tuple, cl.tolist()))) == int(total), \
            "duplicate contacts"
        # num_checks = live mask bands x band size: divides the kernel stage
        # into mask-bound vs DMA/step-bound (VPU peak ~1e12 lane-ops/s)
        print(f"# sanity: {int(total)} unique contacts, no overflow, "
              f"num_checks {int(_nc):,} (~{int(_nc) * 16 / 1e9:.1f} ms at "
              f"16 lane-ops/test on a 1e12-op/s VPU)", flush=True)

    stages = [("volumes", s_volumes), ("build", s_build),
              ("phase1", s_phase1), ("kernel", s_kernel),
              ("regroup", s_regroup)] + \
        ([("decode", s_decode)] if DK else []) + \
        [("emit", s_emit), ("full", s_full)]
    # STAGES env var: comma-separated subset for lean A/B runs, e.g.
    # STAGES=phase1,kernel,full IBVH_ABLATE=nopb2 python profile_1m.py
    # (deltas are only meaningful between *adjacent selected* stages that
    # are also adjacent in the pipeline; `full` is always standalone).
    import os
    sel = os.environ.get("STAGES")
    if sel:
        keep = set(sel.split(","))
        stages = [st for st in stages if st[0] in keep]
    prev = 0.0
    for name, fn in stages:
        ms = timed(fn, p1, p2, p3)
        print(f"{name:10s} cumulative {ms:8.2f} ms   delta {ms - prev:8.2f} ms",
              flush=True)
        prev = ms
    if sel:
        return
    # out-of-chain: build including node aggregation (what a user pays if
    # they consume bvh.nodes — the tile pipeline itself does not)
    ms = timed(s_build_nodes, p1, p2, p3)
    print(f"build+nodes (out of chain) {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
