#!/usr/bin/env python
"""Sub-stage profile of phase 1 (tile fields -> grouped run lists) at 1M.

Cumulative-prefix chained timings (scalar fetch; block_until_ready does not
block through the tunnel) of the stages inside `_phase1_tile_runs` plus its
`_tiled_fields` front end, so stage deltas attribute the ~13-18 ms phase-1
cost.  First stage reads ~5 ms high (dispatch/fetch floor).

Usage: profile_phase1.py [log2N] [R] [count_w] [NB]
"""

import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import implicitbvh_tpu as ib
from implicitbvh_tpu.traverse.tiles import (
    SUPERPAIRS_PER_SUPERTILE, _compact_flat, _leader_group,
    _overlap, _pair_capacity_for, _run_chunk_cap, _step_caps, _tiled_fields)

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
    interp = jax.default_backend() == "cpu"
    n_tri = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    NB = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    rng = np.random.default_rng(0)
    scale = float(n_tri) ** (1.0 / 3.0)
    c = (rng.random((n_tri, 3)) * scale).astype(np.float32)
    e1 = (rng.random((n_tri, 3)) - 0.5).astype(np.float32) * 0.4
    e2 = (rng.random((n_tri, 3)) - 0.5).astype(np.float32) * 0.4

    def tup(a):
        return tuple(jnp.asarray(a[:, k]) for k in range(3))
    p1, p2, p3 = tup(c), tup(c + e1), tup(c + e2)

    G = 128
    T_tiles = -(-n_tri // G)
    P_cap = _pair_capacity_for(T_tiles)
    S_cap, CHUNK = _step_caps(P_cap // W + T_tiles)
    ch_cap = _run_chunk_cap(W, R, NB)
    if CHUNK > ch_cap:
        S_cap = -(-S_cap // ch_cap) * ch_cap
    pad_run = (-(-T_tiles // R) * R) // R
    SS = 32

    def front(q1, q2, q3):
        s = ib.bsphere_from_triangles(q1, q2, q3)
        bvh = ib.build(s, ib.BBox)
        return bvh

    def s_fields(q1, q2, q3):
        bvh = front(q1, q2, q3)
        fields, sphere, tile_lo, tile_up, sub_lo, sub_up, T = \
            _tiled_fields(bvh, G, NB)
        return (tile_lo[0].sum() + sub_lo[0][0, 0] + fields[0][0, 0])

    def _levelA(q1, q2, q3):
        bvh = front(q1, q2, q3)
        fields, sphere, tile_lo, tile_up, sub_lo, sub_up, T = \
            _tiled_fields(bvh, G, NB)
        S = -(-T // SS)
        pad = S * SS - T

        def padt(a, fill):
            if pad:
                a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
            return a
        tl = tuple(padt(cc, jnp.inf) for cc in tile_lo)
        tu = tuple(padt(cc, -jnp.inf) for cc in tile_up)
        sup_lo = tuple(cc.reshape(S, SS).min(1) for cc in tl)
        sup_up = tuple(cc.reshape(S, SS).max(1) for cc in tu)
        ovA = _overlap(sup_lo, sup_up, sup_lo, sup_up)
        ovA &= jax.lax.broadcasted_iota(jnp.int32, (S, S), 0) <= \
            jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        SP_cap = max(S * SUPERPAIRS_PER_SUPERTILE, 64, P_cap // 64)
        SP_cap = -(-SP_cap // 16) * 16
        kA = jnp.arange(S * S, dtype=jnp.int32)
        spacked, nsp = _compact_flat(ovA.reshape(-1), kA, SP_cap)
        si = spacked // S
        sj = spacked % S
        return (tile_lo, tile_up, sub_lo, sub_up, T, S, SP_cap, si, sj, nsp)

    def s_levelA(q1, q2, q3):
        (_, _, _, _, T, S, SP_cap, si, sj, nsp) = _levelA(q1, q2, q3)
        return si.sum().astype(jnp.float32) + sj[0] + nsp

    def _bits(q1, q2, q3):
        from implicitbvh_tpu.ops.subtile import subtile_band_bits
        (tile_lo, tile_up, sub_lo, sub_up, T, S, SP_cap, si, sj, nsp) = \
            _levelA(q1, q2, q3)
        bits = subtile_band_bits(
            sub_lo, sub_up, tile_lo, tile_up, si, sj,
            jnp.minimum(nsp, SP_cap).reshape(1).astype(jnp.int32),
            Ta=T, Tb=T, triangle=True, n_bands=NB,
            interpret=interp)[:, :, :SS]
        return bits, si, sj, T

    def s_bits(q1, q2, q3):
        bits, si, sj, T = _bits(q1, q2, q3)
        return bits.sum().astype(jnp.float32)

    def _words(q1, q2, q3):
        bits, si, sj, T = _bits(q1, q2, q3)
        SP_cap = bits.shape[0]
        NG = SS // R
        TPW = 32 // NB
        NW = R // TPW
        wts = jnp.asarray([1 << (NB * j) for j in range(TPW)], jnp.int32)
        words = (bits.reshape(SP_cap, SS, NG, NW, TPW) *
                 wts[None, None, None, None, :]).sum(-1)
        i_io = jax.lax.broadcasted_iota(jnp.int32, (SP_cap, SS, NG), 1)
        g_io = jax.lax.broadcasted_iota(jnp.int32, (SP_cap, SS, NG), 2)
        ti_t = si[:, None, None] * SS + i_io
        run_t = sj[:, None, None] * NG + g_io
        key = (ti_t << 13) | run_t
        wflat = [words[..., q].reshape(-1) for q in range(NW)]
        return key, wflat, T

    def s_words(q1, q2, q3):
        key, wflat, T = _words(q1, q2, q3)
        return key.sum().astype(jnp.float32) + wflat[0][0]

    def _sorted(q1, q2, q3):
        key, wflat, T = _words(q1, q2, q3)
        live = wflat[0] != 0
        for q in range(1, len(wflat)):
            live = live | (wflat[q] != 0)
        run_cap = max(min(S_cap * W, 16384), S_cap * W // 4)
        nruns = jnp.sum(live.astype(jnp.int32))
        key_u = jax.lax.bitcast_convert_type(
            jnp.where(live, key.reshape(-1), -1), jnp.uint32)
        sorted_ops = jax.lax.sort((key_u, *wflat), num_keys=1)
        key_i = jax.lax.bitcast_convert_type(
            sorted_ops[0][:run_cap], jnp.int32)
        words_s = tuple(w[:run_cap] for w in sorted_ops[1:])
        return key_i, words_s, nruns, run_cap

    def s_sort(q1, q2, q3):
        key_i, words_s, nruns, run_cap = _sorted(q1, q2, q3)
        return key_i.sum().astype(jnp.float32) + words_s[0][0] + nruns

    def _grouped(q1, q2, q3):
        key_i, words_s, nruns, run_cap = _sorted(q1, q2, q3)
        ti_r = (key_i >> 13) & 0xFFFF
        run_r = key_i & 0x1FFF
        rvalid = jnp.arange(run_cap, dtype=jnp.int32) < nruns
        a_idx, grouped, nsteps = _leader_group(
            ti_r, rvalid, (run_r, *words_s), (pad_run,) + (0,) * len(words_s),
            W, S_cap)
        return a_idx, grouped, nsteps

    def s_group(q1, q2, q3):
        a_idx, grouped, nsteps = _grouped(q1, q2, q3)
        return (a_idx.sum().astype(jnp.float32) + grouped[0][0] +
                nsteps.astype(jnp.float32))

    stages = [("fields", s_fields), ("levelA", s_levelA), ("bits", s_bits),
              ("words", s_words), ("sortslice", s_sort), ("group", s_group)]
    prev = 0.0
    for name, fn in stages:
        ms = timed(fn, p1, p2, p3)
        print(f"{name:10s} cumulative {ms:8.2f} ms   delta {ms - prev:8.2f} ms",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
