#!/usr/bin/env python
"""Mosaic acceptance + parity micro-test for a (BH, G) band-local
compaction (single-band emit fast-path candidate).

RESULT (2026-08-19, v5e): interpret-mode parity PASSES but Mosaic
CRASHES (remote-compile SIGABRT) on the minor-32 2D intermediates
((1, BH) row counts, (BH, BH) triangular matmul, (ROW_CAP, BH) jv) —
2D tensors with minor dim < 128 are off Mosaic's supported-layout path,
like the known minor-8 3D crash.  The single-band fast path was
abandoned in favor of the row_cap knob (the (ROW_CAP, G, G) onehot
dominates per-pair emit cost; rays measured row_cap 8 -> 2 below).
Kept as the regression probe for the layout limitation.
"""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def band_compact_vrows(G, BH, ROW_CAP, CAP_PAIR, mi):
    """(BH, G) band mask -> (1, CAP_PAIR) local (i, j) rows + over row.

    Same two-level scheme as _pair_compact_vrows with the row axis at BH:
    all contractions carry local indices < G (bf16-exact, DEFAULT
    precision).  Returns (i_row, j_row, over_row(1, BH)).
    """
    f32 = jnp.float32
    lane_g = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    sub_g = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
    ltri_g = jnp.where(sub_g > lane_g, 1.0, 0.0)          # (G, G)
    # within-row positions: (BH, G) @ (G, G) contracted over lanes
    row_pos = jax.lax.dot_general(
        mi, ltri_g, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)                        # (BH, G)
    ones_g = jnp.ones((1, G), f32)
    row_cnt = jax.lax.dot_general(
        ones_g, mi, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)                        # (1, BH)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (BH, BH), 1)
    sub_b = jax.lax.broadcasted_iota(jnp.int32, (BH, BH), 0)
    ltri_b = jnp.where(sub_b > lane_b, 1.0, 0.0)           # (BH, BH)
    row_off = jax.lax.dot_general(
        row_cnt, ltri_b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)                        # (1, BH)
    s_row = jax.lax.broadcasted_iota(jnp.int32, (ROW_CAP, BH, G), 0
                                     ).astype(f32)
    onehot = jnp.where(
        (row_pos[None, :, :] == s_row) & (mi[None, :, :] > 0), 1.0, 0.0)
    j_local = lane_g[:BH, :].astype(f32)                   # (BH, G)
    jv = jnp.sum(onehot * j_local[None, :, :], axis=2)     # (ROW_CAP, BH)
    k_col = jax.lax.broadcasted_iota(jnp.int32, (CAP_PAIR, BH), 0
                                     ).astype(f32)
    i_local = jax.lax.broadcasted_iota(jnp.int32, (1, BH), 1).astype(f32)
    acc_i = jnp.zeros((CAP_PAIR, BH), f32)
    acc_j = jnp.zeros((CAP_PAIR, BH), f32)
    for s in range(ROW_CAP):
        pos_s = row_off + float(s)
        valid_s = row_cnt > float(s)
        oh_s = jnp.where((pos_s == k_col) & valid_s, 1.0, 0.0)
        acc_i = acc_i + oh_s * i_local
        acc_j = acc_j + oh_s * jv[s:s + 1, :]
    ones_b = jnp.ones((1, BH), f32)
    i_row = jax.lax.dot_general(
        ones_b, acc_i, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)                        # (1, CAP_PAIR)
    j_row = jax.lax.dot_general(
        ones_b, acc_j, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    over_row = jnp.where(row_cnt > float(ROW_CAP), 1.0, 0.0)
    return i_row, j_row, over_row


def _kernel(G, BH, ROW_CAP, CAP_PAIR, m_ref, out_ref):
    mi = m_ref[0]                                          # (BH, G)
    i_row, j_row, over = band_compact_vrows(G, BH, ROW_CAP, CAP_PAIR, mi)
    if CAP_PAIR < 128:
        z = jnp.zeros((1, 128 - CAP_PAIR), jnp.float32)
        i_row = jnp.concatenate([i_row, z], axis=1)
        j_row = jnp.concatenate([j_row, z], axis=1)
    ob = jnp.concatenate(
        [over, jnp.zeros((1, 128 - BH), jnp.float32)], axis=1)
    out_ref[0] = jnp.concatenate([i_row, j_row, ob], axis=0)


def main():
    G, BH, ROW_CAP, CAP_PAIR = 128, 32, 8, 32
    P = 64
    rng = np.random.default_rng(0)
    # sparse masks (~2 contacts per band) + a couple of dense rows
    m = (rng.random((P, BH, G)) < 0.0005).astype(np.float32)
    m[3, 5, 17] = 1.0
    m[3, 5, 90] = 1.0
    m[7] = 0.0
    kern = functools.partial(_kernel, G, BH, ROW_CAP, CAP_PAIR)
    out = pl.pallas_call(
        kern,
        grid=(P,),
        in_specs=[pl.BlockSpec((1, BH, G), lambda p: (p, 0, 0))],
        out_specs=pl.BlockSpec((1, 3, 128), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((P, 3, 128), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(jnp.asarray(m))
    out = np.asarray(out)
    ok = True
    for p in range(P):
        got_i = out[p, 0]
        got_j = out[p, 1]
        ii, jj = np.nonzero(m[p])
        order = np.lexsort((jj, ii))  # row-major contact order
        ii, jj = ii[order], jj[order]
        cnt = min(len(ii), CAP_PAIR)
        if not (np.array_equal(got_i[:cnt], ii[:cnt].astype(np.float32))
                and np.array_equal(got_j[:cnt], jj[:cnt].astype(np.float32))):
            print(f"MISMATCH at pair {p}: got i {got_i[:cnt]} j "
                  f"{got_j[:cnt]} want i {ii[:cnt]} j {jj[:cnt]}")
            ok = False
    print("band compact micro:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
