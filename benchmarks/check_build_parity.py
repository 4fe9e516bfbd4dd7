#!/usr/bin/env python
"""On-chip bit-exactness check for the MXU selection-matmul aggregation.

`_aggregate_bbox_fast` splits even/odd lanes with a 0/1 selection matmul
at ``precision=HIGHEST`` (build.py).  On CPU that is an exact f32 matmul;
on the MXU it is bf16x6 passes, which must reconstruct f32 exactly for
x1/x0 products.  This drives a build on the real chip and compares every
node coordinate bit-for-bit against a plain reshape-min pyramid computed
in-process, over scenes that exercise virtual right children (non-power-
of-two N) and the max-finite pad sentinel.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

import implicitbvh_tpu as ib


def ref_nodes(box_los, box_ups, tree, built_level):
    """Reshape-min pyramid on host numpy (the pre-round-3 formulation)."""
    levels = tree.levels
    stacked = np.stack([*box_los, -box_ups[0], -box_ups[1], -box_ups[2]])
    full = 1 << (levels - 1)
    n = stacked.shape[1]
    if full > n:
        pad = np.full((6, full - n), np.finfo(stacked.dtype).max,
                      stacked.dtype)
        stacked = np.concatenate([stacked, pad], axis=1)
    per_level = {}
    c = stacked
    for lvl in range(levels - 1, max(built_level, 1) - 1, -1):
        c = c.reshape(6, -1, 2).min(-1)
        per_level[lvl] = c[:, :tree.level_nodes(lvl)]
    chunks = [per_level[lvl] for lvl in range(1, levels)
              if lvl in per_level]
    return np.concatenate(chunks, axis=1) if chunks else stacked[:, :0]


def main():
    rng = np.random.default_rng(3)
    for n in (5000, 4096, 37):
        scale = float(n) ** (1.0 / 3.0)
        c = (rng.random((n, 3)) * scale).astype(np.float32)
        r = (rng.random(n) * 0.2 + 0.05).astype(np.float32)
        xs = tuple(jnp.asarray(c[:, k]) for k in range(3))
        bvh = ib.build(ib.BSphere(xs, jnp.asarray(r)), ib.BBox)
        # recompute the reference pyramid from the SORTED leaves
        blos = tuple(np.asarray(bvh.leaves.volume.xs[k]) -
                     np.asarray(bvh.leaves.volume.r) for k in range(3))
        bups = tuple(np.asarray(bvh.leaves.volume.xs[k]) +
                     np.asarray(bvh.leaves.volume.r) for k in range(3))
        want = ref_nodes(blos, bups, bvh.tree, 1)
        got = np.stack([np.asarray(v) for v in bvh.nodes.los] +
                       [-np.asarray(v) for v in bvh.nodes.ups])
        if got.shape != want.shape:
            print(f"n={n}: SHAPE MISMATCH {got.shape} vs {want.shape}")
            sys.exit(1)
        bad = np.sum(got != want)
        if bad:
            idx = np.argwhere(got != want)[:5]
            print(f"n={n}: {bad} node coords differ, first {idx.tolist()}")
            print("got", got[tuple(idx[0])], "want", want[tuple(idx[0])])
            sys.exit(1)
        print(f"n={n}: {got.shape[1]} nodes bit-exact", flush=True)
    print("BUILD PARITY OK", flush=True)


if __name__ == "__main__":
    main()
