#!/usr/bin/env python
"""Time the 1M BVH build with Default vs Extended Morton codes on-chip.

VERDICT r2 #10: the ExtendedMortonAlgorithm (ref src/morton/extended.jl,
Vinkler et al. HPG'17) has tested *quality* behavior but its traced
longest-axis schedule (a 32/64-step unrolled select loop at encode time)
was never timed at scale.  Chained timing (scalar fetch; block_until_ready
does not block through the tunnel); the build dep includes the node
aggregation so neither variant gets DCE'd.

Usage: ext_morton_1m.py [log2_n]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import implicitbvh_tpu as ib
from implicitbvh_tpu.morton import ExtendedMortonAlgorithm

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
        args2 = (jax.tree_util.tree_map(lambda x: x * f, args[0]),) + \
            args[1:]
        t0 = time.time()
        float(chained(*args2))
        best = min(best, (time.time() - t0) / K)
    return 1000.0 * best


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
    rng = np.random.default_rng(0)
    scale = float(n) ** (1.0 / 3.0)
    c = (rng.random((n, 3)) * scale).astype(np.float32)
    # non-cubic variant: the scene class extended codes exist for
    c_st = c * np.array([100.0, 1.0, 1.0], np.float32) / scale
    r = (rng.random(n) * 0.2 + 0.05).astype(np.float32)

    for name, cc in (("cubic", c), ("stretched-100:1", c_st)):
        xs = tuple(jnp.asarray(cc[:, k]) for k in range(3))
        sp = ib.BSphere(xs, jnp.asarray(r))

        def mk(opts):
            def f(s):
                bvh = ib.build(s, ib.BBox, options=opts)
                return (bvh.nodes.los[0].sum() +
                        bvh.leaves.volume.xs[0][0])
            return f

        t_def = timed(mk(ib.BVHOptions()), sp)
        t_ext = timed(mk(ib.BVHOptions(
            morton=ExtendedMortonAlgorithm(bits=32))), sp)
        print(f"{name}: n={n} build default={t_def:.2f} ms "
              f"extended={t_ext:.2f} ms", flush=True)

        # traverse-side effect: a better leaf order tightens tile AABBs,
        # cutting live band tests (num_checks) and the count-kernel time
        import math
        from implicitbvh_tpu.traverse import traverse_tiles_fixed
        from implicitbvh_tpu.traverse.tiles import _pair_capacity_for
        G = 128
        T = -(-n // G)
        pair_capacity = _pair_capacity_for(T)
        capacity = max(1 << math.ceil(math.log2(n)) - 3, 4096)

        def mk_full(opts):
            def f(s):
                bvh = ib.build(s, ib.BBox, options=opts)
                total, contacts, overflow, _nc = traverse_tiles_fixed(
                    bvh, capacity, pair_capacity=pair_capacity)
                return (total.astype(jnp.float32) +
                        overflow.astype(jnp.float32) * 1e9 +
                        contacts.sum(dtype=jnp.int32).astype(jnp.float32)
                        * 1e-9)
            return f

        def checks(opts):
            bvh = ib.build(sp, ib.BBox, options=opts)
            total, _c, ov, nc = traverse_tiles_fixed(
                bvh, capacity, pair_capacity=pair_capacity)
            return int(total), int(ov), int(nc)

        for mname, opts in (("default", ib.BVHOptions()),
                            ("extended", ib.BVHOptions(
                                morton=ExtendedMortonAlgorithm(bits=32)))):
            tot, ov, nc = checks(opts)
            t_full = timed(mk_full(opts), sp)
            print(f"{name}/{mname}: fused rebuild+contact {t_full:.2f} ms, "
                  f"{tot} contacts, overflow={ov}, "
                  f"num_checks {nc:,}", flush=True)


if __name__ == "__main__":
    main()
