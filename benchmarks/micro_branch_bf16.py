#!/usr/bin/env python
"""Microbenchmarks gating the round-3 kernel design.

1. pl.when branch cost: a kernel whose steps evaluate K scalar-predicated
   blocks; sweeping K and the taken fraction isolates per-branch overhead
   (the banded contact kernel adds ~4 branches per tile pair).
2. bf16 VPU rate vs f32: the 11-op sphere mask in both dtypes — if Mosaic
   runs bf16 at 2x lane rate, a conservative bf16 mask + exact retest
   halves the dominant kernel cost (VERDICT round-2 item 3).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed_call(fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)  # warm + fetch
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        s = float(jnp.asarray(out).ravel()[0])
        best = min(best, time.time() - t0)
    return best, s


# ---------------------------------------------------------------------------
# 1. branch cost
# ---------------------------------------------------------------------------

def _branch_kernel(K, bm_ref, ns_ref, out_ref):
    s = pl.program_id(0)
    bm = bm_ref[s]
    out_ref[0, 0, :] = jnp.zeros((128,), jnp.float32)
    for k in range(K):
        @pl.when(((bm >> k) & 1) != 0)
        def _(k=k):
            out_ref[0, 0, :] = out_ref[0, 0, :] + float(k + 1)


@functools.partial(jax.jit, static_argnames=("K", "S"))
def branch_bench(bm, K: int, S: int):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S,),
        in_specs=[],
        out_specs=pl.BlockSpec((1, 1, 128), lambda s, *_: (s, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_branch_kernel, K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, 1, 128), jnp.float32),
    )(bm, jnp.ones((1,), jnp.int32))
    return out.sum()


def run_branch():
    S = 1 << 15
    rng = np.random.default_rng(0)
    for K, frac in [(1, 0.0), (8, 0.0), (32, 0.0), (8, 0.5), (32, 0.5),
                    (8, 1.0), (32, 1.0)]:
        nbits = rng.random((S, 32)) < frac
        bm = jnp.asarray(
            (nbits[:, :K] * (1 << np.arange(K))[None, :]).sum(1)
            .astype(np.int32))
        t, chk = timed_call(branch_bench, bm, K, S)
        print(f"branch K={K:3d} frac={frac:.1f}: {t*1e3:8.3f} ms "
              f"({t/S*1e9:7.1f} ns/step, {t/S/K*1e9:6.1f} ns/branch) "
              f"chk={chk}", flush=True)


# ---------------------------------------------------------------------------
# 2. bf16 vs f32 mask rate
# ---------------------------------------------------------------------------

def _mask_kernel(R, dtype, a_ref, b_ref, out_ref):
    a_blk = a_ref[:]                   # (8, G) dtype
    b_blk = b_ref[:]                   # (8, WG)
    one = jnp.float32(1e-7)
    # 16-bit lane->sublane reshape is unsupported in Mosaic: relayout the
    # a columns in f32, then cast down
    acols = [a_blk[k].astype(jnp.float32)[:, None].astype(dtype)
             for k in range(4)]

    def body(i, carry):
        # f32 loop carry: a bf16 carry fails Mosaic's scf.for legalization
        acc, bump = carry
        bump_d = bump.astype(dtype)
        a = [acols[k] + bump_d for k in range(4)]
        b = [b_blk[k][None, :] for k in range(4)]
        dx = a[0] - b[0]
        dy = a[1] - b[1]
        dz = a[2] - b[2]
        rr = a[3] + b[3]
        # Mosaic rejects bf16 vector compares: arithmetic in ``dtype``,
        # compare in f32
        lhs = (dx * dx + dy * dy + dz * dz).astype(jnp.float32)
        rhs = (rr * rr).astype(jnp.float32)
        m = lhs <= rhs
        acc = acc + jnp.sum(m.astype(jnp.float32))
        return acc, bump + one

    acc, _ = jax.lax.fori_loop(
        0, R, body, (jnp.float32(0), jnp.float32(0)))
    out_ref[0, 0] = acc


@functools.partial(jax.jit, static_argnames=("R", "dtype"))
def mask_bench(a, b, R: int, dtype):
    return pl.pallas_call(
        functools.partial(_mask_kernel, R, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(a, b)


def run_mask():
    G, WG, R = 128, 1024, 400
    rng = np.random.default_rng(1)
    a = rng.random((8, G)).astype(np.float32)
    b = rng.random((8, WG)).astype(np.float32)
    lane_ops = 11.0 * G * WG * R
    for dtype in (jnp.float32, jnp.bfloat16):
        aj = jnp.asarray(a, dtype)
        bj = jnp.asarray(b, dtype)
        t, chk = timed_call(mask_bench, aj, bj, R, dtype)
        print(f"mask {np.dtype(dtype).name:8s}: {t*1e3:8.3f} ms  "
              f"{lane_ops/t/1e12:6.2f} T lane-ops/s  chk={chk}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "branch"):
        run_branch()
    if which in ("all", "mask"):
        run_mask()
