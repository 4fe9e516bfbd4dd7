#!/usr/bin/env python
"""End-to-end u64 Morton ((hi, lo) uint32 fallback) + int64 indices on the
real TPU backend (VERDICT round-1 weak #8: these paths were CPU-x64-only).

Builds and traverses the same scene with
  (a) 32-bit Morton codes + int32 indices (baseline),
  (b) 64-bit Morton codes + int64 indices (on TPU: the (hi, lo) two-key
      sort fallback, morton.py _split3_21bit_hi_lo),
and asserts identical contact sets.  Run:
  env PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tpu_u64_check.py
"""

import numpy as np
import jax
import jax.numpy as jnp

import implicitbvh_tpu as ib
from implicitbvh_tpu.options import BVHOptions
from implicitbvh_tpu.morton import DefaultMortonAlgorithm


def main():
    print("backend:", jax.default_backend())
    n = 1 << 15
    rng = np.random.default_rng(7)
    scale = float(n) ** (1 / 3)
    c = (rng.random((n, 3)) * scale).astype(np.float32)
    xs = tuple(jnp.asarray(c[:, k]) for k in range(3))
    vol = ib.BSphere(xs, jnp.full((n,), 0.3, jnp.float32))

    def run(bits, index_bits):
        opts = BVHOptions(index_bits=index_bits,
                          morton=DefaultMortonAlgorithm(bits=bits))
        bvh = ib.build(vol, ib.BBox, options=opts)
        morton = bvh.leaves.morton
        kind = ("(hi,lo) u32 pair" if isinstance(morton, tuple)
                else str(morton.dtype))
        from implicitbvh_tpu.traverse.tiles import TileTraversal
        t = ib.traverse(bvh, TileTraversal(row_cap=8, pair_cap=64))
        return sorted(map(tuple, t.contacts_list())), kind, bvh

    base, kind32, _ = run(32, 32)
    wide, kind64, bvh64 = run(64, 64)
    print(f"u32 path: {len(base)} contacts, morton {kind32}")
    print(f"u64 path: {len(wide)} contacts, morton {kind64}, "
          f"index dtype {bvh64.leaves.index.dtype}")
    assert base == wide, "contact sets differ between u32 and u64 paths"
    # 16-bit codes too (coarse quantization -> same contact set, tile pass
    # tests exact volumes regardless of code width)
    narrow16, kind16, _ = run(16, 32)
    assert narrow16 == base, "u16 Morton path diverged"
    print(f"u16 path: {len(narrow16)} contacts, morton {kind16}")
    print("OK: u16/u32/u64 Morton and int32/int64 index paths agree on-device")


if __name__ == "__main__":
    main()
