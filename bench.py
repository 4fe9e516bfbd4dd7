#!/usr/bin/env python
"""Benchmark: full rebuild + self-contact traversal of a 1M-triangle mesh
on one TPU chip (BASELINE.json north star: < 10 ms).

Pipeline per step (the moving-geometry simulation loop, BASELINE config 5):
triangles -> BSphere leaves -> Morton encode -> sort -> aggregate ->
tile self-contact traversal — all in one jitted program.

Prints ONE JSON line:
  {"metric": ..., "value": <ms>, "unit": "ms", "vs_baseline": <target/value>}
(vs_baseline >= 1 means the 10 ms target is met).

Timing note: through the TPU tunnel ``block_until_ready`` does not actually
block, so steps are chained with data dependencies inside one jit and timed
by fetching a dependent scalar to host.
"""

import json
import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import implicitbvh_tpu as ib
from implicitbvh_tpu.traverse import TileTraversal, traverse_tiles_fixed
from implicitbvh_tpu.traverse.tiles import _pair_capacity_for


TARGET_MS = 10.0
K_CHAIN = 5


def synth_triangles(n_tri: int, seed: int = 0):
    """Random triangle soup at ~unit density (contact-rich, dragon-like).

    Vertices are returned as coordinate 3-tuples of (N,) arrays — the
    TPU-native SoA layout ((N, 3) device arrays pad their lane dim 3->128,
    and slicing them back out costs ~6 ms at 1M)."""
    rng = np.random.default_rng(seed)
    scale = float(n_tri) ** (1.0 / 3.0)
    c = (rng.random((n_tri, 3)) * scale).astype(np.float32)
    e1 = (rng.random((n_tri, 3)) - 0.5).astype(np.float32) * 0.4
    e2 = (rng.random((n_tri, 3)) - 0.5).astype(np.float32) * 0.4
    def tup(a):
        return tuple(jnp.asarray(a[:, k]) for k in range(3))
    return tup(c), tup(c + e1), tup(c + e2)


def main():
    on_cpu = jax.default_backend() == "cpu"
    n_tri = 1 << 14 if on_cpu else 1 << 20  # CPU fallback keeps this runnable

    p1, p2, p3 = synth_triangles(n_tri)

    G = 128
    T = -(-n_tri // G)
    pair_capacity = _pair_capacity_for(T)
    # right-sized contact capacity (~2.3x the measured 57.9k contacts at 1M;
    # overflow is checked and reported) — extraction cost scales with it
    capacity = max(1 << math.ceil(math.log2(n_tri)) - 3, 4096)
    alg = TileTraversal(row_cap=4, pair_cap=32)

    def step(q1, q2, q3):
        spheres = ib.bsphere_from_triangles(q1, q2, q3)
        bvh = ib.build(spheres, ib.BBox)
        total, contacts, overflow, _nc = traverse_tiles_fixed(
            bvh, capacity, alg=alg, pair_capacity=pair_capacity)
        # consume the contact buffer so no stage can be dead-code-eliminated
        checksum = contacts.sum(dtype=jnp.int32)
        return total, overflow, checksum

    @jax.jit
    def chained(q1, q2, q3):
        def body(i, carry):
            q1, acc = carry
            total, overflow, checksum = step(q1, q2, q3)
            dep = (total.astype(jnp.float32) + overflow.astype(jnp.float32)
                   + 1e-9 * checksum.astype(jnp.float32))
            return (tuple(x + 1e-12 * dep for x in q1), acc + dep)
        _, acc = jax.lax.fori_loop(0, K_CHAIN, body, (q1, jnp.float32(0)))
        return acc

    # correctness/overflow sanity + warm-up compile
    total, overflow, _ = jax.jit(step)(p1, p2, p3)
    n_contacts = int(total)
    if bool(overflow):
        print(json.dumps({"metric": "1M-tri rebuild+self-contact",
                          "value": -1.0, "unit": "ms", "vs_baseline": 0.0,
                          "error": "capacity overflow"}))
        return
    print(f"# {n_tri} triangles, {n_contacts} contacts", file=sys.stderr)

    float(chained(p1, p2, p3))  # warm
    best = float("inf")
    for trial in range(3):
        q1 = tuple(x * jnp.float32(1.0 + 1e-7 * (trial + 1)) for x in p1)
        t0 = time.time()
        float(chained(q1, p2, p3))  # fetch forces completion
        best = min(best, (time.time() - t0) / K_CHAIN)

    ms = 1000.0 * best
    metric = ("1M-tri mesh rebuild+self-contact per step"
              if not on_cpu else
              f"{n_tri}-tri rebuild+self-contact per step (cpu fallback)")
    print(json.dumps({"metric": metric, "value": round(ms, 3), "unit": "ms",
                      "vs_baseline": round(TARGET_MS / ms, 4)}))


if __name__ == "__main__":
    main()
