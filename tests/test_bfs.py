"""BFS traversal tests + cross-algorithm equivalence.

Port of reference coverage: BFS differential tests and the BFS-vs-LVT
equivalence with a nontrivial narrow predicate
(/root/reference/test/runtests.jl:839-900, 1230-1270).
"""

import numpy as np
import jax.numpy as jnp

import implicitbvh_tpu as ib
from implicitbvh_tpu.traverse import BFSTraversal, LVTTraversal, traverse
from implicitbvh_tpu.raytrace import traverse_rays


def spheres(n, seed, scale=5.0):
    rng = np.random.default_rng(seed)
    xs = rng.random((n, 3), dtype=np.float32) * scale
    rs = (rng.random(n, dtype=np.float32) * 0.4 + 0.05).astype(np.float32)
    return xs, rs, ib.BSphere(jnp.asarray(xs), jnp.asarray(rs))


def brute_force(xs, rs):
    n = len(rs)
    d2 = ((xs[:, None, :] - xs[None, :, :]) ** 2).sum(-1)
    rr = (rs[:, None] + rs[None, :]) ** 2
    return {(i + 1, j + 1) for i in range(n) for j in range(i + 1, n)
            if d2[i, j] <= rr[i, j]}


def test_bfs_readme_demo():
    xs = np.array([[0, 0, 0], [0, 0, 1], [0, 0, 2], [0, 0, 3], [0, 0, 4]],
                  np.float32)
    rs = np.array([0.5, 0.6, 0.5, 0.4, 0.6], np.float32)
    bvh = ib.build(ib.BSphere(jnp.asarray(xs), jnp.asarray(rs)), ib.BBox)
    t = traverse(bvh, BFSTraversal())
    assert sorted(t.contacts_list()) == [(1, 2), (2, 3), (4, 5)]
    assert t.num_checks > 0


def test_bfs_differential():
    xs, rs, sp = spheres(166, 42)
    bf = brute_force(xs, rs)
    bvh = ib.build(sp, ib.BBox)
    for sl in (1, 4, bvh.tree.levels):
        t = traverse(bvh, BFSTraversal(), start_level=sl)
        assert set(t.contacts_list()) == bf, sl


def test_bfs_sphere_nodes():
    xs, rs, sp = spheres(100, 3)
    bf = brute_force(xs, rs)
    t = traverse(ib.build(sp, ib.BSphere), BFSTraversal())
    assert set(t.contacts_list()) == bf


def test_bfs_lvt_equivalence_with_narrow():
    # both algorithms must produce identical sorted contact lists under a
    # nontrivial narrow predicate (ref runtests.jl:1230-1270)
    xs, rs, sp = spheres(150, 8)

    def narrow(l1, l2):
        return (l1.index * 7 + l2.index * 3) % 5 != 0

    bvh = ib.build(sp, ib.BBox)
    t_bfs = traverse(bvh, BFSTraversal(), narrow=narrow)
    t_lvt = traverse(bvh, LVTTraversal(), narrow=narrow)
    assert sorted(t_bfs.contacts_list()) == sorted(t_lvt.contacts_list())


def test_bfs_pair_differential():
    xs1, rs1, sp1 = spheres(60, 0)
    xs2, rs2, sp2 = spheres(45, 1)
    d2 = ((xs1[:, None, :] - xs2[None, :, :]) ** 2).sum(-1)
    rr = (rs1[:, None] + rs2[None, :]) ** 2
    bf = {(i + 1, j + 1) for i in range(60) for j in range(45)
          if d2[i, j] <= rr[i, j]}
    b1, b2 = ib.build(sp1, ib.BBox), ib.build(sp2, ib.BBox)
    t = traverse(b1, b2, BFSTraversal())
    assert set(t.contacts_list()) == bf
    # unequal heights, both orders (exercises phases B and C)
    t2 = traverse(b2, b1, BFSTraversal())
    assert set(t2.contacts_list()) == {(j, i) for (i, j) in bf}


def test_bfs_pair_leaf_level_tree():
    # bvh2 is a single leaf -> phase D (node-vs-leaf descent)
    xs1, rs1, sp1 = spheres(33, 5)
    xs2 = np.array([[2.5, 2.5, 2.5]], np.float32)
    rs2 = np.array([1.0], np.float32)
    d2 = ((xs1 - xs2[0]) ** 2).sum(-1)
    bf = {(i + 1, 1) for i in range(33) if d2[i] <= (rs1[i] + 1.0) ** 2}
    b1 = ib.build(sp1, ib.BBox)
    b2 = ib.build(ib.BSphere(jnp.asarray(xs2), jnp.asarray(rs2)), ib.BBox)
    t = traverse(b1, b2, BFSTraversal())
    assert set(t.contacts_list()) == bf
    # flipped (phase E)
    t2 = traverse(b2, b1, BFSTraversal())
    assert set(t2.contacts_list()) == {(1, i) for (i, _) in bf}


def test_bfs_rays_differential():
    rng = np.random.default_rng(9)
    xs, rs, sp = spheres(64, 10)
    p = (rng.random((3, 20)).astype(np.float32) * 8 - 1.5)
    d = (rng.random((3, 20)).astype(np.float32) - 0.5)
    bvh = ib.build(sp, ib.BBox)
    t_lvt = traverse_rays(bvh, p, d, LVTTraversal())
    t_bfs = traverse_rays(bvh, p, d, BFSTraversal())
    assert sorted(t_bfs.contacts_list()) == sorted(t_lvt.contacts_list())


def test_bfs_overflow_growth():
    # tiny min_capacity forces the growth loop to re-run with bigger buffers
    xs, rs, sp = spheres(120, 12, scale=2.0)  # dense -> many contacts
    bf = brute_force(xs, rs)
    opts = ib.BVHOptions(min_capacity=8)
    bvh = ib.build(sp, ib.BBox, options=opts)
    t = traverse(bvh, BFSTraversal(), options=opts)
    assert set(t.contacts_list()) == bf
