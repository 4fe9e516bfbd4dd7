"""BVH-vs-BVH traversal tests: differential vs brute force + self-consistency.

Port of reference coverage /root/reference/test/runtests.jl:936-1081.
"""

import numpy as np
import jax.numpy as jnp

import implicitbvh_tpu as ib
from implicitbvh_tpu.traverse import traverse, traverse_lvt_pair_fixed


def spheres(n, seed, scale=5.0):
    rng = np.random.default_rng(seed)
    xs = rng.random((n, 3), dtype=np.float32) * scale
    rs = (rng.random(n, dtype=np.float32) * 0.4 + 0.05).astype(np.float32)
    return xs, rs, ib.BSphere(jnp.asarray(xs), jnp.asarray(rs))


def brute_force_pair(xs1, rs1, xs2, rs2):
    d2 = ((xs1[:, None, :] - xs2[None, :, :]) ** 2).sum(-1)
    rr = (rs1[:, None] + rs2[None, :]) ** 2
    n1, n2 = len(rs1), len(rs2)
    return {(i + 1, j + 1) for i in range(n1) for j in range(n2)
            if d2[i, j] <= rr[i, j]}


def test_pair_differential():
    for (n1, n2, s1, s2) in ((50, 70, 0, 1), (70, 50, 2, 3), (5, 100, 4, 5)):
        xs1, rs1, sp1 = spheres(n1, s1)
        xs2, rs2, sp2 = spheres(n2, s2)
        bf = brute_force_pair(xs1, rs1, xs2, rs2)
        bvh1 = ib.build(sp1, ib.BBox)
        bvh2 = ib.build(sp2, ib.BBox)
        t = traverse(bvh1, bvh2)
        assert set(t.contacts_list()) == bf, (n1, n2)


def test_pair_contact_order_is_tree_order():
    # contacts are (index-in-bvh1, index-in-bvh2), NOT sorted pairs
    xs1 = np.array([[0, 0, 0.0]], np.float32)
    rs1 = np.array([1.0], np.float32)
    xs2 = np.array([[0, 0, 0.5], [9, 9, 9.0]], np.float32)
    rs2 = np.array([1.0, 0.1], np.float32)
    bvh1 = ib.build(ib.BSphere(jnp.asarray(xs1), jnp.asarray(rs1)), ib.BBox)
    bvh2 = ib.build(ib.BSphere(jnp.asarray(xs2), jnp.asarray(rs2)), ib.BBox)
    t = traverse(bvh1, bvh2)
    assert t.contacts_list() == [(1, 1)]


def test_pair_start_levels():
    xs1, rs1, sp1 = spheres(64, 0)
    xs2, rs2, sp2 = spheres(40, 9)
    bf = brute_force_pair(xs1, rs1, xs2, rs2)
    bvh1 = ib.build(sp1, ib.BBox)
    bvh2 = ib.build(sp2, ib.BBox)
    for sl1, sl2 in ((1, 1), (3, 2), (bvh1.tree.levels, bvh2.tree.levels)):
        t = traverse(bvh1, bvh2, start_level1=sl1, start_level2=sl2)
        assert set(t.contacts_list()) == bf, (sl1, sl2)


def test_pair_mixed_leaf_types_and_heights():
    # different tree heights + bvh2 larger (flip path)
    xs1, rs1, sp1 = spheres(10, 6)
    xs2, rs2, sp2 = spheres(150, 7)
    bf = brute_force_pair(xs1, rs1, xs2, rs2)
    t = traverse(ib.build(sp1, ib.BSphere), ib.build(sp2, ib.BSphere))
    assert set(t.contacts_list()) == bf


def test_self_consistency_single_vs_pair():
    # ref runtests.jl:936-1004: traverse(bvh) == traverse(bvh, bvh) modulo
    # (i, i) self-pairs and (j, i) symmetry
    xs, rs, sp = spheres(80, 11)
    bvh = ib.build(sp, ib.BBox)
    single = set(traverse(bvh).contacts_list())
    pair = set(traverse(bvh, bvh).contacts_list())
    pair_sym = {(min(i, j), max(i, j)) for (i, j) in pair if i != j}
    assert pair_sym == single
    # pair traversal of identical trees must contain all self-pairs
    assert {(i, i) for i in range(1, 81)} <= pair


def test_pair_narrow_predicate():
    xs1, rs1, sp1 = spheres(40, 13)
    xs2, rs2, sp2 = spheres(60, 14)
    bf = brute_force_pair(xs1, rs1, xs2, rs2)
    bf_narrow = {(i, j) for (i, j) in bf if (i + j) % 2 == 0}

    def narrow(l1, l2):
        return (l1.index + l2.index) % 2 == 0

    t = traverse(ib.build(sp1, ib.BBox), ib.build(sp2, ib.BBox),
                 narrow=narrow)
    assert set(t.contacts_list()) == bf_narrow
    # flip path must call narrow with (bvh1_leaf, bvh2_leaf) order
    t2 = traverse(ib.build(sp2, ib.BBox), ib.build(sp1, ib.BBox),
                  narrow=narrow)
    assert set(t2.contacts_list()) == {(j, i) for (i, j) in bf_narrow}


def test_pair_single_leaf_tree():
    # one BVH with a single leaf: mixed node/leaf checks
    xs1 = np.array([[2.0, 2.0, 2.0]], np.float32)
    rs1 = np.array([1.5], np.float32)
    xs2, rs2, sp2 = spheres(33, 15)
    bf = brute_force_pair(xs1, rs1, xs2, rs2)
    bvh1 = ib.build(ib.BSphere(jnp.asarray(xs1), jnp.asarray(rs1)), ib.BBox)
    bvh2 = ib.build(sp2, ib.BBox)
    t = traverse(bvh1, bvh2)
    assert set(t.contacts_list()) == bf


def test_pair_fixed_capacity_traced():
    import jax
    xs1, rs1, sp1 = spheres(50, 0)
    xs2, rs2, sp2 = spheres(70, 1)
    bf = brute_force_pair(xs1, rs1, xs2, rs2)

    @jax.jit
    def go(x1, r1, x2, r2):
        b1 = ib.build(ib.BSphere(x1, r1), ib.BBox)
        b2 = ib.build(ib.BSphere(x2, r2), ib.BBox)
        return traverse_lvt_pair_fixed(b1, b2, capacity=1024)

    tot, out = go(sp1.x, sp1.r, sp2.x, sp2.r)
    got = {tuple(map(int, r)) for r in np.asarray(out)[:int(tot)]}
    assert got == bf
