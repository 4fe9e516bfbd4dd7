"""Self-contact traversal tests: golden demo + randomized differential.

Port of reference coverage /root/reference/test/runtests.jl:596-900.
Kept deliberately lean on distinct (N, start_level) combinations: every
combination is a fresh XLA compile and this host has one core.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import implicitbvh_tpu as ib
from implicitbvh_tpu.traverse import (LVTTraversal, traverse,
                                      traverse_lvt_single_fixed)


def demo_spheres():
    xs = np.array([[0, 0, 0], [0, 0, 1], [0, 0, 2], [0, 0, 3], [0, 0, 4]],
                  np.float32)
    rs = np.array([0.5, 0.6, 0.5, 0.4, 0.6], np.float32)
    return ib.BSphere(jnp.asarray(xs), jnp.asarray(rs))


def random_spheres(n, seed=42, scale=5.0):
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


def test_readme_demo():
    # BASELINE config 1: exact parity with the reference README demo
    # (ref README.md:53, build.jl doctest)
    bvh = ib.build(demo_spheres(), ib.BBox)
    t = traverse(bvh)
    assert t.contacts_list() == [(1, 2), (2, 3), (4, 5)]


def test_readme_demo_explicit_alg():
    bvh = ib.build(demo_spheres(), ib.BBox)
    t = traverse(bvh, LVTTraversal())
    assert t.contacts_list() == [(1, 2), (2, 3), (4, 5)]


@pytest.mark.parametrize("node_kind", [ib.BBox, ib.BSphere])
def test_differential_vs_brute_force(node_kind):
    for n, seed in ((3, 0), (17, 1), (100, 2), (166, 42)):
        xs, rs, spheres = random_spheres(n, seed)
        bf = brute_force(xs, rs)
        bvh = ib.build(spheres, node_kind)
        t = traverse(bvh)
        assert set(t.contacts_list()) == bf, (n, seed)


def test_differential_start_levels():
    xs, rs, spheres = random_spheres(166)
    bf = brute_force(xs, rs)
    bvh = ib.build(spheres, ib.BBox)
    for sl in (1, 3, bvh.tree.levels - 1, bvh.tree.levels):
        t = traverse(bvh, start_level=sl)
        assert set(t.contacts_list()) == bf, sl


def test_tile_engine_warns_on_explicit_start_level():
    """The tile engine does not walk the tree, so a user-set start_level
    must warn instead of dying silently (it used to validate-then-ignore)."""
    from implicitbvh_tpu.traverse.tiles import TileTraversal
    xs, rs, spheres = random_spheres(100, seed=9)
    bvh = ib.build(spheres, ib.BBox)
    with pytest.warns(UserWarning, match="start_level has no effect"):
        t = traverse(bvh, TileTraversal(), start_level=2)
    assert set(t.contacts_list()) == brute_force(xs, rs)
    with pytest.warns(UserWarning, match="no effect on the dense-tile"):
        traverse(bvh, ib.build(spheres, ib.BBox), TileTraversal(),
                 start_level1=2)


def test_differential_built_level():
    xs, rs, spheres = random_spheres(100, seed=7)
    bf = brute_force(xs, rs)
    bvh = ib.build(spheres, ib.BBox, built_level=3)
    # traversal must start at or below built_level
    t = traverse(bvh, start_level=3)
    assert set(t.contacts_list()) == bf
    with pytest.raises(ValueError):
        traverse(bvh, start_level=1)


def test_narrow_predicate():
    # Only keep contacts whose user indices differ by more than 1
    xs, rs, spheres = random_spheres(100, seed=3)
    bf = brute_force(xs, rs)
    bf_narrow = {(i, j) for (i, j) in bf if j - i > 1}

    def narrow(l1, l2):
        return jnp.abs(l1.index - l2.index) > 1

    bvh = ib.build(spheres, ib.BBox)
    t = traverse(bvh, narrow=narrow)
    assert set(t.contacts_list()) == bf_narrow


def test_fixed_capacity_traced():
    import jax
    xs, rs, spheres = random_spheres(100, seed=11)
    bf = brute_force(xs, rs)

    @jax.jit
    def step(x, r):
        bvh = ib.build(ib.BSphere(x, r), ib.BBox)
        return traverse_lvt_single_fixed(bvh, capacity=1024)

    total, out = step(spheres.x, spheres.r)
    total = int(total)
    assert total == len(bf)
    got = {tuple(map(int, row)) for row in np.asarray(out)[:total]}
    assert got == bf


def test_fixed_capacity_overflow_keeps_prefix():
    xs, rs, spheres = random_spheres(100, seed=11)
    bf = brute_force(xs, rs)
    bvh = ib.build(spheres, ib.BBox)
    cap = max(len(bf) // 2, 1)
    total, out = traverse_lvt_single_fixed(bvh, capacity=cap)
    assert int(total) == len(bf)  # total is exact even when buffer overflows
    got = {tuple(map(int, row)) for row in np.asarray(out)}
    assert got <= bf  # written prefix is all real contacts


def test_single_leaf_no_contacts():
    bvh = ib.build(ib.BSphere(jnp.zeros((1, 3)), jnp.ones((1,))), ib.BBox)
    t = traverse(bvh)
    assert int(t.num_contacts) == 0
    assert t.contacts_list() == []


def test_two_overlapping():
    s = ib.BSphere(jnp.asarray(np.array([[0, 0, 0], [0, 0, 1.0]], np.float32)),
                   jnp.asarray(np.array([0.6, 0.6], np.float32)))
    bvh = ib.build(s, ib.BBox)
    t = traverse(bvh)
    assert t.contacts_list() == [(1, 2)]


def test_custom_indices_reported():
    opts = ib.BVHOptions()
    leaves = ib.wrap_bounding_volumes(
        demo_spheres(), opts, indices=jnp.asarray([7, 9, 11, 13, 15]))
    bvh = ib.build(leaves, ib.BBox, options=opts)
    t = traverse(bvh)
    assert t.contacts_list() == [(7, 9), (9, 11), (13, 15)]


def test_fractional_built_level_traversal():
    xs, rs, spheres = random_spheres(100, seed=21)
    bf = brute_force(xs, rs)
    bvh = ib.build(spheres, ib.BBox, built_level=0.5)
    t = traverse(bvh, start_level=max(1, bvh.built_level))
    assert set(t.contacts_list()) == bf
