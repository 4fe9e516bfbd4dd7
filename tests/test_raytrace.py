"""Ray traversal tests: differential vs brute force.

Port of reference coverage /root/reference/test/runtests.jl:1086-1225
(analytic per-axis grids x 6 directions) plus randomized rays.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import implicitbvh_tpu as ib
from implicitbvh_tpu.raytrace import traverse_rays, traverse_rays_fixed


def brute_force_ray_sphere(xs, rs, p, d):
    """Reference-equivalent sphere hit sets (forward-only)."""
    hits = set()
    for k in range(p.shape[1]):
        for i in range(len(rs)):
            po = p[:, k] - xs[i]
            a = float(d[:, k] @ d[:, k])
            b = 2.0 * float(po @ d[:, k])
            c = float(po @ po) - rs[i] * rs[i]
            disc = b * b - 4 * a * c
            if disc >= 0 and (b <= 0 or c <= 0):
                hits.add((i + 1, k + 1))
    return hits


def test_axis_grid_rays():
    # spheres on a z line; rays from below pointing +z must hit all, rays
    # pointing -z must hit none
    xs = np.array([[0, 0, z] for z in range(5)], np.float32)
    rs = np.full(5, 0.4, np.float32)
    bvh = ib.build(ib.BSphere(jnp.asarray(xs), jnp.asarray(rs)), ib.BBox)
    p = np.array([[0.0], [0.0], [-5.0]], np.float32)
    d_up = np.array([[0.0], [0.0], [1.0]], np.float32)
    t = traverse_rays(bvh, p, d_up)
    got = set(t.contacts_list())
    assert got == {(i, 1) for i in range(1, 6)}
    t2 = traverse_rays(bvh, p, -d_up)
    assert t2.contacts_list() == []


def test_random_rays_differential():
    rng = np.random.default_rng(42)
    n, nrays = 100, 33
    xs = rng.random((n, 3)).astype(np.float32) * 5
    rs = (rng.random(n) * 0.3 + 0.05).astype(np.float32)
    p = (rng.random((3, nrays)).astype(np.float32) * 8 - 1.5)
    d = (rng.random((3, nrays)).astype(np.float32) - 0.5)
    bvh = ib.build(ib.BSphere(jnp.asarray(xs), jnp.asarray(rs)), ib.BBox)
    bf = brute_force_ray_sphere(xs, rs, p, d)
    t = traverse_rays(bvh, p, d)
    assert set(t.contacts_list()) == bf


def test_rays_start_level_and_sphere_nodes():
    rng = np.random.default_rng(1)
    n, nrays = 64, 16
    xs = rng.random((n, 3)).astype(np.float32) * 5
    rs = (rng.random(n) * 0.3 + 0.05).astype(np.float32)
    p = (rng.random((3, nrays)).astype(np.float32) * 8 - 1.5)
    d = (rng.random((3, nrays)).astype(np.float32) - 0.5)
    bf = brute_force_ray_sphere(xs, rs, p, d)
    bvh = ib.build(ib.BSphere(jnp.asarray(xs), jnp.asarray(rs)), ib.BSphere)
    for sl in (1, 3, bvh.tree.levels):
        t = traverse_rays(bvh, p, d, start_level=sl)
        assert set(t.contacts_list()) == bf, sl


def test_rays_narrow_predicate():
    xs = np.array([[0, 0, z] for z in range(5)], np.float32)
    rs = np.full(5, 0.4, np.float32)
    bvh = ib.build(ib.BSphere(jnp.asarray(xs), jnp.asarray(rs)), ib.BBox)
    p = np.array([[0.0], [0.0], [-5.0]], np.float32)
    d = np.array([[0.0], [0.0], [1.0]], np.float32)

    def narrow(leaf, pts, dirs):
        return leaf.index % 2 == 1  # odd leaf indices only

    t = traverse_rays(bvh, p, d, narrow=narrow)
    assert set(t.contacts_list()) == {(1, 1), (3, 1), (5, 1)}


def test_rays_fixed_capacity_traced():
    import jax
    xs = np.array([[0, 0, z] for z in range(5)], np.float32)
    rs = np.full(5, 0.4, np.float32)
    p = jnp.asarray(np.array([[0.0], [0.0], [-5.0]], np.float32))
    d = jnp.asarray(np.array([[0.0], [0.0], [1.0]], np.float32))

    @jax.jit
    def go(x, r, p, d):
        bvh = ib.build(ib.BSphere(x, r), ib.BBox)
        return traverse_rays_fixed(bvh, p, d, capacity=64)

    tot, out = go(jnp.asarray(xs), jnp.asarray(rs), p, d)
    assert int(tot) == 5


def test_rays_shape_validation():
    bvh = ib.build(ib.BSphere(jnp.zeros((2, 3)),
                              jnp.ones((2,))), ib.BBox)
    with pytest.raises(ValueError):
        traverse_rays(bvh, jnp.zeros((2, 4)), jnp.zeros((2, 4)))
    with pytest.raises(ValueError):
        traverse_rays(bvh, jnp.zeros((3, 4)), jnp.zeros((3, 5)))


def test_rays_empty_and_single_leaf():
    bvh = ib.build(ib.BSphere(jnp.zeros((2, 3)) + jnp.asarray([[0, 0, 0],
                                                               [0, 0, 9.0]]),
                              jnp.ones((2,))), ib.BBox)
    t = traverse_rays(bvh, jnp.zeros((3, 0)), jnp.zeros((3, 0)))
    assert int(t.num_contacts) == 0
    # single-leaf tree
    one = ib.build(ib.BSphere(jnp.zeros((1, 3)), jnp.ones((1,))), ib.BBox)
    p = np.array([[0.0], [0.0], [-5.0]], np.float32)
    d = np.array([[0.0], [0.0], [1.0]], np.float32)
    t = traverse_rays(one, p, d)
    assert t.contacts_list() == [(1, 1)]
