"""Bounding volume geometry tests.

Port of reference coverage /root/reference/test/runtests.jl:181-468:
BSphere circumsphere cases (incl. collinear), BBox constructors, merges,
iscontact, and ray-box / ray-sphere predicates with degenerate directions.
"""

import numpy as np
import jax.numpy as jnp

from implicitbvh_tpu.volumes import (BBox, BSphere, bbox_from_triangles,
                                     bbox_of_bsphere, bbox_of_two_bspheres,
                                     bsphere_from_triangles, center,
                                     iscontact, isintersection,
                                     merge_bboxes, merge_bspheres)


def S(x, r):
    return BSphere(jnp.asarray(np.atleast_2d(np.asarray(x, np.float32))),
                   jnp.asarray(np.atleast_1d(np.float32(r))))


def B(lo, up):
    return BBox(jnp.asarray(np.atleast_2d(np.asarray(lo, np.float32))),
                jnp.asarray(np.atleast_2d(np.asarray(up, np.float32))))


def tri(p1, p2, p3, f):
    a = jnp.asarray(np.asarray([p1], np.float32))
    b = jnp.asarray(np.asarray([p2], np.float32))
    c = jnp.asarray(np.asarray([p3], np.float32))
    return f(a, b, c)


def test_bsphere_equilateral():
    # right-angle triangle in z=0: circumcenter at hypotenuse midpoint
    s = tri([0, 0, 0], [1, 0, 0], [0, 1, 0], bsphere_from_triangles)
    np.testing.assert_allclose(np.asarray(s.x)[0], [0.5, 0.5, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.r)[0], np.sqrt(0.5), atol=1e-6)


def test_bsphere_obtuse():
    # very obtuse triangle: minimal sphere is on the longest edge midpoint
    s = tri([0, 0, 0], [10, 0, 0], [5, 0.1, 0], bsphere_from_triangles)
    np.testing.assert_allclose(np.asarray(s.x)[0], [5.0, 0.0, 0.0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(s.r)[0], 5.0, atol=1e-4)


def test_bsphere_collinear():
    s = tri([0, 0, 0], [1, 1, 1], [2, 2, 2], bsphere_from_triangles)
    np.testing.assert_allclose(np.asarray(s.x)[0], [1.0, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.r)[0], np.sqrt(3.0), atol=1e-6)


def test_bsphere_all_points_inside():
    rng = np.random.default_rng(42)
    p = rng.random((50, 3, 3)).astype(np.float32)
    s = bsphere_from_triangles(jnp.asarray(p[:, 0]), jnp.asarray(p[:, 1]),
                               jnp.asarray(p[:, 2]))
    x = np.asarray(s.x)
    r = np.asarray(s.r)
    for k in range(3):
        d = np.linalg.norm(p[:, k] - x, axis=-1)
        assert (d <= r * (1 + 1e-4) + 1e-5).all()


def test_bbox_from_triangles():
    b = tri([0, 0, 0], [1, -1, 2], [0.5, 3, -0.5], bbox_from_triangles)
    np.testing.assert_allclose(np.asarray(b.lo)[0], [0, -1, -0.5])
    np.testing.assert_allclose(np.asarray(b.up)[0], [1, 3, 2])
    np.testing.assert_allclose(np.asarray(center(b))[0], [0.5, 1.0, 0.75])


def test_merge_spheres_enclosure():
    a = S([0, 0, 0], 1.0)
    b = S([0.1, 0, 0], 0.1)
    m = merge_bspheres(a, b)  # b inside a -> a
    np.testing.assert_allclose(np.asarray(m.x)[0], [0, 0, 0])
    np.testing.assert_allclose(np.asarray(m.r)[0], 1.0)
    m2 = merge_bspheres(b, a)
    np.testing.assert_allclose(np.asarray(m2.x)[0], [0, 0, 0])
    np.testing.assert_allclose(np.asarray(m2.r)[0], 1.0)


def test_merge_spheres_disjoint():
    a = S([0, 0, 0], 1.0)
    b = S([4, 0, 0], 1.0)
    m = merge_bspheres(a, b)
    np.testing.assert_allclose(np.asarray(m.x)[0], [2, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.r)[0], 3.0, atol=1e-6)


def test_merge_boxes():
    m = merge_bboxes(B([0, 0, 0], [1, 1, 1]), B([0.5, -1, 0], [2, 0.5, 3]))
    np.testing.assert_allclose(np.asarray(m.lo)[0], [0, -1, 0])
    np.testing.assert_allclose(np.asarray(m.up)[0], [2, 1, 3])


def test_bbox_of_two_bspheres_enclosure():
    # enclosure-aware: small sphere inside big one -> box of big only
    a = S([0, 0, 0], 2.0)
    b = S([0.5, 0, 0], 0.1)
    m = bbox_of_two_bspheres(a, b)
    np.testing.assert_allclose(np.asarray(m.lo)[0], [-2, -2, -2])
    np.testing.assert_allclose(np.asarray(m.up)[0], [2, 2, 2])
    # disjoint -> union of boxes
    c = S([5, 0, 0], 1.0)
    m2 = bbox_of_two_bspheres(a, c)
    np.testing.assert_allclose(np.asarray(m2.lo)[0], [-2, -2, -2])
    np.testing.assert_allclose(np.asarray(m2.up)[0], [6, 2, 2])


def test_iscontact():
    assert bool(iscontact(S([0, 0, 0], 1), S([1.5, 0, 0], 1))[0])
    assert not bool(iscontact(S([0, 0, 0], 1), S([2.5, 0, 0], 1))[0])
    # touching counts as contact
    assert bool(iscontact(S([0, 0, 0], 1), S([2.0, 0, 0], 1))[0])
    assert bool(iscontact(B([0, 0, 0], [1, 1, 1]), B([1, 1, 1], [2, 2, 2]))[0])
    assert not bool(iscontact(B([0, 0, 0], [1, 1, 1]),
                              B([1.1, 0, 0], [2, 1, 1]))[0])
    # mixed sphere/box via sphere AABB
    assert bool(iscontact(S([0, 0, 0], 1), B([0.9, -0.1, -0.1], [2, 1, 1]))[0])
    assert bool(iscontact(B([0.9, -0.1, -0.1], [2, 1, 1]), S([0, 0, 0], 1))[0])


def P(v):
    return jnp.asarray(np.asarray([v], np.float32))


def test_ray_box():
    b = B([0, 0, 0], [1, 1, 1])
    # hit straight through
    assert bool(isintersection(b, P([-1, 0.5, 0.5]), P([1, 0, 0]))[0])
    # pointing away: no forward hit
    assert not bool(isintersection(b, P([-1, 0.5, 0.5]), P([-1, 0, 0]))[0])
    # origin inside always hits
    assert bool(isintersection(b, P([0.5, 0.5, 0.5]), P([0, 0, 1]))[0])
    # miss
    assert not bool(isintersection(b, P([-1, 2, 0.5]), P([1, 0, 0]))[0])
    # axis-parallel with zero components (inf slabs)
    assert bool(isintersection(b, P([0.5, 0.5, -3]), P([0, 0, 1]))[0])
    assert not bool(isintersection(b, P([1.5, 0.5, -3]), P([0, 0, 1]))[0])
    # ref runtests.jl:327-378 cases: corner hits, inside-box, along-edge
    assert bool(isintersection(b, P([-1, -1, -1]), P([1, 1, 1]))[0])
    assert not bool(isintersection(b, P([-1, -1, -1]), P([-1, -1, -1]))[0])
    assert bool(isintersection(b, P([-1, -0.5, 0]), P([5, 3, 1.5]))[0])
    assert bool(isintersection(b, P([0.5, -0.5, 0.5]), P([0, 1, 0]))[0])
    assert not bool(isintersection(b, P([-1, -0.5, 0]), P([-5, -3, -1.5]))[0])
    assert bool(isintersection(b, P([0.5, 0.5, 0.5]), P([1, 1, 1]))[0])
    assert bool(isintersection(b, P([0.5, 0.5, 0.5]), P([-1, -1, -1]))[0])
    assert bool(isintersection(b, P([1e-8, 0, 0.5]), P([0, 1, 0]))[0])
    assert bool(isintersection(b, P([1e-8, -1, 1e-8]), P([0, 1, 0]))[0])
    # ray lying exactly in a face plane (0 * inf -> NaN slabs): the
    # reference's asymmetric min2/max2 reports no hit — we match it
    assert not bool(isintersection(b, P([-1, 0, 0]), P([1, 0, 0]))[0])


def test_ray_sphere():
    s = S([0, 0, 0], 1.0)
    assert bool(isintersection(s, P([-2, 0, 0]), P([1, 0, 0]))[0])
    assert not bool(isintersection(s, P([-2, 0, 0]), P([-1, 0, 0]))[0])
    # tangent
    assert bool(isintersection(s, P([-2, 1, 0]), P([1, 0, 0]))[0])
    # origin inside, any direction
    assert bool(isintersection(s, P([0.2, 0, 0]), P([0, 1, 0]))[0])
    # miss
    assert not bool(isintersection(s, P([-2, 1.1, 0]), P([1, 0, 0]))[0])


def test_ray_regression_flipped_directions():
    # ref runtests.jl:322-468 regression: flipped direction must not hit
    b = B([10, 10, 10], [11, 11, 11])
    p = P([0, 0, 0])
    d = P([1, 1, 1])
    assert bool(isintersection(b, p, d)[0])
    assert not bool(isintersection(b, p, -d)[0])
    s = S([10.5, 10.5, 10.5], 0.5)
    assert bool(isintersection(s, p, d)[0])
    assert not bool(isintersection(s, p, -d)[0])


def test_bbox_of_bsphere():
    m = bbox_of_bsphere(S([1, 2, 3], 0.5))
    np.testing.assert_allclose(np.asarray(m.lo)[0], [0.5, 1.5, 2.5])
    np.testing.assert_allclose(np.asarray(m.up)[0], [1.5, 2.5, 3.5])
