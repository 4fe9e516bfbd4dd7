"""Bounding volumes: SoA bounding spheres and axis-aligned boxes.

TPU-native counterpart of the reference geometry core
(/root/reference/src/bounding_volumes/): ``BSphere``/``BBox`` structs,
triangle constructors, the merge monoid, overlap predicates and ray
intersection tests.

Design departure: the reference stores AoS ``Vector{BSphere{T}}``; here a
``BSphere`` is a *batched structure-of-arrays* pytree — ``x: (..., 3)``,
``r: (...)`` — so every constructor/predicate is a dense vectorized op over
the batch dimension(s).  Scalar volumes are just the ``()``-batch case.
Branches in the reference (circumsphere cases, enclosure-aware merges) become
``jnp.where`` selections, which the VPU executes branch-free.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp

from .utils import dist3, dist3sq, dot3


class BSphere(NamedTuple):
    """Bounding sphere; ref /root/reference/src/bounding_volumes/bsphere.jl:26-142."""

    x: jnp.ndarray  # (..., 3) center
    r: jnp.ndarray  # (...)    radius

    @property
    def dtype(self):
        return self.x.dtype

    @property
    def batch_shape(self):
        return self.r.shape

    def __getitem__(self, idx):
        return BSphere(self.x[idx], self.r[idx])


class BBox(NamedTuple):
    """Axis-aligned box; ref /root/reference/src/bounding_volumes/bbox.jl:35-102."""

    lo: jnp.ndarray  # (..., 3)
    up: jnp.ndarray  # (..., 3)

    @property
    def dtype(self):
        return self.lo.dtype

    @property
    def batch_shape(self):
        return self.lo.shape[:-1]

    def __getitem__(self, idx):
        return BBox(self.lo[idx], self.up[idx])


Volume = Union[BSphere, BBox]


def center(v: Volume):
    """Geometric center, shape (..., 3); ref bsphere.jl:142, bbox.jl:100-102."""
    if isinstance(v, BSphere):
        return v.x
    return 0.5 * (v.lo + v.up)


# --------------------------------------------------------------------------
# Constructors from triangles (vectorized over a leading batch dim)
# --------------------------------------------------------------------------

def bbox_from_triangles(p1, p2, p3) -> BBox:
    """AABBs of triangles given three (..., 3) vertex arrays.

    Ref: src/bounding_volumes/bbox.jl:59-70.
    """
    lo = jnp.minimum(jnp.minimum(p1, p2), p3)
    up = jnp.maximum(jnp.maximum(p1, p2), p3)
    return BBox(lo, up)


def bsphere_from_triangles(p1, p2, p3) -> BSphere:
    """Minimal bounding spheres of triangles given three (..., 3) vertex arrays.

    Vectorized port of the Ericson-style circumsphere with collinear and
    obtuse-angle special cases (ref src/bounding_volumes/bsphere.jl:43-112);
    the reference's if/elif chain becomes a nested ``jnp.where`` selection so
    all batch lanes evaluate branch-free.
    """
    a, b, c = p1, p2, p3
    T = a.dtype
    ab = b - a
    ac = c - a
    abab = dot3(ab, ab)
    abac = dot3(ab, ac)
    acac = dot3(ac, ac)
    d = 2.0 * (abab * acac - abac * abac)

    eps = jnp.finfo(T).eps

    # Case 1: collinear — use the AABB center of the three points.
    lo = jnp.minimum(jnp.minimum(a, b), c)
    up = jnp.maximum(jnp.maximum(a, b), c)
    c_lin = 0.5 * (lo + up)
    r_lin = dist3(c_lin, up)

    # General barycentric solution (guard the division for collinear lanes).
    d_safe = jnp.where(jnp.abs(d) <= eps, 1.0, d)
    s = (abab * acac - acac * abac) / d_safe
    t = (acac * abab - abab * abac) / d_safe

    c_s0 = 0.5 * (a + c)          # s <= 0: midpoint of a, c
    c_t0 = 0.5 * (a + b)          # t <= 0: midpoint of a, b
    c_st = 0.5 * (b + c)          # s + t >= 1: midpoint of b, c
    c_in = a + s[..., None] * ab + t[..., None] * ac  # circumcenter

    r_s0 = dist3(c_s0, a)
    r_t0 = dist3(c_t0, a)
    r_st = dist3(c_st, b)
    r_in = dist3(c_in, a)

    # Nested selection mirrors the reference's branch order exactly.
    cen = jnp.where((s + t >= 1.0)[..., None], c_st, c_in)
    rad = jnp.where(s + t >= 1.0, r_st, r_in)
    cen = jnp.where((t <= 0.0)[..., None], c_t0, cen)
    rad = jnp.where(t <= 0.0, r_t0, rad)
    cen = jnp.where((s <= 0.0)[..., None], c_s0, cen)
    rad = jnp.where(s <= 0.0, r_s0, rad)
    cen = jnp.where((jnp.abs(d) <= eps)[..., None], c_lin, cen)
    rad = jnp.where(jnp.abs(d) <= eps, r_lin, rad)

    return BSphere(cen, rad)


def from_triangles(kind, p1, p2, p3) -> Volume:
    """Dispatch helper: ``kind`` is the BSphere or BBox class."""
    if kind is BSphere:
        return bsphere_from_triangles(p1, p2, p3)
    if kind is BBox:
        return bbox_from_triangles(p1, p2, p3)
    raise TypeError(f"unknown volume kind {kind}")


# --------------------------------------------------------------------------
# Merge monoid (ref: src/bounding_volumes/merge.jl:1-85)
# --------------------------------------------------------------------------

def merge(a: Volume, b: Volume) -> Volume:
    """Merge two bounding volumes of the same kind (the tree-build monoid)."""
    if isinstance(a, BSphere) and isinstance(b, BSphere):
        return merge_bspheres(a, b)
    if isinstance(a, BBox) and isinstance(b, BBox):
        return merge_bboxes(a, b)
    raise TypeError(f"cannot merge {type(a)} with {type(b)}")


def merge_bspheres(a: BSphere, b: BSphere) -> BSphere:
    """Enclosure-aware sphere+sphere merge; ref merge.jl:2-22."""
    length = dist3(a.x, b.x)
    a_in_b = length + a.r <= b.r
    b_in_a = length + b.r <= a.r

    len_safe = jnp.where(length == 0.0, 1.0, length)
    frac = 0.5 * ((b.r - a.r) / len_safe + 1.0)
    cen = a.x + frac[..., None] * (b.x - a.x)
    rad = 0.5 * (length + a.r + b.r)

    cen = jnp.where(b_in_a[..., None], a.x, jnp.where(a_in_b[..., None], b.x, cen))
    rad = jnp.where(b_in_a, a.r, jnp.where(a_in_b, b.r, rad))
    return BSphere(cen, rad)


def merge_bboxes(a: BBox, b: BBox) -> BBox:
    """Box+box merge; ref merge.jl:30-40."""
    return BBox(jnp.minimum(a.lo, b.lo), jnp.maximum(a.up, b.up))


def bbox_of_bsphere(a: BSphere) -> BBox:
    """Sphere -> enclosing box; ref merge.jl:47-55."""
    r = a.r[..., None]
    return BBox(a.x - r, a.x + r)


def bbox_of_two_bspheres(a: BSphere, b: BSphere) -> BBox:
    """Enclosure-aware sphere+sphere -> box; ref merge.jl:58-81.

    Note this is *not* simply the union of the two spheres' boxes: if one
    sphere encloses the other, only the enclosing sphere's box is returned —
    required for bit-exact node parity with the reference build.
    """
    length = dist3(a.x, b.x)
    a_in_b = (length + a.r <= b.r)[..., None]
    b_in_a = (length + b.r <= a.r)[..., None]
    boxa = bbox_of_bsphere(a)
    boxb = bbox_of_bsphere(b)
    lo = jnp.minimum(boxa.lo, boxb.lo)
    up = jnp.maximum(boxa.up, boxb.up)
    lo = jnp.where(b_in_a, boxa.lo, jnp.where(a_in_b, boxb.lo, lo))
    up = jnp.where(b_in_a, boxa.up, jnp.where(a_in_b, boxb.up, up))
    return BBox(lo, up)


def convert_volume(kind, v: Volume) -> Volume:
    """Convert a volume to ``kind`` (leaf->node type conversion)."""
    if isinstance(v, kind):
        return v
    if kind is BBox and isinstance(v, BSphere):
        return bbox_of_bsphere(v)
    raise TypeError(f"cannot convert {type(v)} to {kind}")


def merge_into(kind, a: Volume, b: Volume) -> Volume:
    """Merge two leaf volumes into a node volume of type ``kind``.

    Covers the reference's heterogeneous pair constructors
    (``BBox{T}(a::BSphere, b::BSphere)``, merge.jl:58-81).
    """
    if kind is BBox and isinstance(a, BSphere) and isinstance(b, BSphere):
        return bbox_of_two_bspheres(a, b)
    return merge(convert_volume(kind, a), convert_volume(kind, b))


# --------------------------------------------------------------------------
# Overlap predicates (ref: src/bounding_volumes/iscontact.jl:1-28)
# --------------------------------------------------------------------------

def iscontact(a: Volume, b: Volume):
    """Vectorized touch/overlap test; returns a boolean batch array."""
    if isinstance(a, BSphere) and isinstance(b, BSphere):
        rr = a.r + b.r
        return dist3sq(a.x, b.x) <= rr * rr
    if isinstance(a, BBox) and isinstance(b, BBox):
        return jnp.all((a.up >= b.lo) & (a.lo <= b.up), axis=-1)
    # Mixed sphere/box: test via the sphere's AABB (ref iscontact.jl:15-28).
    if isinstance(a, BSphere):
        return iscontact(bbox_of_bsphere(a), b)
    return iscontact(a, bbox_of_bsphere(b))


# --------------------------------------------------------------------------
# Ray intersection predicates (ref: src/bounding_volumes/isintersection.jl)
# --------------------------------------------------------------------------

def isintersection(v: Volume, p, d):
    """Forward-ray intersection test against box (slab) or sphere (quadratic).

    ``p``/``d`` are (..., 3) origins and directions, broadcast against the
    volume batch.  Ref: isintersection.jl:1-65.
    """
    if isinstance(v, BBox):
        # min2/max2 use `where(a < b, a, b)` select, replicating the
        # reference's asymmetric NaN behaviour for rays lying exactly in a
        # face plane with a zero direction component (0 * inf slabs).
        def min2(a, b):
            return jnp.where(a < b, a, b)

        def max2(a, b):
            return jnp.where(a > b, a, b)

        inv_d = 1.0 / d
        t1 = (v.lo - p) * inv_d
        t2 = (v.up - p) * inv_d
        tmin = min2(t1[..., 0], t2[..., 0])
        tmax = max2(t1[..., 0], t2[..., 0])
        tmin = max2(tmin, min2(t1[..., 1], t2[..., 1]))
        tmax = min2(tmax, max2(t1[..., 1], t2[..., 1]))
        tmin = max2(tmin, min2(t1[..., 2], t2[..., 2]))
        tmax = min2(tmax, max2(t1[..., 2], t2[..., 2]))
        return (tmin <= tmax) & (tmax >= 0)
    # Sphere: quadratic discriminant, forward-only.
    a = dot3(d, d)
    po = p - v.x
    b = 2.0 * dot3(po, d)
    c = dot3(po, po) - v.r * v.r
    discriminant = b * b - 4.0 * a * c
    return (discriminant >= 0) & ((b <= 0) | (c <= 0))
