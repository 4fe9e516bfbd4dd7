"""Morton (Z-order) encoding of bounding-volume centers.

TPU-native counterpart of /root/reference/src/morton/ — the canonical 3D
bit-interleave with per-width bit splitting (5/10/21 bits per axis for
16/32/64-bit codes), extrema computation with epsilon expansion, and the
``MortonAlgorithm`` extension point.

The whole encode is a single fused XLA program over the SoA center arrays:
two reductions (extrema) + one elementwise pass (quantize + split).  The
reference launches device kernels through AcceleratedKernels for the same
steps (src/morton/default.jl:43-108, src/morton/utils.jl:1-72).

64-bit codes: on CPU (and with ``jax.config.update('jax_enable_x64', True)``)
native ``uint64`` is used.  TPUs have no native 64-bit integer path, so the
``uint64`` option transparently falls back to a (hi, lo) pair of ``uint32``
arrays packed into the *sort key only* — see ``build.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


# Exclusive maximum quantization bound per code width (ref default.jl:167-169)
MORTON_SCALING = {16: 2 ** 5, 32: 2 ** 10, 64: 2 ** 21}

# Relative precision used to expand extrema so codes are exclusively bounded
# (ref default.jl:179-181)
RELATIVE_PRECISION = {
    jnp.float16: 1e-2,
    jnp.bfloat16: 1e-2,
    jnp.float32: 1e-5,
    jnp.float64: 1e-14,
}


def relative_precision(dtype) -> float:
    key = jnp.dtype(dtype).type
    return RELATIVE_PRECISION[key]


# --------------------------------------------------------------------------
# Bit splitting — shift bits so each has two zeros after it
# (ref: src/morton/default.jl:118-157; the magic masks are the standard
# public-domain 3D Morton constants)
# --------------------------------------------------------------------------

def morton_split3_u16(v):
    s = v.astype(jnp.uint16) & jnp.uint16(0x001F)
    s = (s | s << 8) & jnp.uint16(0x100F)
    s = (s | s << 4) & jnp.uint16(0x10C3)
    s = (s | s << 2) & jnp.uint16(0x1249)
    return s


def morton_split3_u32(v):
    s = v.astype(jnp.uint32) & jnp.uint32(0x0000_03FF)
    s = (s | s << 16) & jnp.uint32(0x3_0000FF)
    s = (s | s << 8) & jnp.uint32(0x0300_F00F)
    s = (s | s << 4) & jnp.uint32(0x3_0C30C3)
    s = (s | s << 2) & jnp.uint32(0x9_249249)
    return s


def morton_split3_u64(v):
    s = v.astype(jnp.uint64) & jnp.uint64(0x001F_FFFF)
    s = (s | s << 32) & jnp.uint64(0x1F00000000FFFF)
    s = (s | s << 16) & jnp.uint64(0x1F0000FF0000FF)
    s = (s | s << 8) & jnp.uint64(0x100F00F00F00F00F)
    s = (s | s << 4) & jnp.uint64(0x10C30C30C30C30C3)
    s = (s | s << 2) & jnp.uint64(0x1249249249249249)
    return s


def morton_split3(v, bits: int):
    if bits == 16:
        return morton_split3_u16(v)
    if bits == 32:
        return morton_split3_u32(v)
    if bits == 64:
        return morton_split3_u64(v)
    raise ValueError(f"unsupported morton width {bits}")


def _split3_21bit_hi_lo(v):
    """Split a 21-bit integer (as uint32) into the (hi, lo) uint32 halves of
    the 63-bit spread pattern — the TPU-friendly uint64 fallback.

    bit j of v lands at spread position 3*j; positions 0..31 -> lo,
    32..62 -> hi.  Bits j<=10 go fully to lo (3*10=30); j>=11 to hi.
    """
    v = v.astype(jnp.uint32)
    # bits 0..9 -> spread positions 0..27; bit 10 -> position 30
    lo = morton_split3_u32(v & jnp.uint32(0x3FF)) | (((v >> 10) & jnp.uint32(1)) << 30)
    hi_bits = (v >> 11) & jnp.uint32(0x3FF)               # bits 11..20
    hi = morton_split3_u32(hi_bits) << 1                  # 3*11=33 -> hi bit 1
    return hi, lo


# --------------------------------------------------------------------------
# Extrema with epsilon expansion (ref: src/morton/utils.jl:1-72)
# --------------------------------------------------------------------------

def bounding_volumes_extrema(centers):
    """Exclusive (mins, maxs) bounds of centers given as a coordinate tuple
    of (N,) arrays (or an (N, 3) array).

    Expanded by float-type relative precision so all quantized coordinates
    are strictly inside [0, 1).  Returns two coordinate 3-tuples.
    """
    from .volumes import as_coords
    centers = as_coords(centers)
    T = centers[0].dtype
    rp = jnp.asarray(relative_precision(T), T)
    tiny = jnp.asarray(jnp.finfo(T).tiny, T)
    mins = tuple(jnp.min(c) - rp * jnp.abs(jnp.min(c)) - tiny for c in centers)
    maxs = tuple(jnp.max(c) + rp * jnp.abs(jnp.max(c)) + tiny for c in centers)
    return mins, maxs


# --------------------------------------------------------------------------
# Morton algorithm objects (extension point, ref src/morton/morton.jl:15-48)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MortonAlgorithm:
    """Base class for Morton encoding algorithms (hashable, jit-static)."""


@dataclasses.dataclass(frozen=True)
class DefaultMortonAlgorithm(MortonAlgorithm):
    """Canonical 3D bit-interleave (ref src/morton/default.jl:21-40).

    ``bits`` selects the code width (16/32/64).  With
    ``compute_extrema=False`` the fixed ``mins``/``maxs`` world bounds are
    used and the extrema reduction is skipped — the caller must guarantee no
    center touches or exceeds the bounds.
    """

    bits: int = 32
    compute_extrema: bool = True
    mins: Tuple[float, float, float] = (float("nan"),) * 3
    maxs: Tuple[float, float, float] = (float("nan"),) * 3

    def __post_init__(self):
        if self.bits not in (16, 32, 64):
            raise ValueError(f"morton bits must be 16/32/64, got {self.bits}")


def _quantize(c, mn, mx, scaling):
    scaled = (c - mn) / (mx - mn)
    # trunc toward zero like the reference's unsafe_trunc
    return (scaled * jnp.asarray(scaling, c.dtype)).astype(jnp.uint32)


def morton_encode(centers, alg: DefaultMortonAlgorithm):
    """Morton codes for centers given as a coordinate tuple of (N,) arrays
    (or an (N, 3) array).

    Returns a single (N,) unsigned array for 16/32-bit codes (and for 64-bit
    when x64 is enabled); for 64-bit without x64 support returns a tuple
    ``(hi, lo)`` of uint32 arrays forming a lexicographic sort key.

    Ref: morton_encode_single, src/morton/default.jl:91-108.
    """
    from .volumes import as_coords
    centers = as_coords(centers)
    T = centers[0].dtype
    if alg.compute_extrema:
        mins, maxs = bounding_volumes_extrema(centers)
    else:
        mins = tuple(jnp.asarray(m, T) for m in alg.mins)
        maxs = tuple(jnp.asarray(m, T) for m in alg.maxs)

    scaling = MORTON_SCALING[alg.bits]
    q1 = _quantize(centers[0], mins[0], maxs[0], scaling)
    q2 = _quantize(centers[1], mins[1], maxs[1], scaling)
    q3 = _quantize(centers[2], mins[2], maxs[2], scaling)

    if alg.bits == 64 and not jax.config.jax_enable_x64:
        h1, l1 = _split3_21bit_hi_lo(q1)
        h2, l2 = _split3_21bit_hi_lo(q2)
        h3, l3 = _split3_21bit_hi_lo(q3)
        # m = (s1 << 2) | (s2 << 1) | s3 across the 64-bit lane
        hi = (h1 << 2) | (l1 >> 30) | (h2 << 1) | (l2 >> 31) | h3
        lo = (l1 << 2) | (l2 << 1) | l3
        return hi, lo

    s1 = morton_split3(q1, alg.bits)
    s2 = morton_split3(q2, alg.bits)
    s3 = morton_split3(q3, alg.bits)
    return (s1 << 2) | (s2 << 1) | s3


def morton_encode_single(center, mins, maxs, alg: DefaultMortonAlgorithm):
    """Scalar-style encode of a single (3,) center given explicit bounds
    (API parity with ref morton_encode_single)."""
    c = jnp.asarray(center, jnp.float32)[None, :]
    sub = DefaultMortonAlgorithm(bits=alg.bits, compute_extrema=False,
                                 mins=tuple(map(float, mins)),
                                 maxs=tuple(map(float, maxs)))
    m = morton_encode(c, sub)
    if isinstance(m, tuple):
        return m[0][0], m[1][0]
    return m[0]
