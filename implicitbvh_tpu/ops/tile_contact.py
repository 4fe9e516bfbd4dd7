"""Pallas tile-contact kernel: dense leaf tests over overlapping leaf tiles.

This is the TPU-native hot path for broad-phase self-contact, replacing
per-lane tree walks (whose random gathers scalarize on TPU, see
traverse/walk.py) with dense vector work:

- Morton-sorted leaves are grouped into tiles of G (tile AABBs computed by
  reshape-reduce in XLA);
- phase 1 (XLA) extracts overlapping tile pairs (ti <= tj);
- phase 2 (this kernel) runs one tile pair per sequential grid step:
  scalar-prefetched pair indices drive the BlockSpec index_map (so tile
  leaf data is DMA'd HBM->VMEM by the standard Pallas pipeline), the GxG
  contact mask is computed branch-free on the VPU, and the sparse contacts
  are compacted **in VMEM** with two one-hot contractions (row-level then
  pair-level) — the TPU idiom for stream compaction, since XLA scatter
  runs at <1e9 elem/s on this hardware.

The kernel emits per-pair padded (CAP_PAIR,) contact slots holding global
*sorted-order leaf positions* (f32-exact: < 2^24), plus per-pair counts and
an overflow flag; the driver (traverse/tiles.py) maps positions to user
indices and compacts the padded slots.

Dense-candidate semantics are identical to the reference's LVT traversal
contact set (j > i in sorted order, ref traverse_single.jl (lvt):163-167) —
the tile pass simply tests a superset of the tree-pruned candidates.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# A/B ablation switches for measurement only (comma-separated env var read
# once at import; each ablation run is its own process).  Round 3 shipped
# three count-kernel levers CPU-validated-only while the tunnel was wedged
# and the chained count stage regressed 23.2 -> 27.95 ms; these flags let
# each lever be measured in isolation without git surgery.
#   nopb2   — disable two-sphere-tiles-per-b-block slabs (a8060f8)
#   nomask  — count kernel emits per-band constants instead of computing
#             the VPU mask (WRONG COUNTS; timing attribution only: the
#             remainder is DMA issue + grid-step + branch overhead)
# Two other round-3 levers were ablated on-chip in round 4 and REMOVED:
#   4-pairs-per-int32 packed count words (6f96a74) cost 5.2 ms at 1M
#   (count kernel 28.17 -> 23.02 ms chained, full 70.87 -> 65.44): the
#   shift-multiply accumulate serializes row updates while the 4x HBM
#   saving buys nothing (kernel is DMA-issue/compute-bound, not bytes).
#   Pad-slot block-index forward-fill (16c0548) cost 4.2 ms at 1M (full
#   66.10 -> 61.92 with IBVH_ABLATE=noffill): the XLA cummax+gather in
#   phase 1 (~7.8 ms attributed) far outweighed the repeated-index DMA
#   skip in the kernels.
ABLATE = frozenset(
    s for s in os.environ.get("IBVH_ABLATE", "").split(",") if s)


# Scoped-VMEM budget for the kernels: the default 16 MB limit rejects the
# growth-enlarged slot caps (CAP_PAIR=1024/ROW_CAP=32 needs ~19 MB of
# compaction scratch); the physical VMEM is far larger.
_VMEM_LIMIT = 64 * 1024 * 1024

def _seg(cap_pair: int) -> int:
    """Lane offset of one section in the packed output block: gi lives at
    [0, cap), gj at [seg, seg+cap), meta at [2*seg, 2*seg+128).  The three
    outputs share ONE block so each grid step issues a single output DMA
    instead of three (the kernels are DMA-issue-bound at ~130 ns/copy)."""
    return -(-cap_pair // 128) * 128


MASK_FIELD_COUNTS = {
    # mask_kind -> (a-side field count, b-side field count)
    "sphere": (4, 4),        # spheres vs spheres: (x0, x1, x2, r)
    "box": (6, 6),           # boxes vs boxes: (lo0, lo1, lo2, up0, up1, up2)
    "ray_box": (6, 6),       # rays (p0, p1, p2, d0, d1, d2) vs box leaves
    "ray_sphere": (6, 4),    # rays vs sphere leaves
}

# Sub-bands per a-tile for the banded grouped kernel (ops/subtile.py
# computes the per-(pair, band) skip bits in phase 1).
N_BANDS = 4


def _pair_kernel(mask_kind: str, G: int, ROW_CAP: int, CAP_PAIR: int,
                 dedup: bool, B: int,
                 pk_ref, npairs_ref,   # scalar prefetch (packed ti<<16|tj)
                 *refs):
    """B tile pairs per grid step (amortizes per-step fixed costs).

    refs layout: for each pair slot b: Fa a-side blocks; then for each b: Fb
    b-side blocks; then ONE packed output with per-slot rows (blocks
    (1, B, 2*seg+128), see _seg).  (Fa, Fb) per MASK_FIELD_COUNTS.
    Leaf validity is encoded in the data: padded leaves carry NaN fields,
    whose predicate comparisons are always false.
    """
    out = refs[2 * B]
    seg = _seg(CAP_PAIR)

    p = pl.program_id(0)
    for bslot in range(B):
        # each side's fields arrive packed in ONE (1, 8, G) block per pair
        # slot: a single large DMA instead of F small ones (the kernel is
        # DMA-issue-bound at ~130 ns per issued copy, so per-field blocks
        # cost ~1.3 us/pair; packed blocks cut that ~5x)
        a_blk = refs[bslot][0]
        b_blk = refs[B + bslot][0]
        idx = p * B + bslot
        # mask after the arithmetic shift: packed values with ti >= 32768
        # are negative in int32 and would otherwise sign-extend
        ti = (pk_ref[idx] >> 16) & 0xFFFF
        tj = pk_ref[idx] & 0xFFFF
        pair_valid = idx < npairs_ref[0]

        # Padded steps skip all compute; their count lane is zeroed so the
        # driver-side extraction ignores their garbage slots.
        @pl.when(jnp.logical_not(pair_valid))
        def _(bslot=bslot):
            out[0, bslot, 2 * seg:2 * seg + 128] = jnp.zeros((128,),
                                                             jnp.float32)

        @pl.when(pair_valid)
        def _(bslot=bslot, ti=ti, tj=tj, a_blk=a_blk, b_blk=b_blk):
            _pair_body(mask_kind, G, ROW_CAP, CAP_PAIR,
                       dedup, ti, tj, a_blk, b_blk, out, bslot)


def _mask_sphere(a_blk, b_blk):
    """Exact sphere-sphere contact mask: dist3sq <= (r1+r2)^2 with the
    reference's term order (ref src/bounding_volumes/iscontact.jl:1-10).

    Note: an MXU distance-matrix form (|a|^2+|b|^2-2a.b with the cross term
    as a dim-0/dim-0 contraction) was measured SLOWER here — per-pair
    (8,G)x(8,G) matmuls are launch-overhead-bound (DEFAULT +20%, HIGHEST
    +35% on the 1M benchmark) — so the direct VPU form stays."""
    a = [a_blk[k] for k in range(4)]
    b = [b_blk[k] for k in range(4)]
    dx = a[0][:, None] - b[0][None, :]
    dy = a[1][:, None] - b[1][None, :]
    dz = a[2][:, None] - b[2][None, :]
    rr = a[3][:, None] + b[3][None, :]
    return dx * dx + dy * dy + dz * dz <= rr * rr


def _mask_box(a_blk, b_blk):
    a = [a_blk[k] for k in range(6)]
    b = [b_blk[k] for k in range(6)]
    mask = (a[3][:, None] >= b[0][None, :]) & (a[0][:, None] <= b[3][None, :])
    mask &= (a[4][:, None] >= b[1][None, :]) & (a[1][:, None] <= b[4][None, :])
    mask &= (a[5][:, None] >= b[2][None, :]) & (a[2][:, None] <= b[5][None, :])
    return mask


def _mask_ray_box(a_blk, b_blk):
    """Rays on sublanes (a = p0, p1, p2, d0, d1, d2) vs box leaves on lanes
    (b = lo0, lo1, lo2, up0, up1, up2): forward slab test, replicating
    volumes.isintersection exactly (where-select min/max for the reference's
    NaN asymmetry, ref src/bounding_volumes/isintersection.jl:1-40)."""
    a = [a_blk[k] for k in range(6)]
    b = [b_blk[k] for k in range(6)]

    def min2(x, y):
        return jnp.where(x < y, x, y)

    def max2(x, y):
        return jnp.where(x > y, x, y)

    tmin = None
    tmax = None
    for k in range(3):
        inv = (1.0 / a[3 + k])[:, None]
        po = a[k][:, None]
        t1 = (b[k][None, :] - po) * inv
        t2 = (b[3 + k][None, :] - po) * inv
        lo = min2(t1, t2)
        hi = max2(t1, t2)
        tmin = lo if tmin is None else max2(tmin, lo)
        tmax = hi if tmax is None else min2(tmax, hi)
    return (tmin <= tmax) & (tmax >= 0)


def _mask_ray_sphere(a_blk, b_blk):
    """Rays on sublanes vs sphere leaves on lanes (b = x0, x1, x2, r):
    quadratic-discriminant forward test (ref isintersection.jl:42-65)."""
    a = [a_blk[k] for k in range(6)]
    b = [b_blk[k] for k in range(4)]
    qa = (a[3] * a[3] + a[4] * a[4] + a[5] * a[5])[:, None]
    po0 = a[0][:, None] - b[0][None, :]
    po1 = a[1][:, None] - b[1][None, :]
    po2 = a[2][:, None] - b[2][None, :]
    qb = 2.0 * (po0 * a[3][:, None] + po1 * a[4][:, None] +
                po2 * a[5][:, None])
    qc = po0 * po0 + po1 * po1 + po2 * po2 - (b[3] * b[3])[None, :]
    disc = qb * qb - 4.0 * qa * qc
    return (disc >= 0) & ((qb <= 0) | (qc <= 0))


_MASK_FNS = {
    "sphere": _mask_sphere,
    "box": _mask_box,
    "ray_box": _mask_ray_box,
    "ray_sphere": _mask_ray_sphere,
}


# ---------------------------------------------------------------------------
# Banded masks: the grouped kernel computes the (G, G) mask per (G/N_BANDS)
# sub-band under pl.when, skipping bands whose sub-AABB misses the b-tile
# (phase 1 provides the skip bits).  The a-side lane->sublane relayout
# (``[:, None]``) is hoisted once per grid step via ``_acols``.
# ---------------------------------------------------------------------------

def _acols(mask_kind: str, a_blk):
    """Per-field (G, 1) column relayouts of the a-side block, with the
    ray slab test's 1/d precomputed (it is band-invariant)."""
    Fa = MASK_FIELD_COUNTS[mask_kind][0]
    cols = [a_blk[k][:, None] for k in range(Fa)]
    if mask_kind == "ray_box":
        cols = cols[:3] + [1.0 / c for c in cols[3:]]
    return cols


def _band_mask(mask_kind: str, cols, b_blk, r0: int, bh: int):
    """(bh, G) contact mask for a-rows [r0, r0+bh) vs the full b tile.
    Same predicates as _MASK_FNS (see those for the reference citations);
    padded leaves carry NaN fields whose comparisons are always false."""
    a = [c[r0:r0 + bh] for c in cols]
    if mask_kind == "sphere":
        b = [b_blk[k][None, :] for k in range(4)]
        dx = a[0] - b[0]
        dy = a[1] - b[1]
        dz = a[2] - b[2]
        rr = a[3] + b[3]
        return dx * dx + dy * dy + dz * dz <= rr * rr
    if mask_kind == "box":
        b = [b_blk[k][None, :] for k in range(6)]
        m = (a[3] >= b[0]) & (a[0] <= b[3])
        m &= (a[4] >= b[1]) & (a[1] <= b[4])
        return m & (a[5] >= b[2]) & (a[2] <= b[5])

    def min2(x, y):
        return jnp.where(x < y, x, y)

    def max2(x, y):
        return jnp.where(x > y, x, y)

    if mask_kind == "ray_box":
        b = [b_blk[k][None, :] for k in range(6)]
        tmin = None
        tmax = None
        for k in range(3):
            t1 = (b[k] - a[k]) * a[3 + k]      # a[3+k] holds 1/d
            t2 = (b[3 + k] - a[k]) * a[3 + k]
            lo = min2(t1, t2)
            hi = max2(t1, t2)
            tmin = lo if tmin is None else max2(tmin, lo)
            tmax = hi if tmax is None else min2(tmax, hi)
        return (tmin <= tmax) & (tmax >= 0)
    assert mask_kind == "ray_sphere", mask_kind
    b = [b_blk[k][None, :] for k in range(4)]
    qa = a[3] * a[3] + a[4] * a[4] + a[5] * a[5]
    po0 = a[0] - b[0]
    po1 = a[1] - b[1]
    po2 = a[2] - b[2]
    qb = 2.0 * (po0 * a[3] + po1 * a[4] + po2 * a[5])
    qc = po0 * po0 + po1 * po1 + po2 * po2 - b[3] * b[3]
    disc = qb * qb - 4.0 * qa * qc
    return (disc >= 0) & ((qb <= 0) | (qc <= 0))


def _pair_body(mask_kind, G, ROW_CAP, CAP_PAIR,
               dedup, ti, tj, a_blk, b_blk, out, row):
    seg = _seg(CAP_PAIR)
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)

    gi = ti * G + sub          # global sorted positions (0-based), (G, G)
    gj = tj * G + lane

    # --- contact mask (padded leaves carry NaN fields -> always false) ----
    mask = _MASK_FNS[mask_kind](a_blk, b_blk)

    # self-contact dedup: j > i in global sorted order (two-BVH traversal
    # keeps the full grid)
    if dedup:
        mask &= gj > gi

    mi = mask.astype(jnp.float32)
    total = jnp.sum(mi)
    meta_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    # Most overlapping tile pairs produce zero contacts — skip the whole
    # compaction for them (mask+count is ~1/5 of the per-pair cost).
    @pl.when(total == 0.0)
    def _():
        out[0, row, 2 * seg:2 * seg + 128] = jnp.zeros((128,), jnp.float32)

    @pl.when(total > 0.0)
    def _():
        _pair_compact(G, ROW_CAP, CAP_PAIR, ti, tj, mi, total,
                      meta_lane, out, row)


def _pair_compact_rows(G, ROW_CAP, CAP_PAIR, ti, tj, mi, total):
    """In-VMEM two-level compaction of one pair's contact mask; returns
    ``(gi_row, gj_row, over)`` with the compacted global positions in the
    (1, CAP_PAIR) rows' leading ``total`` lanes.  See _pair_compact_vrows
    for the compaction itself; this wrapper reduces its per-lane ROW_CAP
    flag row to the scalar ``over`` used by the single-pass kernels."""
    gi_row, gj_row, over_row = _pair_compact_vrows(
        G, ROW_CAP, CAP_PAIR, ti, tj, mi)
    over = (total > CAP_PAIR) | (jnp.sum(over_row) > 0)
    return gi_row, gj_row, over


def _pair_compact(G, ROW_CAP, CAP_PAIR, ti, tj, mi, total, meta_lane,
                  out, row):
    seg = _seg(CAP_PAIR)
    gi_row, gj_row, over = _pair_compact_rows(
        G, ROW_CAP, CAP_PAIR, ti, tj, mi, total)
    out[0, row, 0:CAP_PAIR] = gi_row[0, :]
    out[0, row, seg:seg + CAP_PAIR] = gj_row[0, :]
    out[0, row, 2 * seg:2 * seg + 128] = jnp.where(
        meta_lane[0] == 0, total,
        jnp.where(meta_lane[0] == 1, over.astype(jnp.float32), 0.0))


@functools.partial(
    jax.jit,
    static_argnames=("mask_kind", "G", "ROW_CAP", "CAP_PAIR",
                     "dedup", "interpret", "batch"))
def tile_pair_contacts(packed, npairs, a_fields, b_fields=None, *,
                       mask_kind: str,
                       G: int, ROW_CAP: int = 4, CAP_PAIR: int = 16,
                       dedup: bool = True,
                       interpret: bool = False,
                       batch: int = 8):
    """Run the tile-contact kernel.

    - ``packed``: (P_cap,) int32 tile pair indices packed as ti << 16 | tj
      (ti <= tj for self-contact), padded; the caller chunks so P_cap stays
      within SMEM.
    - ``npairs``: (1,) int32 number of valid pairs.
    - ``a_fields``/``b_fields``: tuples of (T, G) f32 tiled fields; the
      per-side field layout is selected by ``mask_kind`` (see
      MASK_FIELD_COUNTS): "sphere"/"box" for leaf-vs-leaf contact,
      "ray_box"/"ray_sphere" for ray tiles (a-side) vs leaf tiles (b-side).

    Returns ``(slots, counts, overflow)``: the raw packed per-pair rows
    (P_cap, 2*seg+128) f32 — gi at lane [0, CAP_PAIR), gj at
    [seg, seg+CAP_PAIR), see ``_seg`` — plus per-pair counts (P_cap,) and
    a scalar overflow flag.  Extraction gathers straight from the packed
    rows (traverse/tiles._extract_contacts).
    """
    P_cap = packed.shape[0]
    if b_fields is None:
        b_fields = a_fields
    Fa, Fb = MASK_FIELD_COUNTS[mask_kind]
    assert len(a_fields) == Fa and len(b_fields) == Fb, \
        (mask_kind, len(a_fields), len(b_fields))
    B = batch
    assert P_cap % B == 0, (P_cap, B)
    steps = P_cap // B

    def pack(fields):
        """(T, G) field tuple -> one (T, 8, G) array (pad rows zero)."""
        T = fields[0].shape[0]
        stackd = jnp.stack(fields, axis=1)
        nf = len(fields)
        if nf < 8:
            stackd = jnp.concatenate(
                [stackd, jnp.zeros((T, 8 - nf, G), stackd.dtype)], axis=1)
        return stackd

    a_packed = pack(a_fields)
    b_packed = pack(b_fields)

    def row_spec(which, bslot):
        # index_map receives (grid idx, *scalar prefetch refs); packed
        # fields are (T, 8, G) so the (1, 8, G) block satisfies the TPU
        # (sublane, lane) block divisibility rule.  Pair indices arrive
        # packed (ti << 16 | tj) to halve SMEM footprint; the decode masks
        # after the arithmetic shift (ti >= 32768 is negative in int32).
        if which == 0:
            return pl.BlockSpec(
                (1, 8, G),
                lambda p, pk_r, np_r, b=bslot: (
                    (pk_r[p * B + b] >> 16) & 0xFFFF, 0, 0))
        return pl.BlockSpec(
            (1, 8, G),
            lambda p, pk_r, np_r, b=bslot: (pk_r[p * B + b] & 0xFFFF, 0, 0))

    # one packed spec per (side, slot)
    in_specs = ([row_spec(0, b) for b in range(B)] +
                [row_spec(1, b) for b in range(B)])

    seg = _seg(CAP_PAIR)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, B, 2 * seg + 128), lambda p, *_: (p, 0, 0)),
        ],
    )

    kernel = functools.partial(_pair_kernel, mask_kind, G, ROW_CAP,
                               CAP_PAIR, dedup, B)
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((steps, B, 2 * seg + 128), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(packed, npairs, *([a_packed] * B), *([b_packed] * B))
    counts = out[:, :, 2 * seg].astype(jnp.int32).reshape(P_cap)
    over = out[:, :, 2 * seg + 1].sum() > 0
    # the raw packed rows go straight to extraction (slicing gi/gj out
    # here would materialize two P_cap x CAP_PAIR relayout copies)
    return out.reshape(P_cap, 2 * seg + 128), counts, over


# ---------------------------------------------------------------------------
# Streamed grouped kernel: dense in-kernel contact output
# ---------------------------------------------------------------------------

_STAGE_ROWS = 16       # circular VMEM stage: 2048 contacts per payload


def _stream_flush(stage_gi, stage_gj, gi_hbm, gj_hbm, sems, cur_ref,
                  CAPROWS: int):
    """Flush 8 aligned stage rows (1024 contacts) to the HBM streams.

    ``cur_ref``: SMEM [cursor, flushed_rows, overflow].  Flushed rows are
    always a multiple of 8, so the circular-stage source slice (16 rows)
    never wraps and the HBM destination offset stays (8, 128)-tile-aligned
    (manual DMA alignment rule).  A flush past CAPROWS is dropped and
    flagged — the host wrapper grows the capacity and re-runs.
    """
    fr = cur_ref[1]
    src = jax.lax.rem(fr, jnp.int32(_STAGE_ROWS))
    ok = fr + 8 <= CAPROWS

    @pl.when(ok)
    def _():
        c1 = pltpu.make_async_copy(stage_gi.at[pl.ds(src, 8), :],
                                   gi_hbm.at[pl.ds(fr, 8), :], sems.at[0])
        c2 = pltpu.make_async_copy(stage_gj.at[pl.ds(src, 8), :],
                                   gj_hbm.at[pl.ds(fr, 8), :], sems.at[1])
        c1.start()
        c2.start()
        c1.wait()
        c2.wait()

    @pl.when(jnp.logical_not(ok))
    def _():
        cur_ref[2] = cur_ref[2] | 1     # bit 0: stream capacity exceeded
    cur_ref[1] = fr + 8


# ---------------------------------------------------------------------------
# Two-phase grouped kernels: count (A) then emit (B)
#
# Floor measurements at 1M (benchmarks/RESULTS.md round 3): the single-pass
# grouped kernel costs 60 ms even with every band dead vs 13.8 ms for the
# same grid with a trivial body — i.e. ~46 ms is per-pair *fixed* overhead:
# the per-step DMA issue (~130 ns/copy) and grid-step sequencing, plus the
# (G, G) scratch/dedup/sum infrastructure and one vector->scalar sync per
# pair for the ``total > 0`` compaction guard, while the actual live-band
# mask work is only ~12 ms.  The split removes both: kernel A (the
# run-block count kernel below) only counts, with no scratch and no scalar
# syncs, fetching aligned multi-tile b slabs so the DMA count drops ~3x;
# XLA compacts the ~7% of pairs with contacts; kernel B redoes the mask for
# those pairs only, with their exact counts delivered via scalar prefetch
# so the compaction guard and the dense-output stream cursor are
# scalar-only too.  This mirrors the reference's allocation-exact two-pass
# traversal (count, allocate, emit —
# ref src/traverse/leaf_vs_tree/traverse_single.jl:52-78) at kernel
# granularity.
# ---------------------------------------------------------------------------


def _run_count_kernel(mask_kind: str, G: int, W: int, R: int, NB: int,
                      PB: int, dedup: bool, moments: bool,
                      *prefetch_and_refs):
    """Count kernel over aligned b-tile *runs*: one (R, 8, G) DMA covers R
    consecutive b tiles.

    The count grid is DMA-issue/step-overhead-bound (~130 ns per issued
    copy + ~0.3-1 us fixed per grid step; HBM bytes are ~1000x below the
    bandwidth limit), and phase-1 candidate tj's cluster: at 1M, 190k
    (ti, tj) pairs collapse to 66k aligned (ti, tj>>3) runs, so R = 8 cuts
    both the b-DMA count and the step count ~3x.  Dead tiles inside a run
    skip at the scalar level (measured: a dead pl.when region costs < 1 ns,
    benchmarks/micro_branch_bf16.py), driven by ``bm_ref`` words carrying
    NB band bits per tile (32 // NB tiles per word).

    ``NB`` sub-bands per tile set the mask quantum: a live band costs one
    (G // NB, G) vector mask, so finer bands trade more (near-free) scalar
    branches and more prefetched words for proportionally less dead mask
    work (phase 1b computes the bits, ops/subtile.py).

    Output: (1, W * R, 128) int32 rows of per-tile *lane-partial* counts
    (sum over mask sublanes only).  The XLA caller reduces lanes, so the
    kernel has no cross-lane reduction and no vector->scalar syncs at
    all.  (Round 3 packed four pairs per word in 8-bit slots to cut the
    output HBM traffic 4x; the round-4 on-chip ablation showed the
    shift-multiply accumulate cost 5.2 ms at 1M while the byte saving
    bought nothing — the kernel is issue-bound, not bytes-bound.)
    """
    TPW = 32 // NB             # tiles per band word
    NW = R // TPW
    ai_ref = prefetch_and_refs[0]
    bi_ref = prefetch_and_refs[1]
    bm_refs = prefetch_and_refs[2:2 + NW]
    nsteps_ref = prefetch_and_refs[2 + NW]
    refs = prefetch_and_refs[3 + NW:]
    aref = refs[0]
    brefs = refs[1:1 + W]
    out = refs[1 + W]          # (1, W * R, 128) per-pair lane rows
    acc = refs[2 + W]          # (AH, {G|2G}) int32 band accumulator scratch
    BH = G // NB
    AH = min(8, BH)

    s = pl.program_id(0)
    step_valid = s < nsteps_ref[0]

    out[0, :, :] = jnp.zeros((W * R, 128), jnp.int32)

    @pl.when(step_valid)
    def _():
        a_blk = aref[0]
        cols = _acols(mask_kind, a_blk)
        ti = ai_ref[s]
        for w in range(W):
            words = [bm_refs[q][s * W + w] for q in range(NW)]
            base = bi_ref[s * W + w] & 0xFFFF      # aligned run index
            any_live = words[0]
            for q in range(1, NW):
                any_live = any_live | words[q]

            @pl.when(any_live != 0)
            def _(w=w, words=words, base=base):
                for t in range(R):
                    bm_t = (words[t // TPW] >> (NB * (t % TPW))) & \
                        ((1 << NB) - 1)

                    @pl.when(bm_t != 0)
                    def _(t=t, bm_t=bm_t, w=w, base=base):
                        b_blk = brefs[w][t // PB]
                        if PB == 2:   # two tiles per block, 4 rows each
                            b_blk = b_blk[(t % 2) * 4:(t % 2) * 4 + 4]
                        tj = base * R + t
                        k = w * R + t

                        # Per live band the mask folds into an (AH, G)
                        # scratch with BH//AH static-slice adds — no
                        # cross-sublane reduction per band (that
                        # cast+reduce+accumulate was the fixed overhead
                        # that made finer bands lose wall-clock while
                        # cutting checks, VERDICT r4 weak #3); the single
                        # sublane reduce runs once per live pair below.
                        # With ``moments`` ONE extra fold accumulates the
                        # packed weight (i << 15) + i^2: its sum splits
                        # back into (sum i) and (sum i^2) carry-free
                        # whenever the column holds <= 2 contacts (the
                        # only columns the decode ever reads: sum i^2 <=
                        # 2 * 127^2 < 2^15, sum i <= 254 < 2^8).  Higher
                        # counts carry between the two fields (never past
                        # int32: <= 128 * (127 << 15) + 128 * 127^2 <
                        # 2^30) — harmless, the packed output below zeros
                        # the moment bits of cc > 2 columns.
                        def fold(x):
                            part = x[0:AH]
                            for a2 in range(1, BH // AH):
                                part = part + x[a2 * AH:(a2 + 1) * AH]
                            return part

                        PS = max(G, 128)    # fixed accumulator plane pitch

                        def accum(m, r):
                            mi32 = m.astype(jnp.int32)
                            acc[:, 0:G] = acc[:, 0:G] + fold(mi32)
                            if moments:
                                wt = jax.lax.broadcasted_iota(
                                    jnp.int32, (BH, G), 0) + r * BH
                                wt2 = (wt << 15) + wt * wt
                                acc[:, PS:PS + G] = \
                                    acc[:, PS:PS + G] + fold(mi32 * wt2)

                        AW = 2 * PS if moments else PS
                        acc[:, :] = jnp.zeros((AH, AW), jnp.int32)
                        for r in range(NB):
                            @pl.when(((bm_t >> r) & 1) != 0)
                            def _(r=r, b_blk=b_blk, tj=tj, k=k):
                                if "nomask" in ABLATE:
                                    # timing attribution only: skip the
                                    # VPU mask, keep DMAs/branches/output
                                    acc[:, 0:G] = acc[:, 0:G] + 1
                                    return
                                m = _band_mask(mask_kind, cols, b_blk,
                                               r * BH, BH)
                                if dedup:
                                    # the j > i dedup only bites on the
                                    # diagonal tile pair: for tj > ti
                                    # (phase 1 guarantees ti <= tj) every
                                    # lane already has gj > gi, so the
                                    # row-triangle mask — a per-band
                                    # constant, no per-test iota builds —
                                    # applies under a scalar branch
                                    # (~4% of pairs at 1M)
                                    @pl.when(tj == ti)
                                    def _(m=m, r=r):
                                        tri = (jax.lax.broadcasted_iota(
                                            jnp.int32, (BH, G), 1) >
                                            r * BH +
                                            jax.lax.broadcasted_iota(
                                                jnp.int32, (BH, G), 0))
                                        accum(m & tri, r)

                                    @pl.when(tj != ti)
                                    def _(m=m, r=r):
                                        accum(m, r)
                                else:
                                    accum(m, r)
                        if not moments:
                            out[0, k, 0:G] = jnp.sum(
                                acc[:, 0:G], axis=0)
                        else:
                            s3 = jnp.sum(acc[:, :], axis=0)   # (2*PS,)
                            cc = s3[0:G]
                            mom = s3[PS:PS + G]
                            # ONE packed plane: cc << 23 | is << 15 | iq
                            # (cc <= G = 128 always exact in its own 8-bit
                            # field; the moment bits — < 2^23 for the
                            # cc <= 2 columns the decode reads — are
                            # zeroed on cc > 2 columns where the field
                            # split carries).  Halves the kernel's output
                            # HBM traffic vs a separate cc plane (~1.6 GB
                            # at ray scale) and dead columns stay word 0.
                            out[0, k, 0:G] = (cc << 23) | jnp.where(
                                cc <= 2, mom, 0)


@functools.partial(
    jax.jit,
    static_argnames=("mask_kind", "G", "W", "R", "NB", "dedup",
                     "interpret", "reduce", "with_colmax", "moments"))
def tile_run_counts(a_idx, b_idx, bm_words, nsteps, a_fields,
                    b_fields=None, *, mask_kind: str, G: int, W: int = 8,
                    R: int = 8, NB: int = N_BANDS, dedup: bool = False,
                    interpret: bool = False, reduce: bool = True,
                    with_colmax: bool = False, moments: bool = False):
    """Run the run-block count kernel (see _run_count_kernel).

    - ``a_idx``: (S_cap,) int32 a-tile index per step.
    - ``b_idx``: (S_cap * W,) int32 aligned run indices (tj >> log2(R)) in
      the low 16 bits; pad entries point at the NaN pad run.
    - ``bm_words``: tuple of ``R * NB // 32`` (S_cap * W,) int32 per-run
      word arrays, NB band bits per tile, 32 // NB tiles per word (tile
      t's bits at word ``t // (32//NB)``, bits [NB*(t%(32//NB)), +NB));
      pad entries carry 0.

    Returns ``counts`` (S_cap * W * R,) int32: exact contact counts of
    every (step, w, t) tile pair (zero for dead tiles/pads).

    ``moments=True`` additionally captures, per (pair, b-leaf) column of
    the mask, the count cc and the packed row-index moments
    ``is = sum i`` and ``iq = sum i^2`` — for any column with cc <= 2 the
    contact rows are exactly ``i1 = (is - d) / 2, i2 = (is + d) / 2``
    with ``d = sqrt(2 iq - is^2)`` (cc == 1: i1 = is).  Output rows stay
    128 lanes: ONE packed decode word per column,
    ``cc << 23 | is << 15 | iq`` (cc always exact; the moment fields are
    exact for cc <= 2 columns — the only ones the decode reads — and
    zeroed otherwise; 0 on dead columns).  Returns
    ``(counts, colmax, words)`` where ``words`` is the
    (S_cap * W * R, 128) decode-word plane — the XLA moment-decode path
    (traverse/tiles._moment_decode) turns it into contacts with no emit
    kernel at all for low-count colmax <= 2 pairs.
    """
    S_cap = a_idx.shape[0]
    if b_fields is None:
        b_fields = a_fields
    Fa, Fb = MASK_FIELD_COUNTS[mask_kind]
    assert len(a_fields) == Fa and len(b_fields) == Fb, \
        (mask_kind, len(a_fields), len(b_fields))
    assert NB in (4, 8, 16) and G % NB == 0, (NB, G)
    TPW = 32 // NB
    assert R % TPW == 0, (R, NB)
    NW = R // TPW
    if not isinstance(bm_words, (tuple, list)):
        bm_words = (bm_words,)
    assert len(bm_words) == NW, (len(bm_words), NW)

    def pack_a(fields):
        T = fields[0].shape[0]
        stackd = jnp.stack(fields, axis=1)
        nf = len(fields)
        if nf < 8:
            stackd = jnp.concatenate(
                [stackd, jnp.zeros((T, 8 - nf, G), stackd.dtype)], axis=1)
        return jnp.concatenate(
            [stackd, jnp.full((1, 8, G), jnp.nan, stackd.dtype)], axis=0)

    # Fb = 4 masks pack TWO b tiles per 8-row block (rows [0, 4) = even
    # tile, rows [4, 8) = odd tile), halving the b-slab DMA bytes — the
    # dominant HBM traffic of this kernel (W slabs of (R, 8, G) per step).
    # The in-loop tile index t is static, so the row offset is static too.
    PB = 2 if (Fb == 4 and "nopb2" not in ABLATE) else 1

    def pack_b(fields):
        # pad dim 0 to a multiple of R with NaN tiles, then append one
        # all-NaN pad run (block index T_r // R) for pad b entries
        T = fields[0].shape[0]
        T_r = -(-T // R) * R
        stackd = jnp.stack(fields, axis=1)
        nf = len(fields)
        if PB == 2:
            full = jnp.concatenate(
                [stackd,
                 jnp.full((T_r - T + R, nf, G), jnp.nan, stackd.dtype)],
                axis=0)
            return full.reshape((T_r + R) // 2, 2 * nf, G)
        if nf < 8:
            stackd = jnp.concatenate(
                [stackd, jnp.zeros((T, 8 - nf, G), stackd.dtype)], axis=1)
        return jnp.concatenate(
            [stackd,
             jnp.full((T_r - T + R, 8, G), jnp.nan, stackd.dtype)], axis=0)

    a_packed = pack_a(a_fields)
    b_packed = pack_b(b_fields)

    a_spec = pl.BlockSpec(
        (1, 8, G), lambda s, ai, bi, *rest: (ai[s], 0, 0))

    def b_spec(w):
        return pl.BlockSpec(
            (R // PB, 8, G),
            lambda s, ai, bi, *rest, w=w: (bi[s * W + w] & 0xFFFF, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 + NW,
        grid=(S_cap,),
        in_specs=[a_spec] + [b_spec(w) for w in range(W)],
        out_specs=[
            pl.BlockSpec((1, W * R, 128), lambda s, *_: (s, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM(
            (min(8, G // NB),
             (2 if moments else 1) * max(G, 128)), jnp.int32)],
    )

    kernel = functools.partial(_run_count_kernel, mask_kind, G, W, R, NB,
                               PB, dedup, moments)
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((S_cap, W * R, 128), jnp.int32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(a_idx, b_idx, *bm_words, nsteps, a_packed, *([b_packed] * W))
    if not reduce:
        # diagnostic: raw per-(pair, b-leaf) column counts (sum over mask
        # sublanes only; the cc field of the packed word under moments) —
        # used by the diag scripts to histogram column multiplicities
        return (out >> 23) if moments else out
    cc_plane = (out >> 23) if moments else out
    # reduce lanes in XLA (the kernel stays free of cross-lane reductions)
    counts = cc_plane.sum(axis=2, dtype=jnp.int32).reshape(S_cap * W * R)
    if moments:
        colmax = cc_plane.max(axis=2).reshape(S_cap * W * R)
        words = out.reshape(S_cap * W * R, 128)
        return counts, colmax, words
    if with_colmax:
        # per-pair max column multiplicity (same fused read pass as the
        # sum): colmax <= 2 routes the pair to the emit kernel's exact
        # column-moment compaction instead of the one-hot machinery
        return counts, cc_plane.max(axis=2).reshape(S_cap * W * R)
    return counts


def _group_emit_kernel(mask_kind: str, G: int, W: int, ROW_CAP: int,
                       CAP_PAIR: int, dedup: bool, CAPROWS: int,
                       ai_ref, bi_ref, nsteps_ref,   # scalar prefetch
                       *refs):
    """Emit kernel: dense contact stream for pre-counted pairs only.

    ``bi_ref`` entries pack ``tj | band << 16 | cnt << 20`` (cnt = the
    pair's exact contact count from kernel A, <= 255), so every control
    decision — skip, append length, flush — is scalar-prefetch-driven with
    zero vector->scalar syncs.  Contacts append at a running SMEM cursor
    into a circular VMEM stage, flushed to HBM in aligned (8, 128) blocks
    (see _stream_flush).  Slot-cap (ROW_CAP) violations accumulate in a
    VMEM flag row, written to meta at the last step.
    """
    aref = refs[0]
    brefs = refs[1:1 + W]
    gi_hbm, gj_hbm, meta = refs[1 + W:4 + W]
    (mscr, cur_ref, over_scr, stage_gi, stage_gj, sems) = refs[4 + W:]
    BH = G // N_BANDS

    s = pl.program_id(0)
    S_total = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        cur_ref[0] = 0      # contact cursor
        cur_ref[1] = 0      # flushed rows
        cur_ref[2] = 0      # overflow flag (bit 0: CAP exceeded)
        over_scr[0, :] = jnp.zeros((128,), jnp.float32)

    step_valid = s < nsteps_ref[0]

    @pl.when(step_valid)
    def _():
        a_blk = aref[0]
        cols = _acols(mask_kind, a_blk)
        ti = ai_ref[s]
        lane = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
        ri = jax.lax.broadcasted_iota(jnp.int32, (_STAGE_ROWS, 128), 0)
        li = jax.lax.broadcasted_iota(jnp.int32, (_STAGE_ROWS, 128), 1)

        def append(gi_row, gj_row, cnt_c):
            # append (1, 128) payload rows at the scalar cursor (cnt >
            # CAP_PAIR is flagged on the XLA side from kernel A's counts;
            # clamp keeps the stage select in its two-row window)
            cur = cur_ref[0]
            if "emit_noappend" not in ABLATE:
                sh = jax.lax.rem(cur, jnp.int32(128))
                row0 = jax.lax.rem(cur // 128, jnp.int32(_STAGE_ROWS))
                row1 = jax.lax.rem(row0 + 1, jnp.int32(_STAGE_ROWS))
                rgi = pltpu.roll(gi_row, sh, axis=1)
                rgj = pltpu.roll(gj_row, sh, axis=1)
                m_st = ((ri == row0) & (li >= sh) & (li < sh + cnt_c)) | \
                       ((ri == row1) & (li < sh + cnt_c - 128))
                stage_gi[:, :] = jnp.where(
                    m_st, jnp.broadcast_to(rgi, (_STAGE_ROWS, 128)),
                    stage_gi[:, :])
                stage_gj[:, :] = jnp.where(
                    m_st, jnp.broadcast_to(rgj, (_STAGE_ROWS, 128)),
                    stage_gj[:, :])
            new_cur = cur + cnt_c
            cur_ref[0] = new_cur

            @pl.when(new_cur // 128 - cur_ref[1] >= 8)
            def _():
                _stream_flush(stage_gi, stage_gj, gi_hbm, gj_hbm,
                              sems, cur_ref, CAPROWS)

        for w in range(W):
            bw = bi_ref[s * W + w]
            tj = bw & 0xFFFF
            bm = (bw >> 16) & ((1 << N_BANDS) - 1)
            cnt = (bw >> 20) & 0xFF
            # bit 28: every column of this pair's mask holds <= 2 contacts
            # (computed by the XLA regroup from the count kernel's raw
            # per-column rows) — routes to the column-moment compaction
            if "emit_nocol" in ABLATE or "emit_nofast" in ABLATE:
                okc = jnp.int32(0)
            else:
                okc = (bw >> 28) & 1
            b_blk = brefs[w][0]

            @pl.when(cnt > 0)
            def _(w=w, tj=tj, bm=bm, cnt=cnt, b_blk=b_blk):
                if "emit_nomask" in ABLATE:
                    # timing attribution only (WRONG contacts): charge no
                    # mask/scratch work, keep the compaction + append
                    mi = mscr[:, :]
                elif "emit_scratchless" in ABLATE:
                    # variant: unconditional full mask in registers — no
                    # (G, G) scratch roundtrip, no per-band branches (emit
                    # only sees hit-bearing pairs, so dead-band savings
                    # are smaller than in the count kernel)
                    mi = _band_mask(mask_kind, cols, b_blk, 0, G
                                    ).astype(jnp.float32)
                else:
                    mscr[:, :] = jnp.zeros((G, G), jnp.float32)
                    for r in range(N_BANDS):
                        @pl.when(((bm >> r) & 1) != 0)
                        def _(r=r):
                            m = _band_mask(mask_kind, cols, b_blk,
                                           r * BH, BH)
                            mscr[r * BH:(r + 1) * BH, :] = \
                                m.astype(jnp.float32)
                    mi = mscr[:, :]
                if dedup:
                    # phase 1 guarantees ti <= tj, so gj > gi reduces to
                    # the local triangle on the diagonal pair only
                    mi = jnp.where((tj != ti) | (lane > sub), mi, 0.0)

                # fast path: a single contact needs no compaction — its
                # (i, j) is the (exact, one-term) sum of mask * iota,
                # extracted with two DEFAULT-precision matmul reductions
                # and replicated across the payload row.  Ray pipelines
                # live here (59% of hit-bearing pairs carry cnt == 1 at
                # 100k x 262k; the (ROW_CAP, G, G) onehot machinery was
                # ~1 us/pair, ~110 ms of the ray total).
                one_c = jnp.int32(0 if "emit_nofast" in ABLATE else 1)

                @pl.when(cnt == one_c)
                def _(mi=mi, tj=tj):
                    f32 = jnp.float32
                    ones_g = jnp.ones((1, G), f32)
                    ones_m = jnp.ones((G, G), f32)
                    ri_sum = jax.lax.dot_general(
                        ones_g, mi * sub.astype(f32),
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=f32)     # (1, G) row sums
                    rj_sum = jax.lax.dot_general(
                        ones_g, mi * lane.astype(f32),
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=f32)
                    iv = jax.lax.dot_general(
                        ri_sum, ones_m,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=f32)     # (1, G) replicated
                    jv = jax.lax.dot_general(
                        rj_sum, ones_m,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=f32)
                    gi1 = (ti * G).astype(f32) + iv
                    gj1 = (tj * G).astype(f32) + jv
                    if G < 128:
                        z = jnp.zeros((1, 128 - G), jnp.float32)
                        gi1 = jnp.concatenate([gi1, z], axis=1)
                        gj1 = jnp.concatenate([gj1, z], axis=1)
                    append(gi1, gj1, jnp.int32(1))

                # cnt >= 2 with every mask column holding <= 2 contacts
                # (the okc flag; always true for cnt == 2): both contacts
                # of each live column come exactly from the column moments
                # cc/is/iq (integers; the quadratic's sqrt of a perfect
                # square and halvings are IEEE-exact), and the (1, G)
                # column vectors compact with a dual one-hot — 4 matmul
                # launches total vs the (ROW_CAP, G, G) one-hot machinery
                # (~1 us/pair).  Covers ~99.5% of 1M self-contact pairs
                # and ~all ray pairs (benchmarks/diag_1m.py, diag_rays.py).
                # The second-moment weights reach 127^2 — beyond bf16's
                # exact-integer range — so they ride <= 127 hi/lo split
                # fields (measured on-chip: unsplit DEFAULT passes rounded
                # the moments and emitted wrong contacts).
                two_min = jnp.int32(1 if "emit_nofast" in ABLATE else 2)

                @pl.when((cnt >= two_min) & (okc == 1))
                def _(mi=mi, tj=tj, cnt=cnt):
                    f32 = jnp.float32
                    ones_g = jnp.ones((1, G), f32)
                    sf = sub.astype(f32)
                    hi = jnp.floor(sf * sf * (1.0 / 128.0))
                    lo = sf * sf - hi * 128.0
                    X = jnp.concatenate(
                        [mi, mi * sf, mi * hi, mi * lo], axis=1)  # (G, 4G)
                    mom = jax.lax.dot_general(
                        ones_g, X,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=f32)               # (1, 4G)
                    cc = mom[:, 0:G]
                    is_ = mom[:, G:2 * G]
                    iq = 128.0 * mom[:, 2 * G:3 * G] + mom[:, 3 * G:4 * G]
                    d = jnp.sqrt(jnp.maximum(2.0 * iq - is_ * is_, 0.0))
                    two = cc == 2.0
                    live1 = cc >= 1.0
                    i1 = jnp.where(two, (is_ - d) * 0.5, is_)
                    i2 = (is_ + d) * 0.5
                    ltri = jnp.where(sub > lane, 1.0, 0.0)
                    pos = jax.lax.dot_general(
                        cc, ltri,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=f32)   # (1, G) excl prefix
                    # one-hot rows span all 128 output lanes (not
                    # CAP_PAIR): the matmul then yields (2, 128) rows
                    # directly — the (1, CAP_PAIR) ‖ (1, 128-CAP_PAIR)
                    # concatenate of the slow path is a Mosaic layout
                    # trap here (the dot_general slices carry a sublane
                    # offset; "offset mismatch on non-concat dimension").
                    # Lanes >= min(cnt, CAP_PAIR) are dead: the append
                    # stage masks li < cnt_c, identical to the slow
                    # path's truncation.
                    kcol = jax.lax.broadcasted_iota(
                        jnp.int32, (128, G), 0).astype(f32)
                    M1 = jnp.where((kcol == pos) & live1, 1.0, 0.0)
                    M2 = jnp.where((kcol == pos + 1.0) & two, 1.0, 0.0)
                    jf = jax.lax.broadcasted_iota(
                        jnp.int32, (1, G), 1).astype(f32)
                    V1 = jnp.concatenate(
                        [jnp.where(live1, i1, 0.0),
                         jnp.where(live1, jf, 0.0)], axis=0)      # (2, G)
                    V2 = jnp.concatenate(
                        [jnp.where(two, i2, 0.0),
                         jnp.where(two, jf, 0.0)], axis=0)
                    P1 = jax.lax.dot_general(
                        V1, M1, dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=f32)       # (2, 128)
                    P2 = jax.lax.dot_general(
                        V2, M2, dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=f32)
                    gi_row = (ti * G).astype(f32) + (P1[0:1] + P2[0:1])
                    gj_row = (tj * G).astype(f32) + (P1[1:2] + P2[1:2])
                    append(gi_row, gj_row, jnp.minimum(cnt, CAP_PAIR))

                slow_min = jnp.int32(1 if "emit_nofast" in ABLATE else 2)

                @pl.when((cnt >= slow_min) & (okc == 0))
                def _(mi=mi, tj=tj, cnt=cnt):
                    if "emit_noslow" in ABLATE:
                        # timing attribution only (WRONG contacts): skip
                        # the one-hot compaction, append constant rows
                        append(jnp.zeros((1, 128), jnp.float32),
                               jnp.zeros((1, 128), jnp.float32),
                               jnp.minimum(cnt, CAP_PAIR))
                        return
                    gi_row, gj_row, over_row = _pair_compact_vrows(
                        G, ROW_CAP, CAP_PAIR, ti, tj, mi)
                    over_scr[0, 0:G] = over_scr[0, 0:G] + over_row[0, :]
                    if CAP_PAIR < 128:
                        z = jnp.zeros((1, 128 - CAP_PAIR), jnp.float32)
                        gi_row = jnp.concatenate([gi_row, z], axis=1)
                        gj_row = jnp.concatenate([gj_row, z], axis=1)
                    append(gi_row, gj_row, jnp.minimum(cnt, CAP_PAIR))

    @pl.when(s == S_total - 1)
    def _():
        for _ in range(2):
            @pl.when((cur_ref[0] + 127) // 128 > cur_ref[1])
            def _():
                _stream_flush(stage_gi, stage_gj, gi_hbm, gj_hbm,
                              sems, cur_ref, CAPROWS)
        meta_lane = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
        meta_row = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0)
        meta[:, :] = jnp.where(
            meta_row == 1, jnp.broadcast_to(over_scr[0, :], (2, 128)),
            jnp.where(meta_lane == 0,
                      cur_ref[0].astype(jnp.float32),
                      jnp.where(meta_lane == 1,
                                cur_ref[2].astype(jnp.float32), 0.0)))


def _pair_compact_vrows(G, ROW_CAP, CAP_PAIR, ti, tj, mi):
    """_pair_compact_rows without the vector->scalar ``over`` reduction:
    returns ``(gi_row, gj_row, over_row)`` where ``over_row`` is a (1, G)
    f32 per-lane ROW_CAP-violation indicator (the caller accumulates it
    into a persistent flag row — no scalar sync).

    Every contraction carries only LOCAL indices (< G = 128; row counts
    <= G; offsets <= CAP_PAIR on every non-flagged pair), which bf16's
    8-bit mantissa represents exactly — so every matmul runs at DEFAULT
    precision (one MXU pass; the global-position payloads previously
    forced two 6-pass HIGHEST contractions here).  ``ti * G`` / ``tj * G``
    shift the compacted local rows to global positions at the end (pad
    lanes beyond the pair's count carry the bare shift, never consumed:
    the emit stage clips at ``cnt`` and extraction at the exact offsets).
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
    f32 = jnp.float32
    ltri_strict = jnp.where(sub > lane, 1.0, 0.0)
    row_pos = jax.lax.dot_general(
        mi, ltri_strict, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    ones_row = jnp.ones((1, G), f32)
    row_cnt_lane = jax.lax.dot_general(
        ones_row, mi, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    row_off_lane = jax.lax.dot_general(
        row_cnt_lane, ltri_strict,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    s_row = jax.lax.broadcasted_iota(jnp.int32, (ROW_CAP, G, G), 0
                                     ).astype(f32)
    onehot_row = jnp.where(
        (row_pos[None, :, :] == s_row) & (mi[None, :, :] > 0), 1.0, 0.0)
    j_local = lane.astype(f32)                       # b-leaf within tile
    jv = jnp.sum(onehot_row * j_local[None, :, :], axis=2)
    k_col = jax.lax.broadcasted_iota(jnp.int32, (CAP_PAIR, G), 0
                                     ).astype(f32)
    i_local = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1).astype(f32)
    acc_gi = jnp.zeros((CAP_PAIR, G), f32)
    acc_gj = jnp.zeros((CAP_PAIR, G), f32)
    for s in range(ROW_CAP):
        pos_s = row_off_lane + float(s)
        valid_s = row_cnt_lane > float(s)
        oh_s = jnp.where((pos_s == k_col) & valid_s, 1.0, 0.0)
        acc_gi = acc_gi + oh_s * i_local
        acc_gj = acc_gj + oh_s * jv[s:s + 1, :]
    gi_row = (ti * G).astype(f32) + jax.lax.dot_general(
        ones_row, acc_gi, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    gj_row = (tj * G).astype(f32) + jax.lax.dot_general(
        ones_row, acc_gj, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    over_row = jnp.where(row_cnt_lane > float(ROW_CAP), 1.0, 0.0)
    return gi_row, gj_row, over_row


@functools.partial(
    jax.jit,
    static_argnames=("mask_kind", "G", "W", "ROW_CAP", "CAP_PAIR",
                     "dedup", "CAP", "interpret"))
def tile_group_emit(a_idx, b_idx, nsteps, a_fields, b_fields=None, *,
                    mask_kind: str, G: int, W: int = 8,
                    ROW_CAP: int = 4, CAP_PAIR: int = 32,
                    dedup: bool = False, CAP: int = 1 << 17,
                    interpret: bool = False):
    """Run the emit kernel over pre-counted pairs (see _group_emit_kernel).

    ``b_idx`` entries pack ``tj | band << 16 | cnt << 20`` where ``cnt``
    is the pair's exact contact count from :func:`tile_run_counts`
    (pad slots carry cnt = 0).  Returns ``(gi_flat, gj_flat, total,
    flags)``: the leading ``total`` elements of the (CAP,) f32 arrays are
    the global sorted-order positions of every contact in deterministic
    kernel order; ``flags`` is an overflow bitmask whose bit 1 covers
    ROW_CAP violations only (CAP_PAIR violations are visible to the
    caller in the count kernel's output).  Requires ``CAP_PAIR <= 128``
    (per-pair rows append as one lane row) and ``CAP % 1024 == 0``
    (aligned flush quantum).
    """
    S_cap = a_idx.shape[0]
    if b_fields is None:
        b_fields = a_fields
    Fa, Fb = MASK_FIELD_COUNTS[mask_kind]
    assert len(a_fields) == Fa and len(b_fields) == Fb, \
        (mask_kind, len(a_fields), len(b_fields))
    assert CAP_PAIR <= 128 and CAP % 1024 == 0, (CAP_PAIR, CAP)
    CAPROWS = CAP // 128

    def pack(fields):
        T = fields[0].shape[0]
        stackd = jnp.stack(fields, axis=1)
        nf = len(fields)
        if nf < 8:
            stackd = jnp.concatenate(
                [stackd, jnp.zeros((T, 8 - nf, G), stackd.dtype)], axis=1)
        return jnp.concatenate(
            [stackd, jnp.full((1, 8, G), jnp.nan, stackd.dtype)], axis=0)

    a_packed = pack(a_fields)
    b_packed = pack(b_fields)

    a_spec = pl.BlockSpec(
        (1, 8, G), lambda s, ai, bi, ns: (ai[s], 0, 0))

    def b_spec(w):
        return pl.BlockSpec(
            (1, 8, G),
            lambda s, ai, bi, ns, w=w: (bi[s * W + w] & 0xFFFF, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S_cap,),
        in_specs=[a_spec] + [b_spec(w) for w in range(W)],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, 128), lambda s, *_: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, G), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.VMEM((_STAGE_ROWS, 128), jnp.float32),
            pltpu.VMEM((_STAGE_ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(_group_emit_kernel, mask_kind, G, W,
                               ROW_CAP, CAP_PAIR, dedup, CAPROWS)
    gi_hbm, gj_hbm, meta = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((CAPROWS, 128), jnp.float32),
            jax.ShapeDtypeStruct((CAPROWS, 128), jnp.float32),
            jax.ShapeDtypeStruct((2, 128), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT, has_side_effects=True),
        interpret=interpret,
    )(a_idx, b_idx, nsteps, a_packed, *([b_packed] * W))
    total = meta[0, 0].astype(jnp.int32)
    flags = (meta[0, 1].astype(jnp.int32)
             | jnp.where(total > CAP, 1, 0)
             | jnp.where(meta[1, :].sum() > 0, 2, 0))
    return gi_hbm.reshape(-1), gj_hbm.reshape(-1), total, flags


# ---------------------------------------------------------------------------
# Grouped ("wide") kernel: one a-tile vs W b-tiles per grid step
# ---------------------------------------------------------------------------

def _group_kernel(mask_kind: str, G: int, W: int, ROW_CAP: int,
                  CAP_PAIR: int, dedup: bool,
                  ai_ref, bi_ref, nsteps_ref,   # scalar prefetch
                  *refs):
    """One a-tile against W b-tiles per grid step, banded.

    The per-pair kernel above is bounded by per-pair scalar sequencing and
    mask issue; grouping W pairs that share the a-tile amortizes the scalar
    overhead and the a-side DMA W-fold.  Each ``bi_ref`` entry carries the
    b-tile index in its low 16 bits and an N_BANDS-bit sub-band mask in the
    high bits (phase 1 computes which (G/N_BANDS)-leaf sub-bands of the
    a-tile can touch the b-tile, ops/subtile.py): the mask — the dominant
    kernel cost, at measured VPU peak with a 0.0016%% hit rate — is only
    computed for live bands, via pl.when writes into a (G, G) scratch.
    Validity is still also encoded in the data (padded tiles/lanes hold
    NaN fields, whose comparisons are false).

    refs: a block (1, 8, G); W b blocks (1, 8, G); ONE packed output with
    (1, W, 2*seg+128) blocks (see _seg); (G, G) f32 mask scratch.
    """
    aref = refs[0]
    brefs = refs[1:1 + W]
    out = refs[1 + W]
    mscr = refs[2 + W]          # (G, G) f32 band-mask scratch
    seg = _seg(CAP_PAIR)
    BH = G // N_BANDS

    s = pl.program_id(0)
    step_valid = s < nsteps_ref[0]

    @pl.when(jnp.logical_not(step_valid))
    def _():
        out[0, :, 2 * seg:2 * seg + 128] = jnp.zeros((W, 128), jnp.float32)

    @pl.when(step_valid)
    def _():
        a_blk = aref[0]                             # (8, G)
        cols = _acols(mask_kind, a_blk)
        ti = ai_ref[s]
        lane = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
        meta_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        for w in range(W):
            bw = bi_ref[s * W + w]
            tj = bw & 0xFFFF
            bm = (bw >> 16) & ((1 << N_BANDS) - 1)

            # Per-band pl.when writes into the (G, G) VMEM scratch: dead
            # bands cost one (cheap, ~5 ns) untaken branch.  Two measured
            # dead ends at 1M (both +19 ms): value-carrying lax.cond per
            # band (Mosaic computes both branches of vector-valued conds)
            # and per-band dedup/count with an SMEM scalar accumulator
            # (one scalar<->vector sync per band region) — so the dedup
            # select and the single count reduction stay at (G, G) on the
            # value read back from the scratch.
            b_blk = brefs[w][0]
            mscr[:, :] = jnp.zeros((G, G), jnp.float32)
            for r in range(N_BANDS):
                @pl.when(((bm >> r) & 1) != 0)
                def _(r=r, b_blk=b_blk):
                    m = _band_mask(mask_kind, cols, b_blk, r * BH, BH)
                    mscr[r * BH:(r + 1) * BH, :] = m.astype(jnp.float32)
            mi = mscr[:, :]
            gi = ti * G + sub
            gj = tj * G + lane
            if dedup:
                # self-contact: global sorted-order j > i (ref lvt
                # traverse_single.jl:163-167)
                mi = jnp.where(gj > gi, mi, 0.0)
            total = jnp.sum(mi)
            # count row (zero overflow); _pair_compact overwrites it with
            # the real count + slot-cap overflow when contacts exist
            out[0, w, 2 * seg:2 * seg + 128] = jnp.where(
                meta_lane[0] == 0, total, 0.0)

            @pl.when(total > 0.0)
            def _(w=w, ti=ti, tj=tj, mi=mi, total=total):
                _pair_compact(G, ROW_CAP, CAP_PAIR, ti, tj, mi,
                              total, meta_lane, out, w)


@functools.partial(
    jax.jit,
    static_argnames=("mask_kind", "G", "W", "ROW_CAP", "CAP_PAIR",
                     "dedup", "interpret"))
def tile_group_contacts(a_idx, b_idx, nsteps, a_fields, b_fields=None, *,
                        mask_kind: str, G: int, W: int = 8,
                        ROW_CAP: int = 4, CAP_PAIR: int = 16,
                        dedup: bool = False, interpret: bool = False):
    """Run the grouped tile-contact kernel.

    - ``a_idx``: (S_cap,) int32 a-tile index per step.
    - ``b_idx``: (S_cap * W,) int32 entries ``tj | band_bits << 16``, flat
      row-major (2D SMEM prefetch arrays pad the minor dim to 128 lanes —
      1D stays compact): low 16 bits = b-tile index, high bits = the
      N_BANDS-bit a-sub-band liveness mask from phase 1 (all-ones when the
      caller has no band information).  Pad entries carry band bits 0 (and
      conventionally point at the NaN pad tile appended to ``b_fields``).
    - ``nsteps``: (1,) int32 number of valid steps.
    - ``a_fields``/``b_fields``: (T, G) f32 field tuples; a NaN pad tile is
      appended to each side here, so padded b slots and padded lanes produce
      an all-false mask.

    Returns ``(slots, counts, overflow)`` with per-pair packed rows
    (S_cap * W, 2*seg+128), matching :func:`tile_pair_contacts`.
    """
    S_cap = a_idx.shape[0]
    if b_fields is None:
        b_fields = a_fields
    Fa, Fb = MASK_FIELD_COUNTS[mask_kind]
    assert len(a_fields) == Fa and len(b_fields) == Fb, \
        (mask_kind, len(a_fields), len(b_fields))

    def pack(fields):
        T = fields[0].shape[0]
        stackd = jnp.stack(fields, axis=1)
        nf = len(fields)
        if nf < 8:
            stackd = jnp.concatenate(
                [stackd, jnp.zeros((T, 8 - nf, G), stackd.dtype)], axis=1)
        # append the NaN pad tile (index T)
        return jnp.concatenate(
            [stackd, jnp.full((1, 8, G), jnp.nan, stackd.dtype)], axis=0)

    a_packed = pack(a_fields)
    b_packed = pack(b_fields)

    a_spec = pl.BlockSpec(
        (1, 8, G), lambda s, ai, bi, ns: (ai[s], 0, 0))

    def b_spec(w):
        # low 16 bits = tile index (high bits carry the band mask)
        return pl.BlockSpec(
            (1, 8, G),
            lambda s, ai, bi, ns, w=w: (bi[s * W + w] & 0xFFFF, 0, 0))

    seg = _seg(CAP_PAIR)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S_cap,),
        in_specs=[a_spec] + [b_spec(w) for w in range(W)],
        out_specs=[
            pl.BlockSpec((1, W, 2 * seg + 128), lambda s, *_: (s, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((G, G), jnp.float32)],
    )

    kernel = functools.partial(_group_kernel, mask_kind, G, W, ROW_CAP,
                               CAP_PAIR, dedup)
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((S_cap, W, 2 * seg + 128), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(a_idx, b_idx, nsteps, a_packed, *([b_packed] * W))
    counts = out[:, :, 2 * seg].astype(jnp.int32).reshape(S_cap * W)
    over = out[:, :, 2 * seg + 1].sum() > 0
    return out.reshape(S_cap * W, 2 * seg + 128), counts, over
