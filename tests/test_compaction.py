"""Unit tests for ops/compaction.py — the generic Pallas stream compactor.

Runs in interpret mode on the CPU backend (tests/conftest.py), with
differential validation against a NumPy reference compaction.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from implicitbvh_tpu.ops.compaction import G, finish_compact, tile_compact


def _ref_compact(mask, payloads):
    idx = np.nonzero(mask)[0]
    return [np.asarray(p)[idx] for p in payloads]


def _run(mask_np, payloads_np, cap=256, row_cap=8, capacity=None):
    m = jnp.asarray(mask_np)
    ps = tuple(jnp.asarray(p, jnp.float32) for p in payloads_np)
    slots, counts, overflow = tile_compact(m, ps, cap=cap, row_cap=row_cap,
                                           interpret=True)
    if capacity is None:
        capacity = 1 << int(np.ceil(np.log2(max(int(mask_np.sum()), 2))))
    outs, total = finish_compact(slots, counts, capacity)
    return outs, int(total), bool(overflow)


def test_compact_random_differential():
    rng = np.random.default_rng(0)
    M = 4 * G * G
    mask = rng.random(M) < 0.03
    pay1 = rng.integers(0, 1 << 20, M).astype(np.float32)
    pay2 = rng.integers(0, 1 << 20, M).astype(np.float32)
    outs, total, overflow = _run(mask, (pay1, pay2), cap=1024, row_cap=16)
    assert not overflow
    ref1, ref2 = _ref_compact(mask, (pay1, pay2))
    assert total == len(ref1)
    # compaction is stable within a mega-tile and tiles are emitted in
    # order, so the output order matches the flat order exactly
    np.testing.assert_array_equal(np.asarray(outs[0][:total]),
                                  ref1.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(outs[1][:total]),
                                  ref2.astype(np.int32))


def test_compact_empty_and_full_rows():
    M = G * G
    mask = np.zeros(M, bool)
    mask[:G] = True            # one full 128-row
    pay = np.arange(M, dtype=np.float32)
    outs, total, overflow = _run(mask, (pay,), cap=256, row_cap=128)
    assert not overflow and total == G
    np.testing.assert_array_equal(np.asarray(outs[0][:G]), np.arange(G))

    outs, total, overflow = _run(np.zeros(M, bool), (pay,), cap=64)
    assert not overflow and total == 0


def test_compact_row_cap_overflow_flag():
    M = G * G
    mask = np.zeros(M, bool)
    mask[:10] = True           # 10 survivors in one 128-row
    pay = np.arange(M, dtype=np.float32)
    _, _, overflow = _run(mask, (pay,), cap=256, row_cap=4)
    assert overflow
    _, _, overflow = _run(mask, (pay,), cap=256, row_cap=16)
    assert not overflow


def test_compact_tile_cap_overflow_flag():
    rng = np.random.default_rng(1)
    M = G * G
    mask = rng.random(M) < 0.5
    pay = np.arange(M, dtype=np.float32)
    _, _, overflow = _run(mask, (pay,), cap=64, row_cap=128)
    assert overflow


def test_compact_garbage_payload_in_dead_slots():
    """Dead (masked-out) payload slots may hold NaN/inf — e.g. outputs of
    skipped Pallas grid steps — and must not poison the compaction."""
    M = 2 * G * G
    rng = np.random.default_rng(2)
    mask = rng.random(M) < 0.02
    pay = rng.integers(0, 1 << 16, M).astype(np.float32)
    pay_dirty = np.where(mask, pay, np.inf).astype(np.float32)
    outs, total, overflow = _run(mask, (pay_dirty,), cap=512, row_cap=16)
    assert not overflow
    (ref,) = _ref_compact(mask, (pay,))
    assert total == len(ref)
    np.testing.assert_array_equal(np.asarray(outs[0][:total]),
                                  ref.astype(np.int32))
