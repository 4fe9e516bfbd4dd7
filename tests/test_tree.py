"""ImplicitTree shape/indexing tests.

Port of reference coverage /root/reference/test/runtests.jl:123-176 —
including the hand-drawn 4-leaf and 11-leaf trees.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from implicitbvh_tpu.tree import (ImplicitTree, compute_skips,
                                  isvirtual_traced, memory_index_traced)


def test_tree_4_leaves():
    #      1
    #   2     3
    #  4 5   6 7
    tree = ImplicitTree.from_num_leaves(4)
    assert tree.levels == 3
    assert tree.real_leaves == 4
    assert tree.real_nodes == 7
    assert tree.virtual_leaves == 0
    assert tree.virtual_nodes == 0
    for i in range(1, 8):
        assert tree.memory_index(i) == i
        assert not tree.isvirtual(i)
    assert tree.level_indices(1) == (1, 1)
    assert tree.level_indices(2) == (2, 3)
    assert tree.level_indices(3) == (4, 7)


def test_tree_5_leaves():
    # docstring example of ref implicit_tree.jl:14-50
    tree = ImplicitTree.from_num_leaves(5)
    assert (tree.levels, tree.real_leaves, tree.real_nodes,
            tree.virtual_leaves, tree.virtual_nodes) == (4, 5, 11, 3, 4)
    assert tree.memory_index(8) == 7
    assert tree.level_indices(3) == (4, 6)
    assert not tree.isvirtual(6)
    assert tree.isvirtual(7)


def test_tree_11_leaves():
    # 11 leaves: levels=5, virtual leaves = 16-11 = 5
    tree = ImplicitTree.from_num_leaves(11)
    assert tree.levels == 5
    assert tree.virtual_leaves == 5
    # virtual nodes: 5 leaves + floor(5/2)=2 at level 4 + floor(5/4)=1 at
    # level 3 -> check against popcount formula
    assert tree.virtual_nodes == 2 * 5 - bin(5).count("1")
    assert tree.real_nodes == 2 * 11 - 1 + bin(5).count("1")
    # level 4 has 16/2 - floor(5/2) = 6 real nodes
    assert tree.level_nodes(4) == 6
    assert tree.level_nodes(5) == 11
    # leaf 16+10=26 is the last real leaf; 27.. are virtual
    assert not tree.isvirtual(26)
    assert tree.isvirtual(27)
    assert tree.isvirtual(31)
    # memory indices are contiguous per level
    start, stop = tree.level_indices(5)
    assert stop - start + 1 == 11


def test_memory_index_consistency_random():
    rng = np.random.default_rng(0)
    for n in [1, 2, 3, 5, 17, 100, 1000, 4097]:
        tree = ImplicitTree.from_num_leaves(n)
        # every real node's memory index is unique and 1..real_nodes
        seen = set()
        for level in range(1, tree.levels + 1):
            first = 1 << (level - 1)
            for i in range(first, first + tree.level_nodes(level)):
                assert not tree.isvirtual(i)
                m = tree.memory_index(i)
                assert m not in seen
                seen.add(m)
        assert seen == set(range(1, tree.real_nodes + 1))


def test_traced_matches_static():
    for n in (5, 11, 100, 257):
        tree = ImplicitTree.from_num_leaves(n)
        skips = compute_skips(tree)
        all_real = []
        for level in range(1, tree.levels + 1):
            first = 1 << (level - 1)
            all_real.extend(range(first, first + (1 << (level - 1))))
        idx = jnp.asarray(all_real, dtype=jnp.int32)
        virt_t = np.asarray(isvirtual_traced(tree, idx))
        virt_s = np.array([tree.isvirtual(int(i)) for i in all_real])
        np.testing.assert_array_equal(virt_t, virt_s)
        mem_t = np.asarray(memory_index_traced(tree, idx, skips))
        for k, i in enumerate(all_real):
            if not virt_s[k]:
                assert mem_t[k] == tree.memory_index(int(i))


def test_bounds_errors():
    tree = ImplicitTree.from_num_leaves(5)
    with pytest.raises(IndexError):
        tree.memory_index(0)
    with pytest.raises(IndexError):
        tree.memory_index(16)
    with pytest.raises(IndexError):
        tree.level_indices(5)
    with pytest.raises(ValueError):
        ImplicitTree.from_num_leaves(0)
