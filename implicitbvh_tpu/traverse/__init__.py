from .types import BFSTraversal, BVHTraversal, LVTTraversal, TraversalAlgorithm
from .api import default_start_level, traverse
from .lvt import (traverse_lvt_pair_fixed, traverse_lvt_single_fixed,
                  default_start_level_lvt)
from .tiles import (TileTraversal, traverse_tiles, traverse_tiles_fixed,
                    traverse_tiles_pair, traverse_tiles_pair_fixed)
from .ray_tiles import traverse_rays_tiles, traverse_rays_tiles_fixed
from .dfs import DFSTraversal, traverse_dfs_single, dfs_single_fixed

__all__ = [
    "BFSTraversal", "BVHTraversal", "DFSTraversal", "LVTTraversal",
    "TileTraversal", "traverse_dfs_single", "dfs_single_fixed",
    "TraversalAlgorithm", "default_start_level", "traverse",
    "traverse_lvt_single_fixed", "traverse_lvt_pair_fixed",
    "traverse_tiles", "traverse_tiles_fixed",
    "traverse_tiles_pair", "traverse_tiles_pair_fixed",
    "traverse_rays_tiles", "traverse_rays_tiles_fixed",
]
