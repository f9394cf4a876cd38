"""Traversal dispatcher: picks the right kernel for the scene, statically.

The reference selects among traversal kernels per scene feature set
(normal / instanced / alpha / alpha-smooth, GPUOCLKernels.cpp:424-512);
here the axes are scene SIZE (dense brute force below DENSE_MAX_TRIS,
wide-BVH above) — the choice happens at trace time from static shapes, so
each variant jits once.
"""
from __future__ import annotations

from hydracore_tpu.bvh.wide import LEAF_SIZE
from hydracore_tpu.ops import traverse_dense, traverse_wide


def _use_dense(scene) -> bool:
    return scene.wbvh_tri9f.shape[0] * LEAF_SIZE <= traverse_dense.DENSE_MAX_TRIS * 2


def closest_hit(scene, ray_o, ray_d, t_max=1e30, active=None):
    mod = traverse_dense if _use_dense(scene) else traverse_wide
    return mod.closest_hit(scene, ray_o, ray_d, t_max, active)


def any_hit(scene, ray_o, ray_d, t_max, active=None):
    mod = traverse_dense if _use_dense(scene) else traverse_wide
    return mod.any_hit(scene, ray_o, ray_d, t_max, active)
