"""Traversal dispatcher: picks the right kernel for the scene, statically.

The reference selects among traversal kernels per scene feature set
(normal / instanced / alpha / alpha-smooth, GPUOCLKernels.cpp:424-512);
here the axes are scene SIZE (dense brute force below DENSE_MAX_TRIS,
wide-BVH above) and BACKEND (the Pallas packet kernel on TPU, the XLA
wide-BVH loop elsewhere / when the pools exceed the VMEM budget). The
choice happens at trace time from static shapes + the default backend, so
each variant jits once.
"""
from __future__ import annotations

import jax

from hydracore_tpu.bvh.wide import LEAF_SIZE
from hydracore_tpu.ops import (traverse_cluster, traverse_dense,
                               traverse_packet, traverse_wide)

# packet-kernel pools must fit VMEM next to ray blocks and outputs
_PKT_VMEM_BUDGET = 12 * 1024 * 1024
# cluster pools: (Cp,12,128) f32 tri blocks must fit VMEM
_CL_MAX_CP = 1024


def _use_dense(scene) -> bool:
    return scene.wbvh_tri9f.shape[0] * LEAF_SIZE <= traverse_dense.DENSE_MAX_TRIS * 2


def _use_cluster(scene) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return scene.cl_tris.shape[0] <= _CL_MAX_CP


def _use_packet(scene) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    pool_bytes = (scene.pkt_nodes.shape[0] * 2 + scene.pkt_tris.shape[0]) * 512
    return pool_bytes <= _PKT_VMEM_BUDGET


def _pick(scene):
    if _use_dense(scene):
        return traverse_dense
    if _use_cluster(scene):
        return traverse_cluster
    if _use_packet(scene):
        return traverse_packet
    return traverse_wide


def closest_hit(scene, ray_o, ray_d, t_max=1e30, active=None):
    return _pick(scene).closest_hit(scene, ray_o, ray_d, t_max, active)


def any_hit(scene, ray_o, ray_d, t_max, active=None):
    return _pick(scene).any_hit(scene, ray_o, ray_d, t_max, active)
