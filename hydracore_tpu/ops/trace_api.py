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
import jax.numpy as jnp

from hydracore_tpu.bvh.wide import LEAF_SIZE
from hydracore_tpu.ops import (traverse_cluster, traverse_dense,
                               traverse_packet, traverse_wide)

import os as _os

# packet-kernel pools must fit VMEM next to ray blocks and outputs
_PKT_VMEM_BUDGET = 12 * 1024 * 1024
# cluster path cap == the VMEM-resident pool limit (Cp clusters x 6 KiB
# Woop block; 1024 -> 6 MiB; HYDRA_CL_MAX_CP overrides for hardware A/B).
# Scenes past the cap build the partitioned chunk layout at scene compile
# (bvh/clusters.py partition_clusters) and chain the kernel over chunks.
# The alternative HBM-streaming big mode was deleted in r5 after losing
# its hardware A/B to the chain (0.7 vs 1.2 Mrays/s on Benchmark_Scene03;
# see traverse_cluster.py NOTE).
_CL_MAX_CP = int(_os.environ.get("HYDRA_CL_MAX_CP", "1024"))


def _use_dense(scene) -> bool:
    return scene.wbvh_tri9f.shape[0] * LEAF_SIZE <= traverse_dense.DENSE_MAX_TRIS * 2


def _use_cluster(scene) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if scene.cl_tris.ndim == 4:
        # partitioned big-scene layout (bvh/clusters.py partition_clusters):
        # every chunk fits VMEM by construction; traverse_cluster chains
        # the kernel over chunks with t-threading (the reference's
        # multi-tree bounce loop, GPUOCLKernels.cpp:424-512)
        return True
    return scene.cl_tris.shape[0] <= _CL_MAX_CP


def _use_packet(scene) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    pool_bytes = (scene.pkt_nodes.shape[0] * 2 + scene.pkt_tris.shape[0]) * 512
    return pool_bytes <= _PKT_VMEM_BUDGET


def _pick(scene):
    # two-level instanced layout: only the cluster kernel understands it
    # (interpret mode off-TPU; see traverse_cluster._scene_inst)
    if getattr(scene, "cl_map", None) is not None:
        return traverse_cluster
    if _use_dense(scene):
        return traverse_dense
    if _use_cluster(scene):
        return traverse_cluster
    if _use_packet(scene):
        return traverse_packet
    return traverse_wide


def closest_hit(scene, ray_o, ray_d, t_max=1e30, active=None,
                kind="primary"):
    mod = _pick(scene)
    if mod is traverse_cluster:  # per-wavefront-kind ray-block size
        return mod.closest_hit(scene, ray_o, ray_d, t_max, active, kind)
    return mod.closest_hit(scene, ray_o, ray_d, t_max, active)


def any_hit(scene, ray_o, ray_d, t_max, active=None):
    return _pick(scene).any_hit(scene, ray_o, ray_d, t_max, active)


# ----------------------------------------------------------------------------
# Coherence-sorted traversal (screen.cl:155 Morton z-index sort analogue):
# block kernels (cluster/packet) live on per-256-ray-block AABB coherence, so
# secondary wavefronts are sorted by (direction octant, origin Morton) before
# traversal and results are scattered back to wavefront order.
# ----------------------------------------------------------------------------

def _spread10(x):
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def ray_sort_key(scene, ray_o, ray_d):
    """uint32 coherence key: 3-bit direction octant (major) + 29-bit origin
    Morton code over the scene bounds. Octant-major wins on block kernels:
    front-to-back pruning needs a shared octant per block."""
    q = (ray_o - scene.world_bmin) / scene.world_bext * 1023.0
    q = jnp.clip(q, 0.0, 1023.0).astype(jnp.uint32)
    m = (_spread10(q[:, 0]) | (_spread10(q[:, 1]) << 1)
         | (_spread10(q[:, 2]) << 2))
    oct_ = ((ray_d[:, 0] > 0).astype(jnp.uint32)
            | ((ray_d[:, 1] > 0).astype(jnp.uint32) << 1)
            | ((ray_d[:, 2] > 0).astype(jnp.uint32) << 2))
    return (oct_ << 29) | (m >> 1)


def wants_sorted_rays(scene) -> bool:
    return _pick(scene) is traverse_cluster


def closest_hit_sorted(scene, ray_o, ray_d, t_max=1e30, active=None):
    if not wants_sorted_rays(scene):
        return closest_hit(scene, ray_o, ray_d, t_max, active)
    R = ray_o.shape[0]
    key = ray_sort_key(scene, ray_o, ray_d)
    if active is not None:  # dead rays pack into all-dead (floor-cost) blocks
        key = jnp.where(active, key, jnp.uint32(0xFFFFFFFF))
    _, idx = jax.lax.sort_key_val(key, jnp.arange(R, dtype=jnp.int32))
    act = None if active is None else active[idx]
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    t, tri, u, v = closest_hit(scene, ray_o[idx], ray_d[idx], tm[idx], act)
    inv = jnp.zeros(R, jnp.int32).at[idx].set(jnp.arange(R, dtype=jnp.int32))
    return t[inv], tri[inv], u[inv], v[inv]


def has_shadow_split(scene) -> bool:
    """True when the opaque/alpha split shadow sets are available and the
    active backend can consume them (cluster kernel, flattened layout)."""
    return (getattr(scene, "cl_tris_shadow", None) is not None
            and _pick(scene) is traverse_cluster)


def any_hit_opaque(scene, ray_o, ray_d, t_max, active=None,
                   presorted=False):
    """Occlusion by OPAQUE geometry only (the shadow pool degenerates
    alpha/skip_shadow lanes). Callers handle the alpha set separately via
    alpha_layer_hit — together the reference's one-walk transparent shadow
    query (trace.cl:244-551)."""
    if presorted:
        return traverse_cluster.any_hit(scene, ray_o, ray_d, t_max,
                                        active=active, opaque_only=True)
    R = ray_o.shape[0]
    key = ray_sort_key(scene, ray_o, ray_d)
    if active is not None:
        key = jnp.where(active, key, jnp.uint32(0xFFFFFFFF))
    _, idx = jax.lax.sort_key_val(key, jnp.arange(R, dtype=jnp.int32))
    act = None if active is None else active[idx]
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    occ = traverse_cluster.any_hit(scene, ray_o[idx], ray_d[idx], tm[idx],
                                   active=act, opaque_only=True)
    inv = jnp.zeros(R, jnp.int32).at[idx].set(jnp.arange(R, dtype=jnp.int32))
    return occ[inv]


def alpha_layer_hit(scene, ray_o, ray_d, t_lo, t_hi, active):
    """Closest hit strictly inside (t_lo, t_hi) over the DENSE alpha
    triangle set (scene.alpha_tri9f) — one fused MT block, no traversal.
    Returns (t, tri_id, u, v); tri_id -1 on miss."""
    from hydracore_tpu.ops.intersect import want_double

    tri = scene.alpha_tri9f  # (9, A)
    if want_double(scene):  # -double_rt: alpha-layer MT in float64
        tri = tri.astype(jnp.float64)
        ray_o = ray_o.astype(jnp.float64)
        ray_d = ray_d.astype(jnp.float64)
    ox, oy, oz = ray_o[:, 0:1], ray_o[:, 1:2], ray_o[:, 2:3]
    dx, dy, dz = ray_d[:, 0:1], ray_d[:, 1:2], ray_d[:, 2:3]
    v0x, v0y, v0z = tri[0][None], tri[1][None], tri[2][None]
    e1x, e1y, e1z = tri[3][None], tri[4][None], tri[5][None]
    e2x, e2y, e2z = tri[6][None], tri[7][None], tri[8][None]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv = jnp.where(jnp.abs(det) > 1e-12,
                    1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    u = (sx * px + sy * py + sz * pz) * inv
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    hit = (inv != 0.0) & (u >= 0) & (v >= 0) & (u + v <= 1.0) \
        & (t > t_lo[:, None]) & (t < t_hi[:, None]) & active[:, None]
    t_m = jnp.where(hit, t, jnp.float32(3.0e38))
    k = jnp.argmin(t_m, axis=1)
    t_k = jnp.take_along_axis(t_m, k[:, None], 1)[:, 0].astype(jnp.float32)
    u_k = jnp.take_along_axis(u, k[:, None], 1)[:, 0].astype(jnp.float32)
    v_k = jnp.take_along_axis(v, k[:, None], 1)[:, 0].astype(jnp.float32)
    found = t_k < 3.0e38
    tid = jnp.where(found, scene.alpha_tri_id[k], -1)
    return t_k, tid, jnp.where(found, u_k, 0.0), jnp.where(found, v_k, 0.0)


def any_hit_sorted(scene, ray_o, ray_d, t_max, active=None):
    if not wants_sorted_rays(scene):
        return any_hit(scene, ray_o, ray_d, t_max, active)
    R = ray_o.shape[0]
    key = ray_sort_key(scene, ray_o, ray_d)
    if active is not None:
        key = jnp.where(active, key, jnp.uint32(0xFFFFFFFF))
    _, idx = jax.lax.sort_key_val(key, jnp.arange(R, dtype=jnp.int32))
    act = None if active is None else active[idx]
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    occ = any_hit(scene, ray_o[idx], ray_d[idx], tm[idx], act)
    inv = jnp.zeros(R, jnp.int32).at[idx].set(jnp.arange(R, dtype=jnp.int32))
    return occ[inv]
