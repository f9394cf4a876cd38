"""Dense small-scene traversal: brute-force over padded triangle blocks.

For scenes below a few hundred triangles the BVH machinery (carried state +
per-iteration loop body) costs far more than simply intersecting EVERY
triangle with dense (R, B) vector math — zero gathers, zero carried loop
state, everything fuses. This is the TPU-native expression of "the VPU is
the warp": 1M rays x 16 triangle slots is one fused kernel.

The dispatcher in ops/trace_api.py picks this path statically by scene
size (the reference analogue is picking among its 4 BVH trees / traversal
kernels per scene feature set, GPUOCLKernels.cpp:424-512).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hydracore_tpu.bvh.wide import LEAF_SIZE

DENSE_MAX_TRIS = 512  # static dispatch threshold


@partial(jax.jit, static_argnames=("any_hit_mode",))
def _traverse_dense(tri9f, slot_tri, ray_o, ray_d, t_max, active_in, any_hit_mode=False):
    R = ray_o.shape[0]
    B = tri9f.shape[0]
    tri = tri9f.reshape(1, B * LEAF_SIZE, 16)  # broadcast over rays

    ox, oy, oz = ray_o[:, 0:1], ray_o[:, 1:2], ray_o[:, 2:3]
    dx, dy, dz = ray_d[:, 0:1], ray_d[:, 1:2], ray_d[:, 2:3]

    v0x, v0y, v0z = tri[:, :, 0], tri[:, :, 1], tri[:, :, 2]
    e1x, e1y, e1z = tri[:, :, 3], tri[:, :, 4], tri[:, :, 5]
    e2x, e2y, e2z = tri[:, :, 6], tri[:, :, 7], tri[:, :, 8]

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    u = (sx * px + sy * py + sz * pz) * inv
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    hit = (inv != 0.0) & (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t > 1e-5) \
        & (t < t_max[:, None]) & active_in[:, None]

    t_m = jnp.where(hit, t, jnp.float32(3.0e38))
    t_k = t_m.min(axis=1)
    found = t_k < 3.0e37
    win = (t_m == t_k[:, None]) & hit
    win = win & (jnp.cumsum(win.astype(jnp.int32), axis=1) == 1)
    winf = win.astype(jnp.float32)
    slots = jnp.arange(B * LEAF_SIZE)[None, :]
    slot = (win * slots).sum(axis=1)
    u_best = (winf * u).sum(axis=1)
    v_best = (winf * v).sum(axis=1)
    tri_best = jnp.where(found, slot_tri[jnp.clip(slot, 0, slot_tri.shape[0] - 1)], -1)
    t_out = jnp.where(found, t_k, jnp.inf)
    return t_out, tri_best, u_best, v_best


def closest_hit(scene, ray_o, ray_d, t_max=1e30, active=None):
    if active is None:
        active = jnp.ones(ray_o.shape[0], bool)
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (ray_o.shape[0],))
    return _traverse_dense(scene.wbvh_tri9f, scene.wbvh_slot_tri, ray_o, ray_d, tm, active)


def any_hit(scene, ray_o, ray_d, t_max, active=None):
    if active is None:
        active = jnp.ones(ray_o.shape[0], bool)
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (ray_o.shape[0],))
    _, tri, _, _ = _traverse_dense(scene.wbvh_tri9f, scene.wbvh_slot_tri, ray_o, ray_d, tm,
                                   active, any_hit_mode=True)
    return tri >= 0
