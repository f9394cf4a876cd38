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

DENSE_MAX_TRIS = 512  # single-shot threshold; blocked path above
BLOCK_SLOTS = 2048  # triangle slots per dense block (bounded intermediates)


def _mt_block(tri, ox, oy, oz, dx, dy, dz, t_cap, active_in):
    """Dense Möller–Trumbore of all rays vs one (9, S) field-major tri
    block. Returns (t_k, u_k, v_k, k) per ray within the block."""
    v0x, v0y, v0z = tri[0][None], tri[1][None], tri[2][None]
    e1x, e1y, e1z = tri[3][None], tri[4][None], tri[5][None]
    e2x, e2y, e2z = tri[6][None], tri[7][None], tri[8][None]
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
        & (t < t_cap[:, None]) & active_in[:, None]
    t_m = jnp.where(hit, t, jnp.float32(3.0e38))
    k = jnp.argmin(t_m, axis=1)
    t_k = jnp.take_along_axis(t_m, k[:, None], 1)[:, 0]
    u_k = jnp.take_along_axis(u, k[:, None], 1)[:, 0]
    v_k = jnp.take_along_axis(v, k[:, None], 1)[:, 0]
    return t_k, u_k, v_k, k.astype(jnp.int32)


@partial(jax.jit, static_argnames=("any_hit_mode", "f64"))
def _traverse_dense(tri9f, slot_tri, ray_o, ray_d, t_max, active_in,
                    any_hit_mode=False, f64=False):
    R = ray_o.shape[0]
    B = tri9f.shape[0]
    S = B * LEAF_SIZE  # total triangle slots
    # slot-major (B, L, 16) -> (16, S): tri_fields[f, slot]
    tri_fields = jnp.transpose(tri9f.reshape(B * LEAF_SIZE, 16), (1, 0))
    if f64:  # -double_rt: the whole dense MT runs in float64
        tri_fields = tri_fields.astype(jnp.float64)
        ray_o = ray_o.astype(jnp.float64)
        ray_d = ray_d.astype(jnp.float64)

    ox, oy, oz = ray_o[:, 0:1], ray_o[:, 1:2], ray_o[:, 2:3]
    dx, dy, dz = ray_d[:, 0:1], ray_d[:, 1:2], ray_d[:, 2:3]

    t_best = jnp.minimum(t_max, jnp.float32(3.0e38))
    slot_best = jnp.full((R,), -1, jnp.int32)
    u_best = jnp.zeros((R,), jnp.float32)
    v_best = jnp.zeros((R,), jnp.float32)

    if S <= BLOCK_SLOTS:
        t_k, u_k, v_k, k = _mt_block(tri_fields, ox, oy, oz, dx, dy, dz, t_best, active_in)
        better = t_k < t_best
        t_best = jnp.where(better, t_k, t_best)
        slot_best = jnp.where(better, k, slot_best)
        u_best = jnp.where(better, u_k, u_best)
        v_best = jnp.where(better, v_k, v_best)
    else:
        # sequential blocks (fori + scalar dynamic_slice keeps ONE block of
        # intermediates live; a python unroll OOMs on HLO temps)
        S_pad = ((S + BLOCK_SLOTS - 1) // BLOCK_SLOTS) * BLOCK_SLOTS
        tri_pad = jnp.concatenate(
            [tri_fields, jnp.full((16, S_pad - S), 1e30, tri_fields.dtype)], axis=1
        )

        def body(b, carry):
            t_best, slot_best, u_best, v_best = carry
            lo = b * BLOCK_SLOTS
            blk = jax.lax.dynamic_slice(tri_pad, (0, lo), (16, BLOCK_SLOTS))
            t_k, u_k, v_k, k = _mt_block(blk, ox, oy, oz, dx, dy, dz, t_best, active_in)
            better = t_k < t_best
            return (
                jnp.where(better, t_k, t_best),
                jnp.where(better, lo + k, slot_best),
                jnp.where(better, u_k, u_best),
                jnp.where(better, v_k, v_best),
            )

        t_best, slot_best, u_best, v_best = jax.lax.fori_loop(
            0, S_pad // BLOCK_SLOTS, body, (t_best, slot_best, u_best, v_best)
        )

    found = slot_best >= 0
    tri_best = jnp.where(found, slot_tri[jnp.clip(slot_best, 0, slot_tri.shape[0] - 1)], -1)
    t_out = jnp.where(found, t_best, jnp.inf)
    return (t_out.astype(jnp.float32), tri_best,
            u_best.astype(jnp.float32), v_best.astype(jnp.float32))


def closest_hit(scene, ray_o, ray_d, t_max=1e30, active=None):
    from hydracore_tpu.ops.intersect import want_double

    if active is None:
        active = jnp.ones(ray_o.shape[0], bool)
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (ray_o.shape[0],))
    return _traverse_dense(scene.wbvh_tri9f, scene.wbvh_slot_tri, ray_o,
                           ray_d, tm, active, f64=want_double(scene))


def any_hit(scene, ray_o, ray_d, t_max, active=None):
    from hydracore_tpu.ops.intersect import want_double

    if active is None:
        active = jnp.ones(ray_o.shape[0], bool)
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (ray_o.shape[0],))
    _, tri, _, _ = _traverse_dense(scene.wbvh_tri9f, scene.wbvh_slot_tri, ray_o, ray_d, tm,
                                   active, any_hit_mode=True,
                                   f64=want_double(scene))
    return tri >= 0
