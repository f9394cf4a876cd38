"""Vectorized BVH traversal over ray batches (jnp while_loop).

TPU-native re-expression of the stack-based BVH traversal in
hydra_drv/ctrace.h (BVH4Traverse:669, STACK_SIZE=80): every ray in the
megablock keeps its own short stack in an (R, STACK) register/VMEM array and
ALL rays step in lockstep through a lax.while_loop; divergence is handled by
masking, not branching (no warps on TPU — the vector unit IS the warp).
Node/triangle data is fetched by gather from flat SoA arrays.

Two entry points mirror the reference kernel split (trace.cl
BVH4TraversalInstKernel vs shadow variants): `closest_hit` and `any_hit`.

This is the correctness-first implementation; the Pallas VMEM-tiled version
lives in ops/traverse_pallas.py as it lands (perf pass, SURVEY.md §7.6).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hydracore_tpu.ops.intersect import moller_trumbore, ray_box

STACK_DEPTH = 64
LEAF_ITER = 8  # builder guarantees leaf count <= 2*MAX_LEAF = 8


def _push(stack, sp, node, cond):
    """Masked push of `node` for rays where cond; returns (stack, sp)."""
    r = jnp.arange(stack.shape[0])
    col = jnp.clip(sp, 0, STACK_DEPTH - 1)
    cur = stack[r, col]
    stack = stack.at[r, col].set(jnp.where(cond, node, cur))
    return stack, sp + cond.astype(jnp.int32)


@partial(jax.jit, static_argnames=("any_hit_mode",))
def _traverse(bvh_bmin, bvh_bmax, bvh_left, bvh_right, bvh_count,
              tri_v0, tri_e1, tri_e2,
              ray_o, ray_d, t_max, active_in, any_hit_mode=False):
    R = ray_o.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(ray_d) < 1e-12, jnp.where(ray_d < 0, -1e-12, 1e-12), ray_d)

    # tie every carry to the ray data so all while_loop carries share the
    # same device-varying type under shard_map (vma consistency)
    zero_f = ray_o[:, 0] * 0.0
    zero_i = zero_f.astype(jnp.int32)
    stack = jnp.zeros((R, STACK_DEPTH), jnp.int32) + zero_i[:, None]
    sp = jnp.where(active_in, 1, 0).astype(jnp.int32) + zero_i  # root pre-pushed

    t_best = jnp.asarray(t_max) + zero_f
    tri_best = zero_i - 1
    u_best = zero_f
    v_best = zero_f

    def cond(state):
        _, sp, *_ = state
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, t_best, tri_best, u_best, v_best = state
        r = jnp.arange(R)
        act = sp > 0
        top = jnp.clip(sp - 1, 0, STACK_DEPTH - 1)
        node = jnp.where(act, stack[r, top], 0)
        sp = jnp.where(act, sp - 1, sp)

        cnt = bvh_count[node]
        left = bvh_left[node]
        right = bvh_right[node]
        is_leaf = act & (cnt > 0)
        is_inner = act & (cnt == 0)

        # ---- leaf: intersect up to LEAF_ITER triangles
        def leaf_step(k, carry):
            t_best, tri_best, u_best, v_best = carry
            tri = jnp.clip(left + k, 0, tri_v0.shape[0] - 1)
            valid = is_leaf & (k < cnt)
            t, u, v, hit = moller_trumbore(
                ray_o, ray_d, tri_v0[tri], tri_e1[tri], tri_e2[tri], t_max=t_best
            )
            better = valid & hit & (t < t_best)
            t_best = jnp.where(better, t, t_best)
            tri_best = jnp.where(better, tri, tri_best)
            u_best = jnp.where(better, u, u_best)
            v_best = jnp.where(better, v, v_best)
            return t_best, tri_best, u_best, v_best

        t_best, tri_best, u_best, v_best = jax.lax.fori_loop(
            0, LEAF_ITER, leaf_step, (t_best, tri_best, u_best, v_best)
        )

        # ---- inner: test both children, push far then near (near on top)
        tl, hl = ray_box(ray_o, inv_d, bvh_bmin[left], bvh_bmax[left], t_best)
        tr_, hr = ray_box(ray_o, inv_d, bvh_bmin[right], bvh_bmax[right], t_best)
        hl = hl & is_inner
        hr = hr & is_inner
        near_is_left = tl <= tr_
        near = jnp.where(near_is_left, left, right)
        far = jnp.where(near_is_left, right, left)
        h_near = jnp.where(near_is_left, hl, hr)
        h_far = jnp.where(near_is_left, hr, hl)
        stack, sp = _push(stack, sp, far, h_far)
        stack, sp = _push(stack, sp, near, h_near)

        if any_hit_mode:
            # a ray that found any hit stops traversing
            sp = jnp.where(tri_best >= 0, 0, sp)

        return stack, sp, t_best, tri_best, u_best, v_best

    state = (stack, sp, t_best, tri_best, u_best, v_best)
    state = jax.lax.while_loop(cond, body, state)
    _, _, t_best, tri_best, u_best, v_best = state
    t_out = jnp.where(tri_best >= 0, t_best, jnp.inf)
    return t_out, tri_best, u_best, v_best


def closest_hit(scene, ray_o, ray_d, t_max=1e30, active=None):
    """Closest-hit traversal. Returns (t, tri_id, u, v); t=inf / tri=-1 miss."""
    if active is None:
        active = jnp.ones(ray_o.shape[0], bool)
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (ray_o.shape[0],))
    return _traverse(
        scene.bvh_bmin, scene.bvh_bmax, scene.bvh_left, scene.bvh_right,
        scene.bvh_count, scene.tri_v0, scene.tri_e1, scene.tri_e2,
        ray_o, ray_d, tm, active, any_hit_mode=False,
    )


def any_hit(scene, ray_o, ray_d, t_max, active=None):
    """Shadow traversal: returns occluded mask (True = blocked)."""
    if active is None:
        active = jnp.ones(ray_o.shape[0], bool)
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (ray_o.shape[0],))
    _, tri, _, _ = _traverse(
        scene.bvh_bmin, scene.bvh_bmax, scene.bvh_left, scene.bvh_right,
        scene.bvh_count, scene.tri_v0, scene.tri_e1, scene.tri_e2,
        ray_o, ray_d, tm, active, any_hit_mode=True,
    )
    return tri >= 0
