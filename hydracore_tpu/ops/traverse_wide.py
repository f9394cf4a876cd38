"""8-wide BVH traversal — the production TPU traversal path.

TPU-native successor of ops/traverse.py's binary version (see bvh/wide.py
for the layout rationale; reference analogue: ctrace.h BVH4Traverse:669).

Profiling on TPU v5e showed that ANY per-row dynamic write to an (R, S)
stack is lowered as a full-array scatter pass (~1.3 ms per scatter at
R=262k, and multi-column scatters additionally sort all R*8 updates), and
the stack-top read (take_along_axis) scans the stack too — together ~14 of
19 ms per traversal iteration. This implementation therefore has NO memory
stack at all:

  * each ray carries ONE packed entry `cur = node_id << 8 | remaining_mask`
    and a bank of K shift REGISTERS ((R,) arrays) holding ancestor entries;
    push/pop are +-1 shifts = 3-way selects, never scatters;
  * an iteration re-fetches the current node (one (N, 64) row gather — row
    gathers are fast), re-tests its 8 child boxes, and descends into the
    NEAREST not-yet-visited hit child (mask bookkeeping): leaf children are
    intersected inline (one (B, 128) row gather + dense Möller–Trumbore),
    internal children push the parent entry; an exhausted mask pops;
  * child boxes are re-tested on every visit — redundant FLOPs are far
    cheaper than stack memory traffic on this hardware, and re-testing
    applies the LATEST t_best (free pruning the stack version lacks);
  * the while cond is amortized over CHUNK inner iterations.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hydracore_tpu.bvh.wide import EMPTY_PAYLOAD, LEAF_SIZE

K_REGS = 16  # default ancestor registers; grown per-scene from wbvh_depth
CHUNK = 8  # traversal iterations between while-cond checks
BIG = jnp.float32(3.0e38)
MASK_FULL = 0xFF


@partial(jax.jit, static_argnames=("any_hit_mode", "k_regs"))
def _traverse_wide(nodes2, tri9f, slot_tri, ray_o, ray_d, t_max, active_in,
                   any_hit_mode=False, k_regs=K_REGS):
    K_REGS = k_regs  # shadow the default with the scene-sized register bank
    """nodes2: (N, 64) packed wide nodes; tri9f: (B, LEAF*16) leaf rows."""
    R = ray_o.shape[0]
    k8 = jnp.arange(8)[None, :]
    bit8 = (1 << jnp.arange(8))[None, :]

    ox, oy, oz = ray_o[:, 0:1], ray_o[:, 1:2], ray_o[:, 2:3]  # (R,1)
    dx, dy, dz = ray_d[:, 0:1], ray_d[:, 1:2], ray_d[:, 2:3]

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    zero_f = ray_o[:, 0] * 0.0
    zero_i = zero_f.astype(jnp.int32)

    cur = zero_i + MASK_FULL  # root (node 0) with all children pending
    depth = jnp.where(active_in, 1, 0) + zero_i
    regs = [zero_i for _ in range(K_REGS)]

    t_best = jnp.asarray(t_max) + zero_f
    slot_best = zero_i - 1
    u_best = zero_f
    v_best = zero_f

    def one_iter(state):
        cur, depth, t_best, slot_best, u_best, v_best, *regs = state
        act = depth > 0
        node = jnp.where(act, cur >> 8, 0)
        mask = jnp.where(act, cur & MASK_FULL, 0)

        # ---------- fetch current wide node, test all 8 children
        rec = nodes2[node].reshape(R, 8, 8)  # row gather
        payload = jax.lax.bitcast_convert_type(rec[:, :, 6], jnp.int32)
        tx0 = (rec[:, :, 0] - ox) * ix
        tx1 = (rec[:, :, 3] - ox) * ix
        ty0 = (rec[:, :, 1] - oy) * iy
        ty1 = (rec[:, :, 4] - oy) * iy
        tz0 = (rec[:, :, 2] - oz) * iz
        tz1 = (rec[:, :, 5] - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                         jnp.minimum(tz0, tz1))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                         jnp.maximum(tz0, tz1))
        pending = (mask[:, None] & bit8) != 0
        cand = pending & (payload != EMPTY_PAYLOAD) & (tf >= jnp.maximum(tn, 0.0)) \
            & (tn < t_best[:, None])

        # nearest pending hit child
        tn_m = jnp.where(cand, tn, BIG)
        tn_min = tn_m.min(axis=1)
        has_cand = act & (tn_min < BIG)
        sel = (tn_m == tn_min[:, None]) & cand
        sel = sel & (jnp.cumsum(sel.astype(jnp.int32), axis=1) == 1)
        k_sel = (sel * k8).sum(axis=1)
        p_sel = (sel * payload).sum(axis=1)
        new_mask = mask & ~(sel * bit8).sum(axis=1)

        go_leaf = has_cand & (p_sel < 0)
        go_node = has_cand & (p_sel >= 0)
        do_pop = act & ~has_cand

        # ---------- leaf child: dense LEAF_SIZE-triangle intersection
        blk = jnp.where(go_leaf, -p_sel - 1, 0)
        tri = tri9f[blk].reshape(R, LEAF_SIZE, 16)  # row gather
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
        hit = (inv != 0.0) & (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t > 1e-5)
        hit = hit & go_leaf[:, None] & (t < t_best[:, None])
        t_m = jnp.where(hit, t, BIG)
        t_k = t_m.min(axis=1)
        better = t_k < t_best
        win = (t_m == t_k[:, None]) & hit
        win = win & (jnp.cumsum(win.astype(jnp.int32), axis=1) == 1)
        winf = win.astype(jnp.float32)
        slots = blk[:, None] * LEAF_SIZE + k8
        t_best = jnp.where(better, t_k, t_best)
        slot_best = jnp.where(better, (win * slots).sum(axis=1), slot_best)
        u_best = jnp.where(better, (winf * u).sum(axis=1), u_best)
        v_best = jnp.where(better, (winf * v).sum(axis=1), v_best)

        # ---------- state transition (all masked selects, +-1 reg shifts)
        stay_entry = (node << 8) | new_mask
        # leaf: stay at this node with the child consumed
        # node: push stay_entry, descend into child
        # pop : take regs[0]
        cur = jnp.where(go_leaf, stay_entry,
                        jnp.where(go_node, (p_sel << 8) | MASK_FULL,
                                  jnp.where(do_pop, regs[0], cur)))
        depth = depth + jnp.where(go_node, 1, 0) - jnp.where(do_pop, 1, 0)

        push = go_node
        pop = do_pop
        new_regs = []
        for i in range(K_REGS):
            below = regs[i + 1] if i + 1 < K_REGS else regs[K_REGS - 1]
            above = regs[i - 1] if i >= 1 else stay_entry
            new_regs.append(jnp.where(push, above, jnp.where(pop, below, regs[i])))

        if any_hit_mode:
            depth = jnp.where(slot_best >= 0, 0, depth)

        return (cur, depth, t_best, slot_best, u_best, v_best, *new_regs)

    def chunk_body(state):
        return jax.lax.fori_loop(0, CHUNK, lambda i, s: one_iter(s), state)

    def cond(s):
        return jnp.any(s[1] > 0)

    state = (cur, depth, t_best, slot_best, u_best, v_best, *regs)
    state = jax.lax.while_loop(cond, chunk_body, state)
    _, _, t_best, slot_best, u_best, v_best = state[:6]
    tri_best = jnp.where(slot_best >= 0,
                         slot_tri[jnp.clip(slot_best, 0, slot_tri.shape[0] - 1)], -1)
    t_out = jnp.where(slot_best >= 0, t_best, jnp.inf)
    return t_out, tri_best, u_best, v_best


def _prep(scene):
    """Views of the scene BVH in the layouts this kernel wants."""
    nodes2 = scene.wbvh_nodes.reshape(scene.wbvh_nodes.shape[0], 64)
    # register bank must cover the wide-tree depth: a deeper tree would
    # silently shift ancestors off the bank (missed intersections)
    k_regs = max(K_REGS, int(getattr(scene, "wbvh_depth", K_REGS)))
    return nodes2, scene.wbvh_tri9f, scene.wbvh_slot_tri, k_regs


def closest_hit(scene, ray_o, ray_d, t_max=1e30, active=None):
    """Closest-hit over the wide BVH. Returns (t, tri_id, u, v)."""
    if active is None:
        active = jnp.ones(ray_o.shape[0], bool)
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (ray_o.shape[0],))
    nodes2, tri9f, slot_tri, k_regs = _prep(scene)
    return _traverse_wide(nodes2, tri9f, slot_tri, ray_o, ray_d, tm, active,
                          any_hit_mode=False, k_regs=k_regs)


def any_hit(scene, ray_o, ray_d, t_max, active=None):
    """Shadow traversal: True where occluded."""
    if active is None:
        active = jnp.ones(ray_o.shape[0], bool)
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (ray_o.shape[0],))
    nodes2, tri9f, slot_tri, k_regs = _prep(scene)
    _, tri, _, _ = _traverse_wide(nodes2, tri9f, slot_tri, ray_o, ray_d, tm, active,
                                  any_hit_mode=True, k_regs=k_regs)
    return tri >= 0
