"""Packet BVH traversal — Pallas TPU kernel (the round-2 performance path).

Design (reference analogue: ctrace.h BVH4Traverse:669 / trace.cl:25, but
re-architected for the TPU vector model — this is NOT a port):

A *packet* of 1024 rays occupies (8, 128) VREG tiles (sublane x lane). Each
packet traverses the wide BVH with a SHARED per-packet DFS stack in SMEM
(mixed node/leaf entries, sign-tagged). One iteration pops an entry:
  * node: scalar-read its 8 children's bounds from the VMEM-resident pool,
    broadcast into dense (8,128) slab tests, fold per-child hit flags into
    one scalar bitmask (cheap keepdims lane-max + bit-weighted pack + a
    3-step sublane roll-OR + ONE vector->scalar extract), then push hit
    children under @pl.when;
  * leaf: 8 packed triangles, dense Moller-Trumbore over the packet,
    masked best-hit updates (t_best tightening culls later node tests).

Why packets: Mosaic has no per-lane gather from a shared pool (gathers
require index shape == source shape); measured costs on this TPU are
~125 cycles/loop iteration, ~4-14 cycles per batched scalar VMEM read,
~5-7 cycles per (8,128) vector op, ~40 cycles per full vector->scalar
reduction, ~30 cycles per predicated SMEM push. The shared-traversal
design keeps every arithmetic op a full-width VREG op and pays scalar
costs once per packet instead of once per ray.

Rays should be pixel/Morton-coherent for tight packet unions; integrators
sort secondary rays before calling.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PKT = 1024           # rays per packet: 8 sublanes x 128 lanes
STACK_D = 384        # shared stack depth (>= 7*wide-depth + 8)
MAX_VISITS = 65536   # safety bound
EMPTY = -(2 ** 30)   # empty child-slot payload (bvh/wide.py)


def _make_kernel(any_hit_mode: bool):
    def kernel(ray_ref, nodes_ref, nodesi_ref, tris_ref, out_ref, outi_ref,
               stack):
        # ray_ref: (8, 8, 128) = [ox oy oz dx dy dz tmax act]
        ox, oy, oz = ray_ref[0], ray_ref[1], ray_ref[2]
        dx, dy, dz = ray_ref[3], ray_ref[4], ray_ref[5]
        t_lim = ray_ref[6]
        act = ray_ref[7] > 0.0

        eps = jnp.float32(1e-12)
        ix = 1.0 / jnp.where(jnp.abs(dx) < eps,
                             jnp.where(dx < 0, -eps, eps), dx)
        iy = 1.0 / jnp.where(jnp.abs(dy) < eps,
                             jnp.where(dy < 0, -eps, eps), dy)
        iz = 1.0 / jnp.where(jnp.abs(dz) < eps,
                             jnp.where(dz < 0, -eps, eps), dz)

        big = jnp.float32(3e38)
        t_act = jnp.where(act, t_lim, -big)  # inactive rays never hit

        stack[0] = 0

        def node_visit(op):
            sp, t_best, slot_best, u_best, v_best = op
            ent = stack[sp - 1]
            sp = sp - 1
            t_cap = jnp.minimum(t_best, t_act)
            mask_col = jnp.zeros((8, 1), jnp.int32)
            pays = []
            for c in range(8):
                base = c * 16
                pays.append(nodesi_ref[ent, base + 6])
                bxm = nodes_ref[ent, base + 0]
                bym = nodes_ref[ent, base + 1]
                bzm = nodes_ref[ent, base + 2]
                bxM = nodes_ref[ent, base + 3]
                byM = nodes_ref[ent, base + 4]
                bzM = nodes_ref[ent, base + 5]
                tx0 = (bxm - ox) * ix
                tx1 = (bxM - ox) * ix
                ty0 = (bym - oy) * iy
                ty1 = (byM - oy) * iy
                tz0 = (bzm - oz) * iz
                tz1 = (bzM - oz) * iz
                tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                             jnp.minimum(ty0, ty1)),
                                 jnp.minimum(tz0, tz1))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                             jnp.maximum(ty0, ty1)),
                                 jnp.maximum(tz0, tz1))
                hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_cap)
                # cheap (8,1) lane-reduce; no scalarization yet
                any_col = jnp.max(hit.astype(jnp.int32), axis=1,
                                  keepdims=True)
                mask_col = mask_col | (any_col << c)
            # sublane roll-OR fold -> every row holds the full child mask
            mask_col = mask_col | pltpu.roll(mask_col, 4, axis=0)
            mask_col = mask_col | pltpu.roll(mask_col, 2, axis=0)
            mask_col = mask_col | pltpu.roll(mask_col, 1, axis=0)
            m = mask_col[0, 0]  # ONE vector->scalar extract per visit
            for c in range(8):
                push = ((m >> c) & 1) > 0

                @pl.when(push)
                def _(pay=pays[c], sp=sp):
                    stack[sp] = pay

                sp = sp + push.astype(jnp.int32)
            sp = jnp.minimum(sp, jnp.int32(STACK_D - 9))
            return sp, t_best, slot_best, u_best, v_best

        def leaf_visit(op):
            sp, t_best, slot_best, u_best, v_best = op
            blk = -stack[sp - 1] - 1
            sp = sp - 1
            t_cap = jnp.minimum(t_best, t_act)
            for k in range(8):
                base = k * 16
                v0x = tris_ref[blk, base + 0]
                v0y = tris_ref[blk, base + 1]
                v0z = tris_ref[blk, base + 2]
                e1x = tris_ref[blk, base + 3]
                e1y = tris_ref[blk, base + 4]
                e1z = tris_ref[blk, base + 5]
                e2x = tris_ref[blk, base + 6]
                e2y = tris_ref[blk, base + 7]
                e2z = tris_ref[blk, base + 8]
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv = jnp.where(jnp.abs(det) > 1e-12,
                                1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
                sx = ox - v0x
                sy = oy - v0y
                sz = oz - v0z
                u = (sx * px + sy * py + sz * pz) * inv
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                v = (dx * qx + dy * qy + dz * qz) * inv
                t = (e2x * qx + e2y * qy + e2z * qz) * inv
                hit = (inv != 0.0) & (u >= 0) & (v >= 0) & (u + v <= 1.0) \
                    & (t > 1e-5) & (t < t_cap)
                t_best = jnp.where(hit, t, t_best)
                slot_best = jnp.where(hit, blk * 8 + k, slot_best)
                u_best = jnp.where(hit, u, u_best)
                v_best = jnp.where(hit, v, v_best)
                t_cap = jnp.minimum(t_cap, t_best)
            if any_hit_mode:
                # whole packet done once every active ray is occluded
                pend = act & (slot_best < 0)
                n_pend = jnp.max(pend.astype(jnp.float32))
                sp = jnp.where(n_pend < 0.5, 0, sp)
            return sp, t_best, slot_best, u_best, v_best

        # Single loop, lax.cond dispatch per popped entry. NOTE: Mosaic
        # executes BOTH cond branches (predicated); measured, that still
        # beats a two-phase nested-while structure (phase-transition
        # overhead dominates). Do NOT read the stack ref inside a
        # while_loop COND function — such reads are stale/undefined
        # (bisected: they produced traversal cycles); the dispatch entry
        # is read inside the body instead.
        def body(state):
            op, it = state[:-1], state[-1]
            ent = stack[op[0] - 1]
            op = jax.lax.cond(ent >= 0, node_visit, leaf_visit, op)
            return (*op, it + 1)

        def cond(state):
            return (state[0] > 0) & (state[-1] < MAX_VISITS)

        t_best = jnp.minimum(t_lim, big)
        slot_best = jnp.full((8, 128), -1, jnp.int32)
        u_best = jnp.zeros((8, 128), jnp.float32)
        v_best = jnp.zeros((8, 128), jnp.float32)
        state = jax.lax.while_loop(
            cond, body,
            (jnp.int32(1), t_best, slot_best, u_best, v_best, jnp.int32(0)))
        _, t_best, slot_best, u_best, v_best, it = state

        out_ref[0] = jnp.where(slot_best >= 0, t_best, big)
        out_ref[1] = u_best
        out_ref[2] = v_best
        out_ref[3] = jnp.full((8, 128), it.astype(jnp.float32))
        outi_ref[0] = slot_best

    return kernel


# Flip to True in tests to run the kernel through the Pallas interpreter
# (exercises the exact kernel logic on the CPU backend).
INTERPRET = False


@partial(jax.jit, static_argnames=("any_hit_mode", "interpret"))
def _packet_traverse(rays8, nodes, nodesi, tris, any_hit_mode=False,
                     interpret=False):
    """rays8: (8, G*8, 128); pools padded to 8-row multiples."""
    G = rays8.shape[1] // 8
    out, outi = pl.pallas_call(
        _make_kernel(any_hit_mode),
        interpret=interpret,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((8, 8, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(nodes.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(nodesi.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((4, 8, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, rays8.shape[1], 128), jnp.float32),
            jax.ShapeDtypeStruct((1, rays8.shape[1], 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((STACK_D,), jnp.int32)],
    )(rays8, nodes, nodesi, tris)
    return out, outi


def pack_pools(wbvh_nodes: np.ndarray, wbvh_tri9f: np.ndarray,
               max_depth: int | None = None):
    """Host-side: pack wide-BVH pools into the kernel's (rows, 128) layout.

    Node row: 8 children x 16-stride [bmin.xyz bmax.xyz payload(pad)];
    rows padded to a multiple of 8 with EMPTY payloads / far boxes.
    """
    nodes = np.asarray(wbvh_nodes)
    if max_depth is not None and max_depth * 7 + 9 > STACK_D:
        raise ValueError(
            f"wide-BVH depth {max_depth} needs stack {max_depth * 7 + 9} > "
            f"STACK_D={STACK_D}; raise STACK_D in traverse_packet")
    N = nodes.shape[0]
    Np = (N + 7) // 8 * 8
    n128 = np.zeros((Np, 128), np.float32)
    n128.reshape(Np, 8, 16)[:N, :, 0:8] = nodes
    n128.reshape(Np, 8, 16)[N:, :, 6] = np.int32(EMPTY).view(np.float32)
    t_src = np.asarray(wbvh_tri9f)
    B = t_src.shape[0]
    Bp = (B + 7) // 8 * 8
    t128 = np.zeros((Bp, 128), np.float32)
    t128[:B] = t_src
    t128.reshape(Bp, 8, 16)[B:, :, 0:3] = 1e30
    return n128, n128.view(np.int32).copy(), t128


def _to_packets(ro, rd, t_max, active):
    """(R,3) rays -> (8, Gp*8, 128) packet layout (+original count)."""
    R = ro.shape[0]
    Rp = (R + PKT - 1) // PKT * PKT
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    ac = jnp.ones(R, bool) if active is None else active
    r8 = jnp.zeros((8, Rp), jnp.float32)
    r8 = r8.at[0:3, :R].set(ro.T)
    r8 = r8.at[3:6, :R].set(rd.T)
    r8 = r8.at[6, :R].set(tm)
    r8 = r8.at[7, :R].set(ac.astype(jnp.float32))
    return r8.reshape(8, Rp // 128, 128), R


def closest_hit(scene, ray_o, ray_d, t_max=1e30, active=None):
    """Closest hit over the packet kernel. Returns (t, tri_id, u, v).

    t is +inf on miss (matches ops/traverse_wide API)."""
    rays8, R = _to_packets(ray_o, ray_d, t_max, active)
    out, outi = _packet_traverse(rays8, scene.pkt_nodes, scene.pkt_nodesi,
                                 scene.pkt_tris, any_hit_mode=False,
                                 interpret=INTERPRET)
    t = out[0].reshape(-1)[:R]
    u = out[1].reshape(-1)[:R]
    v = out[2].reshape(-1)[:R]
    slot = outi[0].reshape(-1)[:R]
    tri = jnp.where(
        slot >= 0,
        scene.wbvh_slot_tri[jnp.clip(slot, 0, scene.wbvh_slot_tri.shape[0] - 1)],
        -1)
    t = jnp.where(slot >= 0, t, jnp.inf)
    return t, tri, u, v


def any_hit(scene, ray_o, ray_d, t_max, active=None):
    """Shadow traversal: True where occluded."""
    rays8, R = _to_packets(ray_o, ray_d, t_max, active)
    _, outi = _packet_traverse(rays8, scene.pkt_nodes, scene.pkt_nodesi,
                               scene.pkt_tris, any_hit_mode=True,
                               interpret=INTERPRET)
    slot = outi[0].reshape(-1)[:R]
    return slot >= 0
