"""Prototype 2: packet-of-1024 BVH traversal, scalar-broadcast design.

Each packet = 1024 rays as (8,128) VREG tiles. One shared SMEM stack per
packet; node/tri fields are scalar-read from VMEM pools and broadcast into
dense (8,128) box / Moller-Trumbore tests. No gathers, no relayouts.
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

PKT = 1024       # rays per packet = 8 sublanes x 128 lanes
STACK_D = 256
MAX_VISITS = 16384
EMPTY = -(2**30)


def _kernel(ray_ref, nodes_ref, nodesi_ref, tris_ref, out_ref, outi_ref,
            stack_ref):
    # ray_ref: (7, 8, 128): ox oy oz dx dy dz tmax
    ox = ray_ref[0]
    oy = ray_ref[1]
    oz = ray_ref[2]
    dx = ray_ref[3]
    dy = ray_ref[4]
    dz = ray_ref[5]
    t0 = ray_ref[6]

    eps = jnp.float32(1e-12)
    ix = 1.0 / jnp.where(jnp.abs(dx) < eps, jnp.where(dx < 0, -eps, eps), dx)
    iy = 1.0 / jnp.where(jnp.abs(dy) < eps, jnp.where(dy < 0, -eps, eps), dy)
    iz = 1.0 / jnp.where(jnp.abs(dz) < eps, jnp.where(dz < 0, -eps, eps), dz)

    stack_ref[0] = 0
    big = jnp.float32(3e38)

    def body(state):
        sp, t_best, slot_best, u_best, v_best, it = state
        ent = stack_ref[sp - 1]
        sp = sp - 1

        def visit_node(op):
            sp, t_best, slot_best, u_best, v_best = op
            t_cap = jnp.minimum(t_best, t0)
            for c in range(8):
                base = c * 16
                pay = nodesi_ref[ent, base + 6]
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
                anyhit = jnp.any((tf >= jnp.maximum(tn, 0.0)) & (tn < t_cap))
                push = anyhit & (pay != EMPTY)

                @pl.when(push)
                def _(pay=pay, sp=sp):
                    stack_ref[sp] = pay

                sp = jnp.minimum(sp + push.astype(jnp.int32),
                                 jnp.int32(STACK_D - 1))
            return sp, t_best, slot_best, u_best, v_best

        def visit_leaf(op):
            sp, t_best, slot_best, u_best, v_best = op
            blk = -ent - 1
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
                    & (t > 1e-5) & (t < t_best) & (t < t0)
                t_best = jnp.where(hit, t, t_best)
                slot_best = jnp.where(hit, blk * 8 + k, slot_best)
                u_best = jnp.where(hit, u, u_best)
                v_best = jnp.where(hit, v, v_best)
            return sp, t_best, slot_best, u_best, v_best

        sp, t_best, slot_best, u_best, v_best = jax.lax.cond(
            ent >= 0, visit_node, visit_leaf,
            (sp, t_best, slot_best, u_best, v_best))
        return sp, t_best, slot_best, u_best, v_best, it + 1

    def cond(state):
        return (state[0] > 0) & (state[5] < MAX_VISITS)

    t_best = t0 * 1.0
    slot_best = jnp.full((8, 128), -1, jnp.int32)
    u_best = jnp.zeros((8, 128), jnp.float32)
    v_best = jnp.zeros((8, 128), jnp.float32)
    sp, t_best, slot_best, u_best, v_best, it = jax.lax.while_loop(
        cond, body, (jnp.int32(1), t_best, slot_best, u_best, v_best,
                     jnp.int32(0)))

    out_ref[0] = t_best
    out_ref[1] = u_best
    out_ref[2] = v_best
    out_ref[3] = jnp.full((8, 128), it.astype(jnp.float32), jnp.float32)
    outi_ref[0] = slot_best


@jax.jit
def packet_traverse(rays7, nodes, nodesi, tris):
    G = rays7.shape[1] // 8
    out, outi = pl.pallas_call(
        _kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((7, 8, 128), lambda i: (0, i, 0),
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
            jax.ShapeDtypeStruct((4, rays7.shape[1], 128), jnp.float32),
            jax.ShapeDtypeStruct((1, rays7.shape[1], 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((STACK_D,), jnp.int32)],
    )(rays7, nodes, nodesi, tris)
    return out, outi


def pack_scene(sc):
    nodes = np.asarray(sc.wbvh_nodes)  # (N, 8, 8)
    N = nodes.shape[0]
    Np = (N + 7) // 8 * 8
    n128 = np.zeros((Np, 128), np.float32)
    n128.reshape(Np, 8, 16)[:N, :, 0:8] = nodes
    n128.reshape(Np, 8, 16)[N:, :, 6] = np.float32(
        np.int32(EMPTY).view(np.float32))
    t128_src = np.asarray(sc.wbvh_tri9f)
    B = t128_src.shape[0]
    Bp = (B + 7) // 8 * 8
    t128 = np.zeros((Bp, 128), np.float32)
    t128[:B] = t128_src
    t128.reshape(Bp, 8, 16)[B:, :, 0:3] = 1e30
    return (jnp.asarray(n128), jnp.asarray(n128.view(np.int32)),
            jnp.asarray(t128))


def main():
    from hydracore_tpu.ops import traverse_wide as tw
    from hydracore_tpu.scene.scene import load_scene

    scene_dir = "/root/reference/hydra_app/tests/test_224"
    sc = load_scene(scene_dir, width=64, height=64)
    nodes, nodesi, tris = pack_scene(sc)
    print(f"nodes {nodes.shape} {nodes.nbytes/1e6:.1f}MB  "
          f"tris {tris.shape} {tris.nbytes/1e6:.1f}MB")

    R = 262144
    rng = np.random.default_rng(0)

    ro_c = np.tile(np.array([0.0, 10.0, 25.0], np.float32), (R, 1))
    px = np.repeat(np.arange(512), 512)[:R]
    py = np.tile(np.arange(512), 512)[:R]
    d = np.stack([(px / 512 - 0.5) * 1.2, (py / 512 - 0.5) * 1.2,
                  -np.ones(R)], 1).astype(np.float32)
    rd_c = d / np.linalg.norm(d, axis=1, keepdims=True)

    ro_i = rng.uniform(-10, 10, (R, 3)).astype(np.float32)
    ro_i[:, 1] += 10
    rd_i = rng.normal(size=(R, 3)).astype(np.float32)
    rd_i /= np.linalg.norm(rd_i, axis=1, keepdims=True)

    def rays_pack(ro, rd):
        r7 = np.zeros((7, R // 128, 128), np.float32)
        r7[0:3] = ro.T.reshape(3, R // 128, 128)
        r7[3:6] = rd.T.reshape(3, R // 128, 128)
        r7[6] = 1e30
        return jnp.asarray(r7)

    class S:
        pass

    s = S()
    s.wbvh_nodes = jnp.asarray(sc.wbvh_nodes)
    s.wbvh_tri9f = jnp.asarray(sc.wbvh_tri9f)
    s.wbvh_slot_tri = jnp.asarray(sc.wbvh_slot_tri)

    for name, ro, rd in [("coherent", ro_c, rd_c), ("incoherent", ro_i, rd_i)]:
        r7 = rays_pack(ro, rd)
        t0 = time.perf_counter()
        out, outi = packet_traverse(r7, nodes, nodesi, tris)
        out_np, outi_np = np.asarray(out), np.asarray(outi)
        print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        nrep = 5
        for _ in range(nrep):
            out, outi = packet_traverse(r7, nodes, nodesi, tris)
        out_np = np.asarray(out)
        outi_np = np.asarray(outi)
        dt = (time.perf_counter() - t0) / nrep
        visits = out_np[3].reshape(-1, 8, 128)[::8, 0, 0]
        print(f"{name}: {dt*1e3:.2f} ms -> {R/dt/1e6:.1f} Mrays/s; "
              f"visits/packet mean {visits.mean():.0f} max {visits.max():.0f}")

        # correctness vs existing XLA traversal (flatten packet layout)
        t_new = out_np[0].reshape(R)
        slot = outi_np[0].reshape(R)
        n_check = 4096
        t_ref, tri_ref, _, _ = tw.closest_hit(
            s, jnp.asarray(ro[:n_check]), jnp.asarray(rd[:n_check]))
        tri_new = np.where(slot >= 0,
                           np.asarray(sc.wbvh_slot_tri)[np.clip(slot, 0, None)],
                           -1)[:n_check]
        t_ref = np.asarray(t_ref)
        ok_t = np.isclose(np.where(np.isinf(t_ref), 1e30, t_ref),
                          np.where(t_new[:n_check] >= 1e29, 1e30,
                                   t_new[:n_check]),
                          rtol=1e-3, atol=1e-3)
        print(f"{name}: t match {ok_t.mean()*100:.2f}%  "
              f"tri match {(tri_new == np.asarray(tri_ref)).mean()*100:.2f}%")


if __name__ == "__main__":
    main()
