"""Prototype: Pallas packet BVH traversal — measure cycles/visit on TPU.

Design under test: a packet of P rays (lanes) traverses the wide BVH with a
SHARED per-packet stack (SMEM scratch). Node fetch = one dynamic row slice
of a VMEM-resident (N, 128) pool; box/tri tests are dense (8, P) VPU ops
(children in sublanes x rays in lanes via (8,1)*(1,P) broadcasts).

Validates vs the existing XLA wide traversal, then times on the teapot.
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

P = 128          # rays per packet
STACK_D = 192    # shared stack depth
MAX_VISITS = 4096


def _kernel(ray_ref, nodes_ref, tris_ref, out_ref, stack_ref):
    # ray_ref: (8, P) [ox,oy,oz,tmax, dx,dy,dz,pad]
    ox = ray_ref[0:1, :]
    oy = ray_ref[1:2, :]
    oz = ray_ref[2:3, :]
    t0 = ray_ref[3:4, :]
    dx = ray_ref[4:5, :]
    dy = ray_ref[5:6, :]
    dz = ray_ref[6:7, :]

    eps = jnp.float32(1e-12)
    ix = 1.0 / jnp.where(jnp.abs(dx) < eps, jnp.where(dx < 0, -eps, eps), dx)
    iy = 1.0 / jnp.where(jnp.abs(dy) < eps, jnp.where(dy < 0, -eps, eps), dy)
    iz = 1.0 / jnp.where(jnp.abs(dz) < eps, jnp.where(dz < 0, -eps, eps), dz)

    stack_ref[0] = 0  # root node entry (payload >= 0 -> node)
    big = jnp.float32(3e38)

    def body(state):
        sp, t_best, slot_best, u_best, v_best, it = state
        ent = stack_ref[sp - 1]
        sp = sp - 1
        is_node = ent >= 0

        def visit_node(t_best, slot_best, u_best, v_best, sp):
            rec = nodes_ref[pl.ds(ent, 1), :].reshape(8, 16)
            bxm = rec[:, 0:1]
            bym = rec[:, 1:2]
            bzm = rec[:, 2:3]
            bxM = rec[:, 3:4]
            byM = rec[:, 4:5]
            bzM = rec[:, 5:6]
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
            hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_best) & (tn < t0)
            nhit = jnp.sum(hit.astype(jnp.int32), axis=1)  # (8,)
            # push hit children (scalar loop; payload via scalar VMEM read)
            for c in range(8):
                pay = nodes_ref[ent, c * 16 + 6]
                payi = pltpu.bitcast(pay, jnp.int32)
                do_push = (nhit[c] > 0) & (payi != -(2**30))
                @pl.when(do_push)
                def _(c=c, payi=payi):
                    stack_ref[sp + 0] = payi
                sp = sp + do_push.astype(jnp.int32)
            return t_best, slot_best, u_best, v_best, sp

        def visit_leaf(t_best, slot_best, u_best, v_best, sp):
            blk = -ent - 1
            rec = tris_ref[pl.ds(blk, 1), :].reshape(8, 16)
            v0x = rec[:, 0:1]
            v0y = rec[:, 1:2]
            v0z = rec[:, 2:3]
            e1x = rec[:, 3:4]
            e1y = rec[:, 4:5]
            e1z = rec[:, 5:6]
            e2x = rec[:, 6:7]
            e2y = rec[:, 7:8]
            e2z = rec[:, 8:9]
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
                & (t > 1e-5) & (t < t_best)
            t_m = jnp.where(hit, t, big)
            t_k = jnp.min(t_m, axis=0, keepdims=True)  # (1, P)
            better = t_k < t_best
            win = (t_m == t_k) & hit
            win = win & (jnp.cumsum(win.astype(jnp.int32), axis=0) == 1)
            winf = win.astype(jnp.float32)
            k8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
            slots = blk * 8 + k8
            slot_new = jnp.sum(jnp.where(win, slots, 0), axis=0, keepdims=True)
            u_new = jnp.sum(winf * u, axis=0, keepdims=True)
            v_new = jnp.sum(winf * v, axis=0, keepdims=True)
            t_best = jnp.where(better, t_k, t_best)
            slot_best = jnp.where(better, slot_new, slot_best)
            u_best = jnp.where(better, u_new, u_best)
            v_best = jnp.where(better, v_new, v_best)
            return t_best, slot_best, u_best, v_best, sp

        t_best, slot_best, u_best, v_best, sp = jax.lax.cond(
            is_node, visit_node, visit_leaf,
            t_best, slot_best, u_best, v_best, sp)
        return sp, t_best, slot_best, u_best, v_best, it + 1

    def cond(state):
        return (state[0] > 0) & (state[5] < MAX_VISITS)

    t_best = jnp.broadcast_to(t0, (1, P)) * 1.0
    slot_best = jnp.full((1, P), -1, jnp.int32)
    u_best = jnp.zeros((1, P), jnp.float32)
    v_best = jnp.zeros((1, P), jnp.float32)
    sp, t_best, slot_best, u_best, v_best, it = jax.lax.while_loop(
        cond, body, (jnp.int32(1), t_best, slot_best, u_best, v_best,
                     jnp.int32(0)))

    out_ref[0:1, :] = t_best
    out_ref[1:2, :] = pltpu.bitcast(slot_best, jnp.float32)
    out_ref[2:3, :] = u_best
    out_ref[3:4, :] = v_best
    out_ref[4:5, :] = jnp.broadcast_to(
        it.astype(jnp.float32).reshape(1, 1), (1, P))
    out_ref[5:8, :] = jnp.zeros((3, P), jnp.float32)


@partial(jax.jit, static_argnames=("interpret",))
def packet_traverse(rays8, nodes128, tris128, interpret=False):
    R = rays8.shape[1]
    return pl.pallas_call(
        _kernel,
        grid=(R // P,),
        in_specs=[
            pl.BlockSpec((8, P), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(nodes128.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tris128.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, P), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, R), jnp.float32),
        scratch_shapes=[pltpu.SMEM((STACK_D,), jnp.int32)],
        interpret=interpret,
    )(rays8, nodes128, tris128)


def pack_scene(sc):
    nodes = np.asarray(sc.wbvh_nodes)  # (N, 8, 8)
    N = nodes.shape[0]
    n128 = np.zeros((N, 128), np.float32)
    n128.reshape(N, 8, 16)[:, :, 0:8] = nodes
    t128 = np.asarray(sc.wbvh_tri9f)  # (B, 128) already 16-stride
    return jnp.asarray(n128), jnp.asarray(t128)


def main():
    from hydracore_tpu.ops import traverse_wide as tw
    from hydracore_tpu.scene.scene import load_scene

    scene_dir = "/root/reference/hydra_app/tests/test_224"
    sc = load_scene(scene_dir, width=64, height=64)
    nodes128, tris128 = pack_scene(sc)
    print(f"nodes {nodes128.shape} {nodes128.nbytes/1e6:.1f}MB  "
          f"tris {tris128.shape} {tris128.nbytes/1e6:.1f}MB")

    R = 262144
    rng = np.random.default_rng(0)

    # coherent primary-like rays: from a point, toward scene bbox
    ro_c = np.tile(np.array([0.0, 10.0, 25.0], np.float32), (R, 1))
    px = np.repeat(np.arange(512), 512)[:R]
    py = np.tile(np.arange(512), 512)[:R]
    d = np.stack([(px / 512 - 0.5) * 1.2, (py / 512 - 0.5) * 1.2,
                  -np.ones(R)], 1).astype(np.float32)
    rd_c = d / np.linalg.norm(d, axis=1, keepdims=True)

    # incoherent rays
    ro_i = rng.uniform(-10, 10, (R, 3)).astype(np.float32)
    ro_i[:, 1] += 10
    rd_i = rng.normal(size=(R, 3)).astype(np.float32)
    rd_i /= np.linalg.norm(rd_i, axis=1, keepdims=True)

    def rays_pack(ro, rd):
        r8 = np.zeros((8, R), np.float32)
        r8[0:3] = ro.T
        r8[3] = 1e30
        r8[4:7] = rd.T
        return jnp.asarray(r8)

    class S:
        pass

    s = S()
    s.wbvh_nodes = jnp.asarray(sc.wbvh_nodes)
    s.wbvh_tri9f = jnp.asarray(sc.wbvh_tri9f)
    s.wbvh_slot_tri = jnp.asarray(sc.wbvh_slot_tri)

    for name, ro, rd in [("coherent", ro_c, rd_c), ("incoherent", ro_i, rd_i)]:
        r8 = rays_pack(ro, rd)
        t0 = time.perf_counter()
        out = packet_traverse(r8, nodes128, tris128)
        out_np = np.asarray(out)
        print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        nrep = 5
        for _ in range(nrep):
            out = packet_traverse(r8, nodes128, tris128)
        out_np = np.asarray(out)
        dt = (time.perf_counter() - t0) / nrep
        visits = out_np[4].reshape(-1, P)[:, 0]
        print(f"{name}: {dt*1e3:.2f} ms -> {R/dt/1e6:.1f} Mrays/s; "
              f"visits/packet mean {visits.mean():.0f} max {visits.max():.0f}")

        # correctness vs existing XLA traversal
        t_ref, tri_ref, _, _ = tw.closest_hit(
            s, jnp.asarray(ro[:2048]), jnp.asarray(rd[:2048]))
        t_new = out_np[0][:2048]
        slot = out_np[1][:2048].view(np.int32)
        tri_new = np.where(slot >= 0,
                           np.asarray(sc.wbvh_slot_tri)[np.clip(slot, 0, None)],
                           -1)
        t_ref = np.asarray(t_ref)
        ok_t = np.isclose(np.where(np.isinf(t_ref), 1e30, t_ref),
                          np.where(t_new >= 1e29, 1e30, t_new),
                          rtol=1e-3, atol=1e-3)
        print(f"{name}: t match {ok_t.mean()*100:.2f}%  "
              f"tri match {(tri_new == np.asarray(tri_ref)).mean()*100:.2f}%")


if __name__ == "__main__":
    main()
