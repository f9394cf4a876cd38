"""Prototype: cluster-dense traversal kernel microbenchmark.

Design under test: rays in blocks of R_BLK (sublanes) x clusters/tris on
lanes. Stage A: dense slab tests vs all cluster AABBs -> active list in
SMEM. Stage B: per active cluster, dense Moller-Trumbore of the whole ray
block against the cluster's 128 triangles, per-ray t-culling.

Synthetic scene: ACT clusters overlapping the ray cloud, C-ACT far away.
Measures ms/call and derives cycles per visit.

Usage: python tools/proto_cluster.py [variant]
"""
from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_BLK = 256  # overridden by probe args
K = 128  # tris per cluster


def make_kernel(Cp: int, use_mxu: bool, mode: int = 0):
    CT = Cp // 128

    def kernel(ray_ref, cbl_ref, tris_ref, pk_ref, out_ref,
               outi_ref, anyhit, lst):
        rays = ray_ref[0]  # (R_BLK, 8)
        ox = rays[:, 0:1]
        oy = rays[:, 1:2]
        oz = rays[:, 2:3]
        dx = rays[:, 3:4]
        dy = rays[:, 4:5]
        dz = rays[:, 5:6]
        t_lim = rays[:, 6:7]
        eps = jnp.float32(1e-12)
        ix = 1.0 / jnp.where(jnp.abs(dx) < eps, jnp.where(dx < 0, -eps, eps), dx)
        iy = 1.0 / jnp.where(jnp.abs(dy) < eps, jnp.where(dy < 0, -eps, eps), dy)
        iz = 1.0 / jnp.where(jnp.abs(dz) < eps, jnp.where(dz < 0, -eps, eps), dz)

        # ---- stage A: rays on sublanes x clusters on lanes; per-cluster
        # counts via ONE MXU matmul per 128-cluster tile (sublane-form) ----
        ones_col = jnp.ones((R_BLK, 1), jnp.float32)
        for ct in range(CT):
            s = ct * 128
            bxm = cbl_ref[0:1, s:s + 128]
            bym = cbl_ref[1:2, s:s + 128]
            bzm = cbl_ref[2:3, s:s + 128]
            bxM = cbl_ref[3:4, s:s + 128]
            byM = cbl_ref[4:5, s:s + 128]
            bzM = cbl_ref[5:6, s:s + 128]
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
            hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_lim)  # (R, 128)
            if mode < 3:
                cnt = jax.lax.dot_general(
                    hit.astype(jnp.float32), ones_col,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (128, 1)
                anyhit[s:s + 128, 0:1] = cnt.astype(jnp.int32)

        # ---- compaction: scalar loop over clusters ----
        UNROLL = 16

        def cbody(i, n):
            c0 = i * UNROLL
            for k in range(UNROLL):
                a = anyhit[c0 + k, 0]

                @pl.when(a > 0)
                def _(n=n, k=k):
                    lst[n] = c0 + k

                n = n + (a > 0).astype(jnp.int32)
            return n

        n_act = jnp.int32(0)
        if mode < 2:
            n_act = jax.lax.fori_loop(0, Cp // UNROLL, cbody, jnp.int32(0))
        if mode >= 1:
            n_act = jnp.int32(0)


        # ---- stage B: visits ----
        big = jnp.float32(3e38)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def visit(state):
            i, t_cur, slot = state
            c = lst[i]
            blk = tris_ref[c]  # (12or10, 128)
            if use_mxu:
                # Plucker via MXU: rays (R,8) x plane/edge mats (8, 128*4)
                rp = jnp.concatenate(
                    [dx, dy, dz,
                     oy * dz - oz * dy, oz * dx - ox * dz, ox * dy - oy * dx,
                     jnp.ones_like(ox), ox * 0.0], axis=1)  # (R, 8)
                pk = pk_ref[c]  # (8, 128*4) packed [e0|e1|e2|plane]
                dots = jax.lax.dot_general(
                    rp, pk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (R, 512)
                w0 = dots[:, 0:128]
                w1 = dots[:, 128:256]
                w2 = dots[:, 256:384]
                # plane: packed so dot = tN - t*0... need tN and tD separately
                tN = dots[:, 384:512]
                nx = blk[0:1]
                ny = blk[1:2]
                nz = blk[2:3]
                tD = dx * nx + dy * ny + dz * nz
                inv = jnp.where(jnp.abs(tD) > 1e-12, 1.0 / tD, 0.0)
                t = tN * inv
                hit = (inv != 0.0) & (t > 1e-5) & (t < t_cur) & (
                    ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)) |
                    ((w0 <= 0) & (w1 <= 0) & (w2 <= 0)))
            else:
                v0x = blk[0:1]
                v0y = blk[1:2]
                v0z = blk[2:3]
                e1x = blk[3:4]
                e1y = blk[4:5]
                e1z = blk[5:6]
                e2x = blk[6:7]
                e2y = blk[7:8]
                e2z = blk[8:9]
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
                    & (t > 1e-5) & (t < t_cur)
            tm = jnp.where(hit, t, big)
            tmin = jnp.min(tm, axis=1, keepdims=True)  # (R,1)
            sl = jnp.where(tm == tmin, c * 128 + lane, -1)
            smax = jnp.max(sl, axis=1, keepdims=True)
            better = tmin < t_cur
            t_cur = jnp.where(better, tmin, t_cur)
            slot = jnp.where(better, smax, slot)
            return i + 1, t_cur, slot

        t0 = jnp.minimum(t_lim, big)
        s0 = jnp.full((R_BLK, 1), -1, jnp.int32)
        _, t_best, slot = jax.lax.while_loop(
            lambda st: st[0] < n_act, visit, (jnp.int32(0), t0, s0))

        out_ref[0] = jnp.concatenate(
            [t_best, jnp.broadcast_to(n_act.astype(jnp.float32),
                                      (R_BLK, 1))] + [t_best] * 6, axis=1)
        outi_ref[0] = jnp.broadcast_to(slot, (R_BLK, 8))

    return kernel


@partial(jax.jit, static_argnames=("use_mxu", "mode"))
def run(rays, cb, tris, pk, use_mxu=False, mode=0):
    G = rays.shape[0]
    Cp = cb.shape[1]
    out, outi = pl.pallas_call(
        make_kernel(Cp, use_mxu, mode),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, R_BLK, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(pk.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, R_BLK, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_BLK, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, R_BLK, 8), jnp.float32),
            jax.ShapeDtypeStruct((G, R_BLK, 8), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Cp, 128), jnp.int32),
            pltpu.SMEM((Cp + 8,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(rays, cb, tris, pk)
    return out, outi


def synth(C, ACT, seed=0):
    """ACT near clusters around origin cube; rest far away."""
    rng = np.random.default_rng(seed)
    Cp = (C + 127) // 128 * 128
    cb = np.zeros((8, Cp), np.float32)
    ctr = rng.uniform(-1, 1, (C, 3)).astype(np.float32)
    ctr[ACT:] += 1000.0
    half = 0.3
    cb[0:3, :C] = (ctr - half).T
    cb[3:6, :C] = (ctr + half).T
    cb[0:3, C:] = 1e30
    cb[3:6, C:] = -1e30
    # triangles inside each cluster box
    v0 = (ctr[:, None, :] + rng.uniform(-half, half, (C, K, 3))).astype(np.float32)
    e1 = rng.uniform(-0.05, 0.05, (C, K, 3)).astype(np.float32)
    e2 = rng.uniform(-0.05, 0.05, (C, K, 3)).astype(np.float32)
    tris = np.zeros((Cp, 12, 128), np.float32)
    tris[:C, 0:3] = np.transpose(v0, (0, 2, 1))
    tris[:C, 3:6] = np.transpose(e1, (0, 2, 1))
    tris[:C, 6:9] = np.transpose(e2, (0, 2, 1))
    # MXU packed: per cluster (8, 512): cols [e0 e1 e2 plane]
    # edge plucker for edge (a->b): L=(e, a x e); ray dot = d.(a x e)+ (o x d).e
    pk = np.zeros((Cp, 8, 512), np.float32)
    v1 = v0 + e1
    v2 = v0 + e2
    n = np.cross(e1, e2)

    def edge_cols(a, b):
        e = b - a
        m = np.cross(a, e)
        return np.concatenate([m, e, np.zeros_like(e[..., :1]),
                               np.zeros_like(e[..., :1])], -1)  # (C,K,8)

    pk[:C, :, 0:128] = np.transpose(edge_cols(v0, v1), (0, 2, 1))
    pk[:C, :, 128:256] = np.transpose(edge_cols(v1, v2), (0, 2, 1))
    pk[:C, :, 256:384] = np.transpose(edge_cols(v2, v0), (0, 2, 1))
    # plane: tN = n.v0 - n.o ; cols dot rp=[d,oxd,1,0]: want n.v0*1 - n.o ->
    # rp has no o! use rp=[d, oxd, 1, 0] -> can't form n.o. Instead pack
    # tN' = n.(v0 - o) needs o... skip: compute tN on VPU rows (cheap).
    return cb, tris, pk


def probe(variant, ACT, use_mxu, rblk=256):
    """One measurement in THIS process: 262144 rays, C=256 clusters."""
    global R_BLK
    R_BLK = rblk
    C = 256
    G = 262144 // R_BLK
    rng = np.random.default_rng(1)
    rays = np.zeros((G, R_BLK, 8), np.float32)
    ro = rng.uniform(-1, 1, (G * R_BLK, 3)).astype(np.float32)
    rd = rng.normal(size=(G * R_BLK, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    rays[:, :, 0:3] = ro.reshape(G, R_BLK, 3)
    rays[:, :, 3:6] = rd.reshape(G, R_BLK, 3)
    rays[:, :, 6] = 1e30
    rays[:, :, 7] = 1.0
    rays = jnp.asarray(rays)
    mode = {"full": 0, "novisit": 1, "stagea": 2, "empty": 3}[variant]
    cb, tris, pk = synth(C, ACT)
    cb, tris, pk = jax.device_put((jnp.asarray(cb), jnp.asarray(tris),
                                   jnp.asarray(pk)))
    out, outi = run(rays, cb, tris, pk, use_mxu=use_mxu, mode=mode)
    jax.block_until_ready((out, outi))
    np.asarray(out)
    nv = float(out[0, 0, 1])

    def bench_n(N):
        t0 = time.perf_counter()
        for _ in range(N):
            o, oi = run(rays, cb, tris, pk, use_mxu=use_mxu, mode=mode)
        jax.block_until_ready((o, oi))
        np.asarray(o)
        return time.perf_counter() - t0

    bench_n(3)
    t5, t20 = bench_n(5), bench_n(20)
    dt = (t20 - t5) / 15  # marginal per-call: cancels fixed pull overhead
    rays_n = G * R_BLK
    per_blk_us = dt / G * 1e6
    per_visit_us = dt / G / max(nv, 1e-9) * 1e6
    print(f"{variant:8s} mxu={int(use_mxu)} rb={R_BLK:5d} ACT={ACT:4d} vis/blk={nv:5.0f} "
          f"{dt*1e3:8.2f} ms {rays_n/dt/1e6:7.1f} Mrays/s "
          f"{per_blk_us:7.1f} us/blk {per_visit_us:6.2f} us/visit", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "probe":
        probe(sys.argv[2], int(sys.argv[3]), bool(int(sys.argv[4])), int(sys.argv[5]))
        return
    import subprocess
    jobs = [("empty", 0, 0, 256), ("empty", 0, 0, 1024),
            ("novisit", 0, 0, 1024),
            ("full", 4, 0, 256), ("full", 16, 0, 256),
            ("full", 4, 0, 1024), ("full", 16, 0, 1024),
            ("full", 16, 1, 1024)]
    for v, a, m, rb in jobs:
        r = subprocess.run([sys.executable, __file__, "probe", v, str(a),
                            str(m), str(rb)], capture_output=True, text=True)
        for ln in r.stdout.splitlines():
            if "us/blk" in ln:
                print(ln, flush=True)
        if r.returncode != 0:
            print(f"{v} ACT={a} mxu={m} rb={rb} FAILED:", r.stderr.splitlines()[-1:],
                  flush=True)


if __name__ == "__main__":
    main()
