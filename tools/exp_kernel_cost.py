"""Microbenchmark: where does per-block time go in the cluster kernel?

Builds variants of the kernel (floor / stage-A only / +compact / full)
against the test_224 pools and times each at G=1024 blocks.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from hydracore_tpu.integrators import pt
from hydracore_tpu.ops import traverse_cluster as tc
from hydracore_tpu.scene.scene import load_scene

R_BLK = 256


def build(kernel, G, Cp, cbl_oct, tris, perm):
    def call(rays, oct_):
        out, outi = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((1, R_BLK, 8), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(cbl_oct.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tris.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(perm.shape, lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((G,), lambda i: (0,), memory_space=pltpu.SMEM),
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
                pltpu.VMEM((max(Cp // 16, 8), 8), jnp.int32),
                pltpu.SMEM((Cp + 8,), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(rays, cbl_oct, tris, perm, oct_)
        return out
    return jax.jit(call)


def timeit(f, *a, n=20):
    o = f(*a)
    np.asarray(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    np.asarray(o)
    return (time.perf_counter() - t0) / n


def main():
    W = 512
    sc = load_scene("/root/reference/hydra_app/tests/test_224", width=W, height=W)
    sc = jax.device_put(sc)
    R = W * W
    pix = np.arange(R, dtype=np.uint32)
    px = (pix % W).astype(np.int32)
    py = (pix // W).astype(np.int32)

    def morton2(x, y):
        m = np.zeros_like(x, dtype=np.uint32)
        for b in range(16):
            m |= ((x >> b) & 1) << (2 * b)
            m |= ((y >> b) & 1) << (2 * b + 1)
        return m

    mp = np.argsort(morton2(px.astype(np.uint32), py.astype(np.uint32)))
    jit2 = jnp.full((R, 2), 0.5, jnp.float32)
    ro, rd = pt.make_eye_rays(sc.camera, jnp.asarray(px[mp]), jnp.asarray(py[mp]),
                              jit2, jit2)
    rays, _ = tc._to_blocks(ro, rd, 1e30, None)
    rays = jax.device_put(rays)
    G = rays.shape[0]
    Cp = sc.cl_bounds_oct.shape[2]
    d0 = rays[:, 0, 3:6]
    oct_ = ((d0[:, 0] > 0).astype(jnp.int32)
            + 2 * (d0[:, 1] > 0).astype(jnp.int32)
            + 4 * (d0[:, 2] > 0).astype(jnp.int32))

    CT = Cp // 128

    # ---- floor: just write outputs ----
    def k_floor(ray_ref, cblo_ref, tris_ref, perm_ref, oct_ref,
                out_ref, outi_ref, cnt, lst):
        r = ray_ref[0]
        out_ref[0] = r
        outi_ref[0] = jnp.zeros((R_BLK, 8), jnp.int32)

    # ---- stage A only ----
    def mk_stagea(n_rep):
        def k(ray_ref, cblo_ref, tris_ref, perm_ref, oct_ref,
              out_ref, outi_ref, cnt, lst):
            rays = ray_ref[0]
            ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
            dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
            eps = jnp.float32(1e-12)
            ix = 1.0 / jnp.where(jnp.abs(dx) < eps, eps, dx)
            iy = 1.0 / jnp.where(jnp.abs(dy) < eps, eps, dy)
            iz = 1.0 / jnp.where(jnp.abs(dz) < eps, eps, dz)
            oxix, oyiy, oziz = ox * ix, oy * iy, oz * iz
            oc = oct_ref[pl.program_id(0)]
            ones_col = jnp.ones((R_BLK, 1), jnp.float32)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            packm = jnp.where((lanes >> 4) == rows8,
                              (1 << (lanes & 15)).astype(jnp.float32), 0.0)
            t_act = rays[:, 6:7]

            def body(rep, acc):
                for ct in range(CT):
                    s = ct * 128
                    bxm = cblo_ref[oc, 0:1, s:s + 128]
                    bym = cblo_ref[oc, 1:2, s:s + 128]
                    bzm = cblo_ref[oc, 2:3, s:s + 128]
                    bxM = cblo_ref[oc, 3:4, s:s + 128]
                    byM = cblo_ref[oc, 4:5, s:s + 128]
                    bzM = cblo_ref[oc, 5:6, s:s + 128]
                    tx0 = bxm * ix - oxix
                    tx1 = bxM * ix - oxix
                    ty0 = bym * iy - oyiy
                    ty1 = byM * iy - oyiy
                    tz0 = bzm * iz - oziz
                    tz1 = bzM * iz - oziz
                    tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                                 jnp.minimum(ty0, ty1)),
                                     jnp.minimum(tz0, tz1))
                    tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                                 jnp.maximum(ty0, ty1)),
                                     jnp.maximum(tz0, tz1))
                    hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_act)
                    c = jax.lax.dot_general(hit.astype(jnp.float32), ones_col,
                                            (((0,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32)
                    flags = (c > 0.0).astype(jnp.float32)
                    words = jax.lax.dot_general(packm, flags,
                                                (((1,), (0,)), ((), ())),
                                                preferred_element_type=jnp.float32)
                    cnt[ct * 8:ct * 8 + 8, 0:1] = words.astype(jnp.int32)
                return acc + cnt[0, 0]

            acc = jax.lax.fori_loop(0, n_rep, body, jnp.int32(0))
            out_ref[0] = jnp.broadcast_to(acc.astype(jnp.float32), (R_BLK, 8))
            outi_ref[0] = jnp.zeros((R_BLK, 8), jnp.int32)
        return k

    # ---- compact only (stage A once + N compaction sweeps) ----
    def mk_compact(n_rep):
        base = mk_stagea(1)

        def k(ray_ref, cblo_ref, tris_ref, perm_ref, oct_ref,
              out_ref, outi_ref, cnt, lst):
            base(ray_ref, cblo_ref, tris_ref, perm_ref, oct_ref,
                 out_ref, outi_ref, cnt, lst)
            NW = CT * 8

            def sweep(rep, acc):
                def cbody(w, n):
                    word = cnt[w, 0]

                    @pl.when(word != 0)
                    def _():
                        def bbody(b, m):
                            bit = (word >> b) & 1

                            @pl.when(bit != 0)
                            def _(m=m, b=b):
                                lst[m] = w * 16 + b
                            return m + bit
                        lst[Cp] = jax.lax.fori_loop(0, 16, bbody, n)

                    @pl.when(word == 0)
                    def _():
                        lst[Cp] = n
                    return lst[Cp]

                return acc + jax.lax.fori_loop(0, NW, cbody, jnp.int32(0))

            acc = jax.lax.fori_loop(0, n_rep, sweep, jnp.int32(0))
            out_ref[0] = jnp.broadcast_to(acc.astype(jnp.float32), (R_BLK, 8))
        return k

    import sys
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    if variant.startswith("fm"):
        return floor_multi(int(variant[2:]))
    if variant == "floor":
        f = build(k_floor, G, Cp, sc.cl_bounds_oct, sc.cl_tris, sc.cl_oct_perm)
        t = timeit(f, rays, oct_, n=20)
    elif variant.startswith("stagea"):
        nr = int(variant[6:])
        f = build(mk_stagea(nr), G, Cp, sc.cl_bounds_oct, sc.cl_tris, sc.cl_oct_perm)
        t = timeit(f, rays, oct_, n=20)
    elif variant.startswith("compact"):
        nr = int(variant[7:])
        f = build(mk_compact(nr), G, Cp, sc.cl_bounds_oct, sc.cl_tris, sc.cl_oct_perm)
        t = timeit(f, rays, oct_, n=20)
    else:
        full = jax.jit(lambda r: tc._cluster_traverse(r, sc.cl_bounds_oct,
                                                      sc.cl_tris, sc.cl_oct_perm))
        t = timeit(lambda *a: full(rays), n=20)
    print(f"{variant:12s}: {t*1e3:7.2f} ms  {t/G*1e6:6.2f} us/blk")





def floor_multi(mult):
    """Floor kernel with `mult` ray-blocks per grid step."""
    import sys
    W = 512
    sc = load_scene("/root/reference/hydra_app/tests/test_224", width=W, height=W)
    sc = jax.device_put(sc)
    R = W * W
    G = R // R_BLK
    rays = jnp.zeros((G, R_BLK, 8), jnp.float32)
    oct_ = jnp.zeros((G,), jnp.int32)
    G2 = G // mult

    def k(ray_ref, cblo_ref, tris_ref, perm_ref, oct_ref, out_ref, outi_ref,
          cnt, lst):
        out_ref[...] = ray_ref[...]
        outi_ref[...] = jnp.zeros_like(outi_ref)

    def call(rays, oct_):
        out, outi = pl.pallas_call(
            k,
            grid=(G2,),
            in_specs=[
                pl.BlockSpec((mult, R_BLK, 8), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(sc.cl_bounds_oct.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(sc.cl_tris.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(sc.cl_oct_perm.shape, lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((G,), lambda i: (0,), memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((mult, R_BLK, 8), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mult, R_BLK, 8), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((G, R_BLK, 8), jnp.float32),
                jax.ShapeDtypeStruct((G, R_BLK, 8), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((8, 8), jnp.int32),
                pltpu.SMEM((8,), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(rays, sc.cl_bounds_oct, sc.cl_tris, sc.cl_oct_perm, oct_)
        return out

    f = jax.jit(call)
    t = timeit(f, rays, oct_, n=20)
    print(f"floor_multi{mult:3d}: {t*1e3:7.2f} ms  {t/G*1e6:6.2f} us/rayblk")


if __name__ == "__main__":
    main()
