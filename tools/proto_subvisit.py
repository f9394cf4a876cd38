"""Micro-benchmark: cost of a subgroup-scheduled dense visit vs a plain
block visit in the cluster kernel's inner loop.

Plain visit: ONE cluster's Woop block (4, 384) broadcast against all 256
rays. Subgroup visit: EIGHT clusters, one per 32-ray band — operand rows
are built by stacking the 8 blocks' rows into (8, 384) and expanding with
pltpu.repeat to (256, 384). If a subgroup step costs < ~2x a plain step,
divergent wavefronts (bounce-1 sub/blk dense-work ratio 0.27,
tools/exp_subgroup_divergence.py) get a 2-4x dense-work cut at equal hit
results.

Usage: python tools/proto_subvisit.py   (needs the TPU)
"""
from __future__ import annotations

import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

R_BLK, V, C = 256, 64, 384
BIG = 3.0e38


def _ray_cols(rays):
    return [rays[:, i:i + 1] for i in range(6)]


def _mt(ox, oy, oz, dx, dy, dz, bx, by, bz, bc, t_cur, lane_u):
    os_ = ox * bx + oy * by + oz * bz + bc
    ds_ = dx * bx + dy * by + dz * bz
    t = -os_[:, 256:384] / ds_[:, 256:384]
    u = os_[:, 0:128] + t * ds_[:, 0:128]
    v = os_[:, 128:256] + t * ds_[:, 128:256]
    hit = (t > 1e-5) & (t < t_cur) & (u >= 0) & (v >= 0) & (u + v <= 1.0)
    tm = jnp.where(hit, t, jnp.float32(BIG))
    tp = jax.lax.bitcast_convert_type(
        (jax.lax.bitcast_convert_type(tm, jnp.uint32)
         & jnp.uint32(0xFFFFFF80)) | lane_u, jnp.float32)
    return jnp.min(tp, axis=1, keepdims=True)


def make_plain(n_visits):
    def kernel(ray_ref, tris_ref, lst_ref, out_ref):
        ox, oy, oz, dx, dy, dz = _ray_cols(ray_ref[:])
        lane_u = jax.lax.broadcasted_iota(jnp.uint32, (1, 128), 1)

        def body(i, t_cur):
            blk = tris_ref[lst_ref[i]]
            return jnp.minimum(
                t_cur, _mt(ox, oy, oz, dx, dy, dz, blk[0:1], blk[1:2],
                           blk[2:3], blk[3:4], t_cur, lane_u))

        out_ref[:] = jax.lax.fori_loop(
            0, n_visits, body, jnp.full((R_BLK, 1), BIG, jnp.float32))
    return kernel


def make_sub(n_steps, n_bands=8, use_repeat=True):
    """Each step visits n_bands clusters, one per R_BLK//n_bands-ray band.
    Operand construction: pltpu.repeat of stacked rows, or broadcast+concat
    (portable to interpret mode)."""
    gs = R_BLK // n_bands

    def kernel(ray_ref, tris_ref, lst_ref, out_ref):
        ox, oy, oz, dx, dy, dz = _ray_cols(ray_ref[:])
        lane_u = jax.lax.broadcasted_iota(jnp.uint32, (1, 128), 1)

        def band_mat(rows, j):
            if use_repeat:
                return pltpu.repeat(jnp.concatenate(
                    [r[j:j + 1] for r in rows], axis=0), gs, axis=0)
            return jnp.concatenate(
                [jnp.broadcast_to(r[j:j + 1], (gs, 384)) for r in rows],
                axis=0)

        def body(i, t_cur):
            rows = [tris_ref[lst_ref[n_bands * i + g]]
                    for g in range(n_bands)]
            bx = band_mat(rows, 0)
            by = band_mat(rows, 1)
            bz = band_mat(rows, 2)
            bc = band_mat(rows, 3)
            return jnp.minimum(
                t_cur, _mt(ox, oy, oz, dx, dy, dz, bx, by, bz, bc, t_cur,
                           lane_u))

        out_ref[:] = jax.lax.fori_loop(
            0, n_steps, body, jnp.full((R_BLK, 1), BIG, jnp.float32))
    return kernel


def run(kern, G, rays, tris, lst):
    f = jax.jit(lambda r, t, l: pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((R_BLK, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lst.shape, lambda i: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((R_BLK, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * R_BLK, 1), jnp.float32),
    )(r, t, l))
    out = f(rays, tris, lst)
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(f(rays, tris, lst))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    G = 512
    rng = np.random.default_rng(0)
    rays = jax.device_put(rng.normal(size=(G * R_BLK, 8)).astype(np.float32))
    tris = jax.device_put(rng.normal(size=(C, 4, 384)).astype(np.float32))
    lst = jax.device_put(
        rng.integers(0, C, size=(V,)).astype(np.int32))

    t_plain = run(make_plain(V), G, rays, tris, lst)
    print(f"plain      : {V} visits x {G} blocks: {t_plain*1e3:8.3f} ms "
          f"({t_plain/G/V*1e9:6.1f} ns/visit)")
    for n_bands, use_repeat, tag in ((8, True, "sub8/repeat"),
                                     (8, False, "sub8/concat"),
                                     (4, False, "sub4/concat")):
        try:
            t_sub = run(make_sub(V // n_bands, n_bands, use_repeat), G,
                        rays, tris, lst)
        except Exception as e:
            print(f"{tag:11s}: FAILED {str(e)[:120]}")
            continue
        ns = V // n_bands
        print(f"{tag:11s}: {ns} steps x {G} blocks: {t_sub*1e3:8.3f} ms "
              f"({t_sub/G/ns*1e9:6.1f} ns/step, ratio vs plain visit "
              f"{(t_sub/ns)/(t_plain/V):.2f}; <2 => wins on divergent "
              f"wavefronts)")


if __name__ == "__main__":
    main()
