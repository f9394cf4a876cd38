"""Dev experiment: cluster-kernel visit statistics + kernel-only timing on
realistic wavefronts (primary / bounce-1 / dead), test_224 at 512^2.

Timing method: tile the wavefront K_REP times with distinct per-copy origin
jitter baked host-side — ONE pallas call over K_REP x 1024 blocks, so no
scan/CSE tricks are needed and per-dispatch latency amortizes away.
"""
from __future__ import annotations

import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from hydracore_tpu.bsdf import core as bsdf
from hydracore_tpu.integrators import pt
from hydracore_tpu.ops import rng, trace_api
from hydracore_tpu.ops import traverse_cluster as tc
from hydracore_tpu.scene.scene import load_scene

K_REP = 8


def kernel_time(label, rays, sc):
    G = rays.shape[0]
    big = np.tile(np.asarray(rays), (K_REP, 1, 1))
    jit_o = np.random.default_rng(0).uniform(
        -1e-4, 1e-4, (K_REP, 1, 1, 3)).astype(np.float32)
    big = big.reshape(K_REP, G, tc.R_BLK, 8)
    big[:, :, :, 0:3] += jit_o
    big = jax.device_put(big.reshape(K_REP * G, tc.R_BLK, 8))

    f = jax.jit(lambda r: tc._cluster_traverse(
        r, sc.cl_bounds_oct, sc.cl_tris, sc.cl_oct_perm)[0])
    out = f(big)
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(big)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / K_REP)
    R = G * tc.R_BLK
    print(f"{label:24s}: {best*1e3:7.3f} ms  {R/best/1e6:7.1f} Mrays/s "
          f"({best/G*1e6:5.2f} us/block)")
    return best


def visit_stats(label, rays, sc):
    t, slot, diag = jax.jit(lambda r: tc._cluster_traverse(
        r, sc.cl_bounds_oct, sc.cl_tris, sc.cl_oct_perm))(rays)
    d = np.asarray(diag)[:, 0]  # per block: visits + n0/1024
    visits = np.floor(d)
    n0 = (d - visits) * 1024.0
    print(f"{label:24s}: visits/block mean={visits.mean():6.1f} "
          f"p50={np.percentile(visits,50):5.0f} p95={np.percentile(visits,95):5.0f} "
          f"max={visits.max():5.0f}  n0 mean={n0.mean():6.1f}")


def blocks_of(ro, rd, sc, active=None, sort=True):
    R = ro.shape[0]
    if sort:
        key = trace_api.ray_sort_key(sc, ro, rd)
        if active is not None:
            key = jnp.where(active, key, jnp.uint32(0xFFFFFFFF))
        _, idx = jax.lax.sort_key_val(key, jnp.arange(R, dtype=jnp.int32))
        ro, rd = ro[idx], rd[idx]
        active = None if active is None else active[idx]
    rays, _ = tc._to_blocks(ro, rd, 1e30, active)
    return jax.device_put(rays)


def main():
    scene_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/hydra_app/tests/test_224"
    W = H = 512
    sc = jax.device_put(load_scene(scene_dir, width=W, height=H))
    print(f"clusters Cp={sc.cl_tris.shape[0]} tris={sc.tri_v0.shape[0]}")
    R = W * H
    pix = jnp.asarray(pt._morton_pixel_order(W, H))
    px = (pix % W).astype(jnp.int32)
    py = (pix // W).astype(jnp.int32)
    jit2 = jnp.full((R, 2), 0.5, jnp.float32)
    ro, rd = pt.make_eye_rays(sc.camera, px, py, jit2, jit2)

    prim = blocks_of(ro, rd, sc, sort=False)
    kernel_time("primary (morton)", prim, sc)
    visit_stats("primary (morton)", prim, sc)

    # one real diffuse bounce
    t, tri, u, v = jax.jit(lambda o, d: trace_api.closest_hit(sc, o, d))(ro, rd)
    pos, n, ng, uv, mat_id, tri_light, tang = jax.jit(
        lambda: pt.compute_hit(sc, tri, u, v, ro, rd, t))()
    r_b = rng.rand4(pix, 1, 1, jnp.uint32(7))
    feats = bsdf.scene_feats(sc)
    p = bsdf.fetch_material(sc, mat_id, uv, pos, n, wo=-rd)
    bs = jax.jit(lambda: bsdf.sample_bsdf(p, -rd, n, r_b, feats))()
    alive = tri >= 0
    o2 = pt.offs_ray_pos(pos, ng, bs.wi)

    b_uns = blocks_of(o2, bs.wi, sc, alive, sort=False)
    kernel_time("bounce1 unsorted", b_uns, sc)
    visit_stats("bounce1 unsorted", b_uns, sc)
    b_srt = blocks_of(o2, bs.wi, sc, alive, sort=True)
    kernel_time("bounce1 sorted", b_srt, sc)
    visit_stats("bounce1 sorted", b_srt, sc)

    # floor: all-dead wavefront
    dead = blocks_of(ro, rd, sc, jnp.zeros(R, bool), sort=False)
    kernel_time("all-dead floor", dead, sc)


if __name__ == "__main__":
    main()
