"""Dispatch-overhead-free traversal benchmark: N traversals inside ONE
jitted lax.scan (data-dependent chain so XLA cannot CSE them away).

Usage: exp_scan_bench.py [scene_dir] [mode]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from hydracore_tpu.integrators import pt
from hydracore_tpu.ops import traverse_cluster as tc
from hydracore_tpu.scene.scene import load_scene

N_REP = 32


def scan_bench(label, rays, cbl_oct, tris, perm, any_hit=False):
    G = rays.shape[0]
    R = G * tc.R_BLK

    @jax.jit
    def run(rays):
        def body(carry, _):
            r = rays.at[:, :, 6].add(carry * 0.0)  # dependency, no CSE
            t, slot, diag = tc._cluster_traverse(
                r, cbl_oct, tris, perm, any_hit_mode=any_hit)
            return jnp.float32(jnp.min(t) * 0.0), (jnp.sum(diag[:, 0]),
                                                   jnp.sum(slot))
        _, (d, s) = jax.lax.scan(body, jnp.float32(0.0), None, length=N_REP)
        return d[-1], s[-1]

    d, s = run(rays)
    np.asarray(d)
    t0 = time.perf_counter()
    d, s = run(rays)
    np.asarray(d)
    dt = (time.perf_counter() - t0) / N_REP
    print(f"{label:26s}: {dt*1e3:8.3f} ms/trav  {R/dt/1e6:7.1f} Mrays/s  "
          f"({dt/G*1e6:5.2f} us/blk)")


def main():
    scene_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/hydra_app/tests/test_224"
    W = 512
    sc = jax.device_put(load_scene(scene_dir, width=W, height=W))
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
    scan_bench("primary morton", jax.device_put(rays),
               sc.cl_bounds_oct, sc.cl_tris, sc.cl_oct_perm)

    # diffuse bounce rays from primary hits, oct-major sorted
    rng = np.random.default_rng(0)
    t1, tri1, _, _ = tc.closest_hit(sc, ro, rd)
    t1 = np.asarray(t1)
    ron = np.asarray(ro)
    rdn = np.asarray(rd)
    hitm = np.isfinite(t1)
    o2 = ron + rdn * np.where(hitm, t1 * 0.999, 1.0)[:, None]
    d2 = rng.normal(size=(R, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    oct_ = ((d2[:, 0] > 0).astype(np.uint64)
            | ((d2[:, 1] > 0).astype(np.uint64) << 1)
            | ((d2[:, 2] > 0).astype(np.uint64) << 2))
    bmin = o2.min(0)
    ext = o2.max(0) - bmin + 1e-6
    q = ((o2 - bmin) / ext * 1023).astype(np.uint32)
    okey = np.zeros(R, np.uint64)
    for b in range(10):
        for a in range(3):
            okey |= ((q[:, a].astype(np.uint64) >> b) & 1) << np.uint64(3 * b + a)
    key = (oct_ << np.uint64(30)) | okey
    perm = np.argsort(key)
    rays2, _ = tc._to_blocks(jnp.asarray(o2[perm]), jnp.asarray(d2[perm]), 1e30, None)
    scan_bench("bounce oct+morton", jax.device_put(rays2),
               sc.cl_bounds_oct, sc.cl_tris, sc.cl_oct_perm)
    rays3, _ = tc._to_blocks(jnp.asarray(o2), jnp.asarray(d2), 1e30, None)
    scan_bench("bounce unsorted", jax.device_put(rays3),
               sc.cl_bounds_oct, sc.cl_tris, sc.cl_oct_perm)

    # shadow rays: surface -> light point
    lp = np.array([0.0, 1.0, 0.0], np.float32)
    sd = lp[None, :] - o2
    dist = np.linalg.norm(sd, axis=1, keepdims=True)
    sdn = sd / dist
    rays4, _ = tc._to_blocks(jnp.asarray(o2), jnp.asarray(sdn),
                             jnp.asarray(dist[:, 0] * 0.995), None)
    scan_bench("shadow anyhit", jax.device_put(rays4),
               sc.cl_bounds_oct, sc.cl_tris, sc.cl_oct_perm, any_hit=True)


if __name__ == "__main__":
    main()
