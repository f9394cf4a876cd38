"""Experiment: ray-order coherence vs cluster-traversal throughput.

Compares row-major vs Morton(16x16-tile) primary ray order, and sorted vs
unsorted diffuse bounce rays, on test_224. Reports per-block active-cluster
counts (the kernel exports n_act in out[...,1]) and wall time.
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


def timeit(fn, n=5):
    out = fn()
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n, out


def morton2(x, y):
    m = np.zeros_like(x, dtype=np.uint32)
    for b in range(16):
        m |= ((x >> b) & 1) << (2 * b)
        m |= ((y >> b) & 1) << (2 * b + 1)
    return m


def run(scene, ro, rd, label):
    rays, R = tc._to_blocks(ro, rd, 1e30, None)
    rays = jax.device_put(rays)
    f = jax.jit(lambda r: tc._cluster_traverse(r, scene.cl_bounds_oct,
                                               scene.cl_tris, scene.cl_oct_perm))
    dt, (t, slot, _diag) = timeit(lambda: f(rays))
    mrays = R / dt / 1e6
    print(f"{label:28s}: {dt*1e3:8.2f} ms  {mrays:7.1f} Mrays/s")
    return dt


def main():
    W = 512
    sc = load_scene("/root/reference/hydra_app/tests/test_224", width=W, height=W)
    sc = jax.device_put(sc)
    R = W * W
    print("clusters:", sc.cl_tris.shape[0])

    pix = np.arange(R, dtype=np.uint32)
    px = (pix % W).astype(np.int32)
    py = (pix // W).astype(np.int32)
    jit2 = jnp.full((R, 2), 0.5, jnp.float32)
    ro, rd = pt.make_eye_rays(sc.camera, jnp.asarray(px), jnp.asarray(py), jit2, jit2)
    ro = np.asarray(ro)
    rd = np.asarray(rd)

    run(sc, jnp.asarray(ro), jnp.asarray(rd), "primary row-major")

    mkey = morton2(px.astype(np.uint32), py.astype(np.uint32))
    mperm = np.argsort(mkey)
    run(sc, jnp.asarray(ro[mperm]), jnp.asarray(rd[mperm]), "primary morton")

    # diffuse-like bounce rays: origins on surfaces (use primary hits), random dirs
    rng = np.random.default_rng(0)
    t1, tri1, _, _ = tc.closest_hit(sc, jnp.asarray(ro), jnp.asarray(rd))
    t1 = np.asarray(t1)
    hitm = np.isfinite(t1)
    o2 = ro + rd * np.where(hitm, t1 * 0.999, 1.0)[:, None]
    d2 = rng.normal(size=(R, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)

    run(sc, jnp.asarray(o2), jnp.asarray(d2), "bounce unsorted")

    # sort by origin morton (scene-bounds quantized) + dir octant
    bmin = o2.min(0)
    ext = o2.max(0) - bmin + 1e-6
    q = ((o2 - bmin) / ext * 1023).astype(np.uint32)
    okey = np.zeros(R, np.uint64)
    for b in range(10):
        for a in range(3):
            okey |= ((q[:, a].astype(np.uint64) >> b) & 1) << np.uint64(3 * b + a)
    oct_ = ((d2[:, 0] > 0).astype(np.uint64) | ((d2[:, 1] > 0).astype(np.uint64) << 1)
            | ((d2[:, 2] > 0).astype(np.uint64) << 2))
    key = (okey << np.uint64(3)) | oct_
    perm = np.argsort(key)
    run(sc, jnp.asarray(o2[perm]), jnp.asarray(d2[perm]), "bounce origin-morton+oct")

    key2 = (oct_ << np.uint64(30)) | okey
    perm2 = np.argsort(key2)
    run(sc, jnp.asarray(o2[perm2]), jnp.asarray(d2[perm2]), "bounce oct-major")

    # what does a device-side sort cost?
    kd = jnp.asarray(key.astype(np.uint32))
    fs = jax.jit(lambda k: jax.lax.sort_key_val(k, jnp.arange(R, dtype=jnp.int32)))
    dt, _ = timeit(lambda: fs(kd))
    print(f"{'lax.sort 262k u32':28s}: {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
