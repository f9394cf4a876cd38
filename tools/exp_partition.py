"""Dev experiment: partitioned cluster traversal on REAL hardware.

The partitioned chain (bvh/clusters.py partition_clusters +
traverse_cluster._partitioned_traverse) is the default big-scene path: P
pure-VMEM kernel launches with t-threading, no manual DMA — the
hardware-safe alternative to big mode. This measures it on
Benchmark_Scene03 (339k tris, P=3 at the default 1024-cluster cap) and
diffs hit ids against the XLA wide-BVH loop on the same rays.

Usage: python tools/exp_partition.py [scene_dir] [R]
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from hydracore_tpu.ops import traverse_cluster as tc
    from hydracore_tpu.ops import traverse_wide as tw
    from hydracore_tpu.scene.scene import load_scene

    scene_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/hydra_app/tests/Benchmark_Scene03"
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 262144

    sc = jax.device_put(load_scene(scene_dir, width=64, height=64))
    part = sc.cl_tris.ndim == 4
    print(f"tris={sc.tri_v0.shape[0]} partitioned={part} "
          f"shape={tuple(sc.cl_tris.shape)}")

    rng = np.random.default_rng(0)
    lo, hi = np.asarray(sc.world_bmin), np.asarray(sc.world_bmin + sc.world_bext)
    ro = jnp.asarray(rng.uniform(lo, hi, (R, 3)).astype(np.float32))
    rd_np = rng.normal(size=(R, 3)).astype(np.float32)
    rd = jnp.asarray(rd_np / np.linalg.norm(rd_np, axis=1, keepdims=True))

    def run(tag, fn):
        t0 = time.perf_counter()
        out = jax.tree.map(np.asarray, fn(sc, ro, rd))
        print(f"[{tag}] compile+run {time.perf_counter() - t0:.1f}s "
              f"hits={int((out[1] >= 0).sum())}")
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            out2 = fn(sc, ro, rd)
        jax.block_until_ready(out2)
        dt = (time.perf_counter() - t0) / n
        print(f"[{tag}] warm {dt * 1e3:.1f} ms  ({R / dt / 1e6:.1f} Mrays/s)")
        return out

    pc = run("partitioned", tc.closest_hit)
    wd = run("wide", tw.closest_hit)

    # partitioned returns slots on instanced scenes only; here tri ids
    hit_ok = ((pc[1] >= 0) == (wd[1] >= 0)).mean()
    both = (pc[1] >= 0) & (wd[1] >= 0)
    tri_ok = (pc[1][both] == wd[1][both]).mean() if both.any() else 1.0
    t_ok = np.allclose(pc[0][both], wd[0][both], rtol=1e-3, atol=1e-4)
    print(f"parity: hit-mask match={hit_ok:.6f} tri match={tri_ok:.6f} "
          f"t allclose={t_ok}")


if __name__ == "__main__":
    main()
