"""Dev experiment: big-mode (HBM-streamed cluster tris) on REAL hardware.

Round-2 left big mode gated off: it passed interpret-mode parity but the
TPU worker crashed at Benchmark_Scene03 scale. Hypotheses (ROUND2_NOTES):
DMA inside the nested while/pl.when, or scale. This experiment separates
code-bug from scale-bug by forcing big mode on a SMALL scene (test_224,
Cp ~ a few hundred) and diffing against the VMEM path on the same rays.

Usage: python tools/exp_bigmode.py [scene_dir] [R]
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
    from hydracore_tpu.scene.scene import load_scene

    scene_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/hydra_app/tests/test_224"
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 65536

    sc = jax.device_put(load_scene(scene_dir, width=64, height=64))
    Cp = sc.cl_tris.shape[0]
    print(f"Cp={Cp} tris={sc.tri_v0.shape[0]}")

    rng = np.random.default_rng(0)
    lo, hi = np.asarray(sc.world_bmin), np.asarray(sc.world_bmin + sc.world_bext)
    ro = jnp.asarray(rng.uniform(lo, hi, (R, 3)).astype(np.float32))
    rd_np = rng.normal(size=(R, 3)).astype(np.float32)
    rd = jnp.asarray(rd_np / np.linalg.norm(rd_np, axis=1, keepdims=True))

    def run(tag):
        t0 = time.perf_counter()
        out = tc.closest_hit(sc, ro, rd)
        out = jax.tree.map(np.asarray, out)
        print(f"[{tag}] compile+run {time.perf_counter() - t0:.1f}s "
              f"hits={int((out[1] >= 0).sum())}")
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            out2 = tc.closest_hit(sc, ro, rd)
        jax.block_until_ready(out2)
        dt = (time.perf_counter() - t0) / n
        print(f"[{tag}] warm {dt * 1e3:.1f} ms  ({R / dt / 1e6:.1f} Mrays/s)")
        return out

    ref = run("vmem")

    tc.VMEM_MAX_CP = 64  # force big mode
    tc._cluster_traverse.clear_cache()
    big = run("big")

    t_ok = np.allclose(ref[0], big[0], rtol=1e-5, atol=1e-5, equal_nan=True)
    tri_ok = (ref[1] == big[1]).mean()
    print(f"parity: t allclose={t_ok}  tri match={tri_ok:.6f}")


if __name__ == "__main__":
    main()
