"""Dev tool: per-stage timing of the PT pass on the current device.

Times (warm): full render_pass, packet closest_hit on coherent primary rays,
packet closest_hit on incoherent rays, packet any_hit (shadow-like rays).
"""
from __future__ import annotations

import sys
import time

import numpy as np


def timeit(fn, n=3):
    out = fn()
    import jax
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from hydracore_tpu.integrators import pt
    from hydracore_tpu.ops import trace_api
    from hydracore_tpu.scene.scene import load_scene

    scene_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/hydra_app/tests/test_224"
    W = H = 512
    sc = load_scene(scene_dir, width=W, height=H)
    sc = jax.device_put(sc)
    R = W * H

    # full pass
    t = timeit(lambda: pt.render_pass(sc, jnp.uint32(1), jnp.uint32(7), max_depth=5))
    print(f"render_pass 512^2 d5: {t*1e3:8.1f} ms -> {R/t/1e6:6.3f} Msam/s")

    # primary rays (coherent)
    pix = jnp.arange(R, dtype=jnp.uint32)
    px = (pix % W).astype(jnp.int32)
    py = (pix // W).astype(jnp.int32)
    jit2 = jnp.full((R, 2), 0.5, jnp.float32)
    ro, rd = pt.make_eye_rays(sc.camera, px, py, jit2, jit2)
    ro, rd = jax.device_put((ro, rd))
    f = jax.jit(lambda ro, rd: trace_api.closest_hit(sc, ro, rd))
    t = timeit(lambda: f(ro, rd))
    print(f"closest primary  : {t*1e3:8.1f} ms -> {R/t/1e6:6.1f} Mrays/s")

    # incoherent rays
    rng = np.random.default_rng(0)
    ro2 = jax.device_put(jnp.asarray(rng.uniform(-2, 2, (R, 3)).astype(np.float32)))
    rdn = rng.normal(size=(R, 3)).astype(np.float32)
    rd2 = jax.device_put(jnp.asarray(rdn / np.linalg.norm(rdn, axis=1, keepdims=True)))
    t = timeit(lambda: f(ro2, rd2))
    print(f"closest incoher  : {t*1e3:8.1f} ms -> {R/t/1e6:6.1f} Mrays/s")

    # shadow-like: from surfaces toward one point (light)
    lp = jnp.asarray([0.0, 1.9, 0.0], jnp.float32)
    sd = lp[None, :] - ro2
    dist = jnp.linalg.norm(sd, axis=1, keepdims=True)
    sdn = sd / dist
    g = jax.jit(lambda o, d, tm: trace_api.any_hit(sc, o, d, tm))
    t = timeit(lambda: g(ro2, sdn, dist[:, 0] * 0.995))
    print(f"anyhit shadow    : {t*1e3:8.1f} ms -> {R/t/1e6:6.1f} Mrays/s")


if __name__ == "__main__":
    main()
