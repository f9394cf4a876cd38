"""Benchmark: render throughput on the cornell+teapot scene (test_224).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Scene choice: the reference's baseline row "cornell" (BASELINE.md) is the
cornell box WITH the 25.6k-triangle teapot. The repo copy of test_42 is
missing the teapot chunk (chunk_00003.vsgf), so the honest equivalent is
test_224 (same box + teapot present, 25.6k tris loaded). Baseline to beat:
9.1 Msamples/s (RX 480, 1024x1024, depth 5, full path samples).

A secondary probe on the 12-tri test_42 (tiny-BVH upper bound) is reported
in "extra" to track shading-path throughput separately from traversal.
"""
from __future__ import annotations

import json
import sys
import time


BASELINE_MSAMPLES = 9.1  # RX 480, cornell(+teapot), 1024^2 (BASELINE.md)


def _mean_pass_time(render_pass, scene, depth, n_pass, seed):
    import jax
    import jax.numpy as jnp

    color, rays = render_pass(scene, jnp.uint32(0), seed, max_depth=depth)
    color.block_until_ready()  # compile + warmup
    t0 = time.perf_counter()
    for i in range(1, n_pass + 1):
        color, rays = render_pass(scene, jnp.uint32(i), seed, max_depth=depth)
    color.block_until_ready()
    dt = (time.perf_counter() - t0) / n_pass
    return dt, float(rays)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from hydracore_tpu.integrators.pt import render_pass
    from hydracore_tpu.scene.scene import load_scene

    W = H = 512
    depth = 5
    seed = jnp.uint32(777)

    scene = jax.device_put(load_scene("/root/reference/hydra_app/tests/test_224", width=W, height=H))
    dt, rays = _mean_pass_time(render_pass, scene, depth, n_pass=4, seed=seed)
    msamples = W * H / dt / 1e6
    mrays = rays / dt / 1e6

    # tiny-scene probe (12 tris): shading-path throughput upper bound
    tiny = jax.device_put(load_scene("/root/reference/hydra_app/tests/test_42", width=1024, height=1024))
    dt2, rays2 = _mean_pass_time(render_pass, tiny, depth, n_pass=4, seed=seed)
    msamples_tiny = 1024 * 1024 / dt2 / 1e6

    print(
        json.dumps(
            {
                "metric": "Msamples/s cornell+teapot (test_224) 512x512 depth5 PT(MIS+NEE)",
                "value": round(msamples, 3),
                "unit": "Msamples/s",
                "vs_baseline": round(msamples / BASELINE_MSAMPLES, 4),
                "extra": {
                    "Mrays/s": round(mrays, 1),
                    "tiny_scene_Msamples/s": round(msamples_tiny, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
