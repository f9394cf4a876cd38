"""Benchmark: render throughput on the cornell+teapot scene (test_224).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Scene choice: the reference's baseline row "cornell" (BASELINE.md) is the
cornell box WITH the 25.6k-triangle teapot. The repo copy of test_42 is
missing the teapot chunk (chunk_00003.vsgf), so the honest equivalent is
test_224 (same box + teapot present). Baseline to beat: 9.1 Msamples/s
(RX 480, 1024x1024, depth 5, full path samples).

Measurement notes:
- render_passes() runs N full passes inside ONE dispatch (lax.fori), so
  the tunnel's multi-ms per-dispatch latency does not contaminate the
  number; host materialization only at the end.
- each probe runs in its OWN subprocess: long programs push this device
  runtime into an adaptive slow-polling mode that persists per process.
"""
from __future__ import annotations

import json
import subprocess
import sys

BASELINE_MSAMPLES = 9.1  # RX 480, cornell(+teapot), 1024^2 (BASELINE.md)

_PROBE = r"""
import time, sys, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from hydracore_tpu.scene.scene import load_scene
from hydracore_tpu.integrators.pt import render_passes
scene_dir, W, n_pass, depth = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), 5
scene = jax.device_put(load_scene(scene_dir, width=W, height=W))
seed = jnp.uint32(777)
fb, rays = render_passes(scene, jnp.uint32(0), seed, n_pass=n_pass, max_depth=depth)
np.asarray(fb)  # forced host materialization = true completion
t0 = time.perf_counter()
fb, rays = render_passes(scene, jnp.uint32(n_pass), seed, n_pass=n_pass, max_depth=depth)
np.asarray(fb)
dt = (time.perf_counter() - t0) / n_pass
print("RESULT %.9f %.1f" % (dt, float(rays) / n_pass))
"""


def _probe(scene_dir: str, width: int, n_pass: int):
    out = subprocess.run(
        [sys.executable, "-c", _PROBE, scene_dir, str(width), str(n_pass)],
        capture_output=True, text=True, timeout=3000, cwd="/root/repo",
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            _, dt, rays = line.split()
            return float(dt), float(rays)
    raise RuntimeError(f"probe failed: {out.stdout[-500:]} {out.stderr[-500:]}")


def main():
    W = 512
    dt, rays = _probe("/root/reference/hydra_app/tests/test_224", W, 8)
    msamples = W * W / dt / 1e6
    mrays = rays / dt / 1e6

    dt2, _ = _probe("/root/reference/hydra_app/tests/test_42", 1024, 8)
    msamples_tiny = 1024 * 1024 / dt2 / 1e6

    import jax

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
